package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.model.{Iri, RdfQuad}

/**
 * Skew measurement for the two bucket-keyed self-join families (VERDICT r4
 * item 7): the Kleene-closure delta join on a power-law graph (one hub node
 * with a large in/out degree) and the MinHash-LSH bucket self-join on a
 * stopword-heavy corpus (many near-identical docs → one hot band bucket).
 *
 * AQE's skew-join splitting only fires inside (Shuffled/SortMerge)HashJoin
 * stages whose partition sizes exceed
 * spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes (default
 * 256 MB) AND the median-based factor — local gate-scale data never reaches
 * that, so this probe lowers the thresholds to make the mechanism
 * observable, then reports (a) wall time, (b) whether the executed plan
 * contains a skew=true join, and (c) the output row counts. Run:
 *   sbt "runMain graft.tools.SkewProbe [hubDegree] [nDocs]"
 */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val hubDegree = args.headOption.map(_.toInt).getOrElse(20000)
    val nDocs = args.lift(1).map(_.toInt).getOrElse(4000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // make skew splitting observable at probe scale
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // at 100 TB neither join side is broadcastable — force the shuffled
      // join shape the cluster would actually run, so skew handling is the
      // thing being measured (broadcast joins are immune to key skew: hot-key
      // matches are produced by every streamed task holding matching rows)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[skew] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def skewReport(label: String, df: DataFrame): Unit = {
      // execute THIS df's own adaptive plan (df.count() would build and run
      // a separate QueryExecution, leaving this one un-executed and its
      // printed plan the initial, pre-AQE one)
      val qe = df.queryExecution
      val n = time(s"$label run")(qe.executedPlan.execute().count())
      val plan = qe.executedPlan.toString
      val skewed = plan.contains("skew=true") || plan.contains("skewed")
      println(s"[skew] $label: rows=$n skewJoinFired=$skewed")
      plan.linesIterator.filter(l => l.contains("AQEShuffleRead") || l.contains("skew"))
        .take(4).foreach(l => println("[skew]   plan| " + l.trim))
    }

    // ---- 1. closure over a power-law graph: a chain for depth + one hub
    // with `hubDegree` in-edges and out-edges (the hub's delta-join key
    // carries ~hubDegree² candidate pairs through the doubling join)
    val p = Iri("urn:e")
    // distinct node namespaces per run: the closure cache keys on the input
    // plan, so a shared graph would hand later runs the first run's result
    def hubGraph(ns: String, deg: Int) = {
      val chain = (0 until 200).map(i =>
        RdfQuad(None, Iri(s"urn:$ns$i"), p, Iri(s"urn:$ns${i + 1}")))
      val hubIn = (0 until deg).map(i =>
        RdfQuad(None, Iri(s"urn:${ns}in$i"), p, Iri(s"urn:${ns}hub")))
      val hubOut = (0 until deg).map(i =>
        RdfQuad(None, Iri(s"urn:${ns}hub"), p, Iri(s"urn:${ns}out$i")))
      graft.sources.Turtle.quadsToDF(spark, chain ++ hubIn ++ hubOut)
        .repartition(32).localCheckpoint()
    }
    def withProps[T](props: (String, String)*)(f: => T): T = {
      val old = props.map { case (k, _) => k -> sys.props.get(k) }
      props.foreach { case (k, v) => sys.props(k) = v }
      try f
      finally old.foreach {
        case (k, Some(v)) => sys.props(k) = v
        case (k, None) => sys.props.remove(k)
      }
    }
    val quads = hubGraph("c", hubDegree)
    // the fixpoint loop computes its joins eagerly (localCheckpoint per
    // round), so the final plan can't show them — probe the doubling step's
    // join shape directly: edges ⋈ edges on dst=src, where the hub key
    // carries hubDegree² of the output. This bare join is where hub skew
    // bites: count() avoids materialisation, so the measurement isolates
    // single-task output ENUMERATION against the salted spread. (The full
    // fixpoint is NOT the demonstration surface at probe scale — there the
    // dedup/checkpoint of the quadratic pair relation dominates both
    // variants equally.)
    val e = quads.select(col("subject").as("src"), col("object").as("dst"))
      .localCheckpoint()
    val plain = e.as("a").join(e.as("b"), col("a.dst") === col("b.src"))
      .select(col("a.src"), col("b.dst"))
    skewReport("closure delta join UNSALTED (hub output in one task)", plain)
    // inline replica of Rewriter.stepJoin's salting (the engine method is
    // private): hub-targeting left rows hash-salted, hub edges replicated
    val s = 16
    val hub = e.groupBy("src").agg(count(lit(1)).as("n")).where(col("n") >= 1024)
      .select(col("src").as("hk")).localCheckpoint()
    val hb = broadcast(hub.withColumn("hot", lit(1)))
    val a2 = e.join(hb, col("dst") === col("hk"), "left")
      .select(col("src").as("asrc"), col("dst").as("adst"),
        when(col("hot") === 1, pmod(xxhash64(col("src")), lit(s)).cast("int"))
          .otherwise(lit(0)).as("sa"))
    val b2 = e.join(hb, col("src") === col("hk"), "left")
      .select(col("src").as("bsrc"), col("dst").as("bdst"),
        explode(when(col("hot") === 1, sequence(lit(0), lit(s - 1)))
          .otherwise(array(lit(0)))).as("sb"))
    val salted = a2.join(b2, col("adst") === col("bsrc") && col("sa") === col("sb"))
      .select(col("asrc"), col("bdst"))
    skewReport(s"closure delta join SALTED (spread over $s tasks)", salted)
    // end-to-end losslessness sanity on a small graph (SkewSaltSpec pins
    // the full matrix): salted fixpoint count equals the analytic count
    withProps("graft.salt.minRows" -> "100") {
      time("closure fixpoint with salting engaged (sanity)") {
        val tiny = hubGraph("t", 300)
        val n = Graft(tiny).select(
          "SELECT (COUNT(?a) AS ?n) WHERE { ?a <urn:e>+ ?b }")
          .select(col("n.v")).collect()(0).getString(0)
        println(s"[skew]   closure pairs=$n")
      }
    }

    // ---- 2. MinHash-LSH bucket self-join on a stopword-heavy corpus:
    // half the docs share one template (identical shingles → identical
    // signatures → every band bucket is the same hot key)
    val template = (0 until 60).map(i => s"common stop word w$i").mkString(" ")
    val docs = (0 until nDocs).map { i =>
      val text = if (i % 2 == 0) template
                 else s"unique document $i " + (0 until 30).map(j => s"tok${i}_$j").mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
    // build + cache the signature artifact untimed (cap=1 drops every
    // bucket, so only the signature job runs) — all three timed variants
    // then start from the same cached signatures
    graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text",
      maxBucketSize = Some(1)).write.format("noop").mode("overwrite").save()
    withProps("graft.salt.hotBucket" -> (1 << 30).toString) {
      skewReport("lsh bucket-join stopword corpus, salting OFF",
        graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text"))
    }
    skewReport("lsh bucket-join, default salting (hot buckets spread)",
      graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text"))
    skewReport("lsh bucket-join with maxBucketSize=64 (lossy cap)",
      graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text", maxBucketSize = Some(64)))

    // ---- 3. sanity: INPUT-skewed shuffled join — one key holds ~2M left
    // rows (tens of MB in one shuffle partition) against a uniform right
    // side. This is the shape AQE's skew splitting is built for; it must
    // report skew=true here or the probe itself is broken.
    val left = spark.range(0, 3000000)
      .select(when(col("id") % 3 =!= 0, lit(0L)).otherwise(col("id") % 997).as("k"),
        concat(lit("payload_payload_payload_"), col("id")).as("pay"))
    val right = spark.range(0, 997).select(col("id").as("k"), lit("dim").as("d"))
    val sj = left.join(right.hint("shuffle_hash"), Seq("k"))
    skewReport("sanity input-skew join", sj)

    println("[skew] conclusion: AQE splits INPUT skew (sanity case) but the")
    println("[skew]   closure delta and LSH bucket joins amplify small inputs")
    println("[skew]   into large outputs — input-size-based skew detection")
    println("[skew]   cannot see them. Both now take the LOSSLESS salted path")
    println("[skew]   (ops.SkewSalt / Rewriter.stepJoin): hot-key pair")
    println("[skew]   enumeration spreads across the salt fan-out instead of")
    println("[skew]   one task; maxBucketSize remains as a lossy hard cap.")
    spark.stop()
  }
}
