package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Similarity search: exact vs approximate recall on real embeddings. */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSeq

  test("exact cosine top-k is ordered and excludes the query") {
    val top = Similarity.cosineTopK(emb, "vec_id", "embedding", queryId = 0L, k = 10)
    val rows = top.collect()
    assert(rows.length == 10)
    assert(!ids(top).contains(0L))
    val sims = rows.map(_.getAs[Double]("sim"))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("IVF top-k has reasonable recall vs exact") {
    val exact = ids(Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)).toSet
    val ivf = ids(Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
      nClusters = 8, nProbe = 4)).toSet
    assert(ivf.size == 10)
    assert((exact & ivf).size >= 5, s"recall too low: ${(exact & ivf).size}/10")
  }

  test("LSH ANN returns k candidates") {
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", 0L, 10, nPlanes = 6)
    assert(ann.count() == 10)
  }

  test("centroids: element-wise mean per label, dimension order preserved") {
    import spark.implicits._
    val emb = Seq(("a", Seq(1.0f, 2.0f, 30.0f)), ("a", Seq(3.0f, 6.0f, 10.0f)),
      ("b", Seq(5.0f, 5.0f, 5.0f))).toDF("label", "embedding")
    val out = Similarity.centroids(emb, "label", "embedding")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") == Seq(2.0, 4.0, 20.0))
    assert(out("b") == Seq(5.0, 5.0, 5.0))
  }

  test("IVF top-k is EXACT vs brute force on random + clustered embeddings") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // half clustered tightly (stresses the probe path), half uniform
    // (stresses the radius bound: neighbours spread across many cells)
    val dims = 16
    val centers = Array.fill(3)(Array.fill(dims)(rnd.nextDouble() * 2 - 1))
    val vecs = (0L until 400L).map { i =>
      val v = if (i % 2 == 0) {
        val c = centers(rnd.nextInt(3))
        c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      } else Array.fill(dims)((rnd.nextDouble() * 2 - 1).toFloat)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding").localCheckpoint()
    for (qid <- Seq(0L, 7L, 123L)) {
      val exact = Similarity.cosineTopK(vecs, "vec_id", "embedding", qid, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", qid,
          k = 10, nClusters = 8, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(ivf.toSeq == exact.toSeq, s"query $qid: ivf != exact")
    }
  }

  test("batch ivfTopKAll equals the per-query ivfTopK loop") {
    import spark.implicits._
    val qids = Seq(0L, 3L, 17L, 42L, 99L)
    val queries = qids.toDF("vec_id")
    val batch = Similarity.ivfTopKAll(emb, "vec_id", "embedding", queries, "vec_id",
        k = 10, nClusters = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val loop = qids.flatMap { q =>
      Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10, nClusters = 8, nProbe = 2)
        .collect().map(r => (q, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == loop, s"batch≠loop:\nonly batch=${(batch -- loop).take(5)}\nonly loop=${(loop -- batch).take(5)}")
  }

  test("batch cosineTopKAll equals the per-query cosineTopK loop") {
    import spark.implicits._
    val qids = Seq(2L, 11L, 50L)
    val batch = Similarity.cosineTopKAll(emb, "vec_id", "embedding", qids.toDF("vec_id"),
        "vec_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val loop = qids.flatMap { q =>
      Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(r => (q, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == loop, s"batch≠loop:\nonly batch=${(batch -- loop).take(5)}\nonly loop=${(loop -- batch).take(5)}")
  }

  test("batch annTopKAll equals the per-query annTopK loop") {
    import spark.implicits._
    val qids = Seq(0L, 5L, 31L, 64L)
    val batch = Similarity.annTopKAll(emb, "vec_id", "embedding", qids.toDF("vec_id"),
        "vec_id", k = 10, nPlanes = 6, probeHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val loop = qids.flatMap { q =>
      Similarity.annTopK(emb, "vec_id", "embedding", q, 10, nPlanes = 6, probeHamming = 1)
        .collect().map(r => (q, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == loop, s"batch≠loop:\nonly batch=${(batch -- loop).take(5)}\nonly loop=${(loop -- batch).take(5)}")
  }

  test("kmeans separates two obvious clusters with deterministic seeds") {
    import spark.implicits._
    // seeds are the 2 lowest ids — both in the near-origin cluster; one
    // update round must pull centroid 1 toward the far group
    val tiny = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.1f, 0.0f)),
      (3L, Seq(10.0f, 10.0f)), (4L, Seq(10.1f, 10.0f))).toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(tiny, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1), s"got $got")
  }

  test("kmeans on real embeddings: k clusters, all vectors assigned, deterministic") {
    val a = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a == b && a.size == emb.count() && a.values.toSet.subsetOf(Set(0, 1, 2, 3)))
  }

  test("quantized cosine equals exact cosine when values sit on the int8 grid") {
    import spark.implicits._
    // all dims span [0, 255] with integer values -> quantisation is lossless
    val grid = Seq(
      (0L, Seq(255.0f, 0.0f, 10.0f)), (1L, Seq(200.0f, 30.0f, 0.0f)),
      (2L, Seq(10.0f, 255.0f, 255.0f)), (3L, Seq(0.0f, 100.0f, 30.0f)),
      (4L, Seq(128.0f, 128.0f, 255.0f))).toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(grid, "vec_id", "embedding", 0L, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val quant = Similarity.quantizedCosineTopK(grid, "vec_id", "embedding", 0L, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(quant == exact, s"quant=$quant exact=$exact")
  }

  test("quantized cosine approximates exact on real embeddings (high recall)") {
    val exact = ids(Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)).toSet
    val quant = Similarity.quantizedCosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(quant.size == 10 && (exact & quant).size >= 7,
      s"quantised recall too low: ${(exact & quant).size}/10")
  }

  test("batch ivfTopKAll is exact vs brute force per query") {
    val qids = Seq(1L, 7L, 23L)
    import spark.implicits._
    val batch = Similarity.ivfTopKAll(emb, "vec_id", "embedding", qids.toDF("vec_id"), "vec_id",
        k = 5, nClusters = 8, nProbe = 1)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    qids.foreach { q =>
      val exact = ids(Similarity.cosineTopK(emb, "vec_id", "embedding", q, 5)).toSet
      assert(batch(q) == exact, s"q=$q: ${batch(q)} != $exact")
    }
  }
}

