package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * Single-file text loading through the Hadoop FileSystem API, so the
 * driver-parsed formats (Turtle/TriG/N3/RDF-XML — see [[Turtle.read]] /
 * [[RdfXml.read]]) accept the same storage schemes as the `spark.read`
 * paths (.nt/.nq/parquet): local files, HDFS, S3A, … — the reference's
 * `Store::load_from_reader` is reader-agnostic in the same way
 * (/root/reference/lib/rdf-fusion/src/store.rs:477-514).
 */
private[graft] object FileText {

  /** Read one file's full text (UTF-8) via the session's Hadoop conf. */
  def read(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
