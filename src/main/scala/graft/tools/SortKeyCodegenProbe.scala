package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduces the janino "Code grows beyond 64 KB" overflow seen in the
  * default test gate: a tiny SELECT ... ORDER BY ?term over mixed literals
  * falls back to interpreted projection because the full TermCols.sortKey
  * expression tree overflows a single generated method. */
object SortKeyCodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val EX = "http://ex.org/"
    val df = graft.engine.Graft(graft.sources.NTriples.fromString(spark,
      s"""<${EX}a> <${EX}name> "Al \\"ice\\"" .
         |<${EX}a> <${EX}age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
         |<${EX}b> <${EX}name> "Bob"@en .
         |""".stripMargin))
      .select(s"""SELECT ?s ?n WHERE { ?s <${EX}name> ?n } ORDER BY ?n""")
    df.collect()
    // dump generated code sizes
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    val lens = code.split("\n\n").map(_.length)
    System.err.println(s"[probe] codegen chunks: ${lens.length}, total ${code.length} chars")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/sortkey_codegen.txt"), code)
    spark.stop()
  }
}
