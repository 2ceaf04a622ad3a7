package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** Rows of a single-var result as a sorted list of lexical values. */
  def lex(df: DataFrame, col: String): Seq[String] =
    df.select(s"$col.v").collect().map(r => Option(r.getString(0)).getOrElse("∅")).toSeq.sorted

  def rows(df: DataFrame, cols: String*): Set[Seq[String]] =
    df.select(cols.map(c => org.apache.spark.sql.functions.col(s"$c.v")): _*)
      .collect().map(_.toSeq.map(x => if (x == null) "∅" else x.toString)).toSet
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
