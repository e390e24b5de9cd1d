package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One verifiable query: Spark implementation + (optionally) the exact
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Queries without SQL get the weaker rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    sql: Option[String])

object Q {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}

object Tables {
  /** All driver tables are single parquet files under the sf dir.
    *
    * `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read natively: read it as a long and truncate to microseconds — exactly
    * what DuckDB does when it reads the same file, so oracle comparisons see
    * identical values. Integer `div` (not `/`) because epoch-nanos ≈ 1.7e18
    * exceeds double's 53-bit mantissa.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path)
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(path)
  }

  /** Exact decimal view of a 2-dp double column: makes SUM/ordering
    * deterministic and bit-identical across Spark and DuckDB (double
    * summation is association-order-dependent; decimal is exact).
    * Precision 9 keeps products within both engines' 38-digit cap.
    */
  def dec(c: Column): Column = c.cast("decimal(9,2)")
}
