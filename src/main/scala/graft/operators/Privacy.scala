package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators for training-data curation — the
  * re-identification gate that runs AFTER PII redaction
  * (`TextAnalysis.piiRedact` scrubs direct identifiers; this family
  * handles QUASI-identifiers, whose combination is identifying even when
  * each column alone is harmless).
  */
object Privacy {

  /** k-anonymity suppression (Sweeney, IJUFKS 2002): a row is safe to
    * release iff at least `k` rows share its full quasi-identifier
    * combination (its equivalence class). Rows in classes smaller than
    * `k` get `suppressed = true`; callers either drop them or generalize
    * a quasi column and re-run (the generalization-ladder loop —
    * coarsening a bucket column monotonically grows classes, so the loop
    * terminates).
    *
    * Scale shape: ONE hash-partitioned shuffle on the quasi-identifier
    * tuple — the class size is an unordered window count (no ORDER BY →
    * no sort, a full-partition count), so Spark plans
    * partial-count + window over hash partitions, never a global sort or
    * single reducer. Class-size skew is bounded by the biggest
    * equivalence class, which is exactly the quantity k-anonymity keeps
    * small-ish for the classes that matter; the one giant all-default
    * class a real corpus has is a single hot partition → AQE skew split
    * handles it (same exposure as any groupBy).
    *
    * Output: input columns + `qi_n` (class size) + `suppressed`.
    */
  def kAnonymize(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(quasi.nonEmpty, "kAnonymize: quasi-identifier set must be non-empty")
    require(k >= 1, "kAnonymize: k must be >= 1")
    val w = Window.partitionBy(quasi.map(col): _*)
    df.withColumn("qi_n", count(lit(1)).over(w))
      .withColumn("suppressed", col("qi_n") < k)
  }

  /** Release-audit summary: per `groupCols` slice, how many rows survive
    * `kAnonymize` at `k` and how small the smallest equivalence class is.
    * The per-slice rollup a release pipeline reports before shipping.
    */
  def kAnonymityReport(df: DataFrame, quasi: Seq[String], k: Int,
      groupCols: Seq[String]): DataFrame = {
    val flagged = kAnonymize(df, quasi, k)
    flagged.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("suppressed"), lit(1))).as("n_suppressed"),
        min(col("qi_n")).as("min_class"))
  }
}
