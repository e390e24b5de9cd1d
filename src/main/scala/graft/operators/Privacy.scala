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
    * Output: input columns + `qi_n` (class size) + `suppressed`. These two
    * output names are RESERVED: an input column with either name is
    * replaced by the operator's column (ADVICE r11 documented contract).
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

  /** l-diversity audit (Machanavajjhala et al., ICDE 2006): k-anonymity is
    * not enough when an equivalence class is homogeneous in the SENSITIVE
    * attribute (every row shares one diagnosis → re-identification reveals
    * it anyway). A class is l-diverse iff it contains ≥ l distinct
    * sensitive values. Per `groupCols` slice: class count, classes below
    * `l` (the release blockers), the worst diversity, and row count.
    *
    * Scale shape: one hash aggregate keyed by (quasi, sensitive) — the
    * distinct step — then two strictly-shrinking re-aggregations (quasi,
    * then slice). All partial-aggregating, no window, no join; the widest
    * shuffle carries one row per distinct (class, value) pair.
    */
  def lDiversityReport(df: DataFrame, quasi: Seq[String], sensitiveCol: String,
      l: Int, groupCols: Seq[String]): DataFrame = {
    require(quasi.nonEmpty, "lDiversityReport: quasi-identifier set must be non-empty")
    require(l >= 1, "lDiversityReport: l must be >= 1")
    require(groupCols.forall(quasi.contains),
      "lDiversityReport: groupCols must be a subset of the quasi-identifier columns")
    val classes = df
      .groupBy(quasi.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("diversity"),
        count(lit(1)).as("class_n"))
    classes.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_classes"),
        count(when(col("diversity") < l, lit(1))).as("n_weak"),
        min(col("diversity")).as("min_diversity"),
        sum(col("class_n")).as("n_rows"))
  }
}
