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

  /** t-closeness audit (Li/Li/Venkatasubramanian, ICDE 2007): l-diversity
    * is still not enough when a class's sensitive-value DISTRIBUTION leaks
    * (a class can hold l distinct diagnoses yet be 98% one of them while
    * the population is 2%). A class is t-close iff the distance between
    * its sensitive distribution Q and the global distribution P is ≤ t;
    * for a categorical attribute with uniform ground distance the EMD of
    * the paper reduces to the variational distance ½·Σ|P(s) − Q(s)|.
    *
    * Everything stays BIGINT-exact for the oracle gate: with global
    * counts g_s (total N) and class counts c_s (class size n_c),
    * ½·Σ|g_s/N − c_s/n_c| = Σ|g_s·n_c − c_s·N| / (2·N·n_c) — reported as
    * the integer pair (dist_num, dist_den), and the breach test against
    * t = tNum/tDen cross-multiplies: breach ⟺ tDen·dist_num > tNum·dist_den.
    * Zero-count cells contribute |g_s·n_c| (a value the class never shows
    * IS distributional distance), which the left join makes explicit.
    *
    * Output: quasi*, class_n, dist_num, dist_den, breach — one row per
    * equivalence class.
    *
    * Scale shape: the global distribution is a ≤|S|-row broadcast
    * (categorical sensitive domain); the per-class expansion is
    * classes × |S| rows through a broadcast join (never row-count-bound),
    * then one (quasi, s)-keyed left join and one shrinking quasi-keyed
    * aggregate. No window, no self-join; the widest shuffle carries one
    * row per distinct (class, sensitive) pair — the same bound as
    * lDiversityReport's distinct step.
    */
  def tClosenessReport(df: DataFrame, quasi: Seq[String], sensitiveCol: String,
      tNum: Long, tDen: Long): DataFrame = {
    require(quasi.nonEmpty, "tClosenessReport: quasi-identifier set must be non-empty")
    require(tNum >= 0 && tDen > 0, "tClosenessReport: need t = tNum/tDen >= 0")
    val s = col(sensitiveCol)
    val global = df.groupBy(s.as("__tc_s"))
      .agg(count(lit(1)).as("__tc_g"))
    val total = df.agg(count(lit(1)).as("__tc_n"))
    val cells = df.groupBy(quasi.map(col) :+ s.as("__tc_s"): _*)
      .agg(count(lit(1)).as("__tc_c"))
    val classes = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_n"))
    classes
      .crossJoin(broadcast(global))
      .join(cells, quasi :+ "__tc_s", "left")
      .crossJoin(broadcast(total))
      .select((quasi.map(col) :+ col("class_n") :+ col("__tc_n") :+
        abs(col("__tc_g") * col("class_n")
          - coalesce(col("__tc_c"), lit(0L)) * col("__tc_n")).as("__tc_term")): _*)
      .groupBy(quasi.map(col): _*)
      .agg(max(col("class_n")).as("class_n"),
        sum(col("__tc_term")).as("dist_num"),
        (lit(2L) * max(col("__tc_n")) * max(col("class_n"))).as("dist_den"))
      .withColumn("breach",
        lit(tDen) * col("dist_num") > lit(tNum) * col("dist_den"))
  }
}
