package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust-statistics outlier screening — the numeric-column counterpart of
  * the text-quality gates (q38/q85): median + MAD instead of mean + stddev,
  * so a contaminated tail cannot drag the threshold toward itself (the
  * classic failure of z-scores on heavy-tailed data; breakdown point 50%
  * vs 0%).
  *
  * Exactness strategy: both statistics are LOWER MEDIANS over an integer
  * column, computed by value-keyed counting — group the corpus by value
  * (one shuffle, output bounded by the VALUE DOMAIN, not the row count),
  * cumulative-sum the ordered distinct values, probe the first value whose
  * cumulative count reaches ⌈n/2⌉. Integer selection is order-independent
  * and engine-exact, unlike interpolated percentile_approx. The cumulative
  * window runs over distinct values only — for domain-bounded columns
  * (prices in cents/dollars, lengths, counts) that stays O(domain) at any
  * corpus size; it is NOT the global row_number anti-pattern because the
  * corpus itself never enters the window.
  */
object Robust {

  /** One-row (med, mad, n) for long column `valueCol`: med = lower median
    * of values, mad = lower median of |v − med| (the raw MAD — callers
    * scale by 1.4826 only when they want σ-consistency under normality;
    * the integer multiple `mult` in [[madOutlierReport]] keeps the gate
    * exact instead).
    */
  def madStats(df: DataFrame, valueCol: String): DataFrame = {
    val cnts = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    val tot = cnts.agg(sum(col("cnt")).as("n"))
    def lowerMedian(counts: DataFrame, vc: String): DataFrame = {
      val w = Window.orderBy(col(vc)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counts.withColumn("c", sum(col("cnt")).over(w))
        .crossJoin(broadcast(tot))
        .where(col("c") >= expr("(n + 1) div 2"))
        .agg(min(col(vc)).as(vc))
    }
    val med = lowerMedian(cnts, "v").withColumnRenamed("v", "med")
    val dev = cnts.crossJoin(broadcast(med))
      .select(abs(col("v") - col("med")).as("d"), col("cnt"))
      .groupBy("d").agg(sum(col("cnt")).as("cnt"))
    val mad = lowerMedian(dev, "d").withColumnRenamed("d", "mad")
    broadcast(med).crossJoin(broadcast(mad)).crossJoin(broadcast(tot))
  }

  /** Per-`groupCols` outlier audit: a row is an outlier iff
    * |v − med| > mult · mad, with med/mad the GLOBAL robust statistics
    * (per-group medians would hide a group that is itself anomalous).
    * Output: groupCols*, n_rows, n_outliers, med, mad. The names `med` and
    * `mad` are RESERVED in the input (the broadcast stats row introduces
    * them before the aggregate); per-row intermediates carry the `__mad_`
    * prefix so no caller column is clobbered (ADVICE r11).
    *
    * Scale shape: two value-keyed count shuffles + two domain-bounded
    * cumulative windows for the stats, then one broadcast of the one-row
    * (med, mad) into a per-row flag projection and a single hash
    * aggregate over groupCols. The corpus is scanned twice (stats pass,
    * flag pass) — the unavoidable two-pass of any exact global-statistic
    * filter; at 100 TB the stats pass reduces to domain-sized partials
    * map-side, so the second scan dominates and pipelines into the agg.
    */
  /** Exact per-group trimmed mean: drop the lowest and highest
    * ⌊n·permille/1000⌋ rows of each group by value order, average the
    * rest — the robust location estimate between mean (trim 0) and median
    * (trim 500). All-integer trim counts over a (value, tiebreak) total
    * order make the kept SET engine-exact; the emitted sum is an exact
    * integer and the mean is one IEEE division of it (the q42 rule:
    * floats only as a final presentation step over exact integers).
    *
    * Scale shape: ONE keyed window (hash-partitioned on the group — the
    * q132 no-single-reducer rule) + one shrinking aggregate. `tieCols`
    * must make the order total (equal values are interchangeable for the
    * SUM, but a total order keeps row-level plans replayable).
    */
  def trimmedMeanReport(df: DataFrame, valueCol: String, groupCols: Seq[String],
      permille: Int, tieCols: Seq[String]): DataFrame = {
    require(permille >= 0 && permille < 500, "trimmedMeanReport: permille in [0, 500)")
    require(groupCols.nonEmpty && tieCols.nonEmpty, "trimmedMeanReport: need group and tie columns")
    // The trim boundary and the sum must see the SAME values: a fractional
    // valueCol would rank on doubles but sum silently-truncated longs
    // (ADVICE r13). Integral types only; callers integerize first (the
    // repo's FLOOR convention, q160).
    df.schema(valueCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"trimmedMeanReport: valueCol '$valueCol' must be integral (got $other); " +
          "FLOOR-integerize (e.g. cents) before calling")
    }
    val grp = Window.partitionBy(groupCols.map(col): _*)
    val w = grp.orderBy((col("__tm_v") +: tieCols.map(col)): _*)
    df.withColumn("__tm_v", col(valueCol).cast("long"))
      .withColumn("__tm_rn", row_number().over(w))
      .withColumn("__tm_n", count(lit(1)).over(grp))
      .withColumn("__tm_t", expr(s"(__tm_n * $permille) div 1000"))
      .where(col("__tm_rn") > col("__tm_t") && col("__tm_rn") <= col("__tm_n") - col("__tm_t"))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__tm_n")).as("n_rows"),
        count(lit(1)).as("n_kept"),
        sum(col("__tm_v")).as("sum_kept"))
      .withColumn("trimmed_mean",
        col("sum_kept").cast("double") / col("n_kept").cast("double"))
  }

  def madOutlierReport(df: DataFrame, valueCol: String, mult: Long,
      groupCols: Seq[String]): DataFrame = {
    require(mult >= 1, "madOutlierReport: mult must be >= 1")
    val stats = madStats(df, valueCol)
    // __mad_v, not "v": a caller column named v must not be clobbered by
    // the flag projection (ADVICE r11 reserved-name hazard)
    df.withColumn("__mad_v", col(valueCol).cast("long"))
      .crossJoin(broadcast(stats.select(col("med"), col("mad"))))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(abs(col("__mad_v") - col("med")) > col("mad") * mult, lit(1)))
          .as("n_outliers"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"))
  }
}
