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
    // Two-phase bucketed exact trim (r22, VERDICT r21 #6). The r20 form
    // ranked every row with one row_number window per group — a total
    // per-group sort, i.e. |groups| sort tasks each holding a full group
    // (3 tasks over the whole corpus at q160's shape; unshardable at
    // scale). The trim is rank-DEFINED but its OUTPUT is rank-free: the
    // kept-set SUM depends only on the value multiset (rows tied on v are
    // interchangeable under any tieCols order), and the kept COUNT is
    // always exactly n − 2t (t < n/2 by the permille bound). So:
    //   1. per-group n/min/max (one map-side-partial aggregate);
    //   2. per-(group, bucket) count+sum over ~1024 monotone value buckets
    //      (map-side partials; the only corpus-wide shuffle is this
    //      bucket-count frame);
    //   3. a window over the BUCKET frame (≤ ~1026 rows per group) finds
    //      each bucket's bottom/top trim take; buckets strictly inside the
    //      kept band contribute their aggregate sum, fully-trimmed buckets
    //      drop, and only the ≤ 2 straddling buckets per group resolve at
    //      value granularity (per-(group,bucket,value) counts + a window
    //      over ~n/1024 rows).
    // sum_kept is BIT-identical to the rank form even under 64-bit wrap:
    // long addition is mod-2^64 associative/commutative, and kept_v · v
    // equals v added kept_v times mod 2^64. Null values replicate the
    // rank form's NULLS FIRST placement: they land in a null bucket that
    // sorts first, count toward n/n_kept, and contribute nothing to the
    // sum (an all-null kept set yields a null sum_kept, as before).
    val gcols = groupCols.map(col)
    // one bounded materialization (the tokenBudgetSelect pattern): phases
    // 1–3 re-read (groups, v) instead of re-running the caller's producer
    val base = df.select((gcols :+ col(valueCol).cast("long").as("__tm_v")): _*)
      .localCheckpoint()
    // `div` (trunc toward zero) is monotone; the width is computed in
    // DECIMAL on the tiny range frame so hi − lo cannot wrap, and the
    // per-row bucket (v div w) − (lo div w) stays within ~[0, 1026]
    // without ever forming v − lo (which can overflow long).
    val rng = base.groupBy(gcols: _*)
      .agg(count(lit(1)).as("__tm_n"),
        min(col("__tm_v")).as("__tm_lo"), max(col("__tm_v")).as("__tm_hi"))
      .withColumn("__tm_t", expr(s"(__tm_n * $permille) div 1000"))
      .withColumn("__tm_w", expr(
        "CAST((CAST(__tm_hi AS DECIMAL(38,0)) - __tm_lo) div 1024 AS BIGINT) + 1"))
    val bucketed = base
      .join(broadcast(rng), groupCols)
      .withColumn("__tm_b",
        expr("(__tm_v div __tm_w) - (__tm_lo div __tm_w)").cast("int"))
    val bcnt = bucketed.groupBy((gcols :+ col("__tm_b")): _*)
      .agg(count(lit(1)).as("__tm_c"), sum(col("__tm_v")).as("__tm_s"),
        max(col("__tm_n")).as("__tm_n"), max(col("__tm_t")).as("__tm_t"))
    val wB = Window.partitionBy(gcols: _*).orderBy(col("__tm_b"))
    val marked = bcnt
      .withColumn("__tm_cb", coalesce(sum(col("__tm_c")).over(
        wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tm_ca", col("__tm_n") - col("__tm_cb") - col("__tm_c"))
      .withColumn("__tm_tl",
        greatest(lit(0L), least(col("__tm_c"), col("__tm_t") - col("__tm_cb"))))
      .withColumn("__tm_th",
        greatest(lit(0L), least(col("__tm_c"), col("__tm_t") - col("__tm_ca"))))
    val interior = marked
      .where(col("__tm_tl") === 0L && col("__tm_th") === 0L)
      .groupBy(gcols: _*).agg(sum(col("__tm_s")).as("__tm_isum"))
    // straddling buckets: partially trimmed, some rows kept — at most one
    // per trim side per group
    val partialDesc = marked
      .where((col("__tm_tl") > 0L || col("__tm_th") > 0L) &&
        col("__tm_c") - col("__tm_tl") - col("__tm_th") > 0L)
      .select((gcols :+ col("__tm_b") :+ col("__tm_c").as("__tm_bc") :+
        col("__tm_tl") :+ col("__tm_th")): _*)
    val wV = Window.partitionBy((gcols :+ col("__tm_b")): _*).orderBy(col("__tm_v"))
    val psum = bucketed
      .join(broadcast(partialDesc), groupCols :+ "__tm_b")
      .groupBy((gcols :+ col("__tm_b") :+ col("__tm_v")): _*)
      .agg(count(lit(1)).as("__tm_cv"), max(col("__tm_bc")).as("__tm_bc"),
        max(col("__tm_tl")).as("__tm_tl"), max(col("__tm_th")).as("__tm_th"))
      .withColumn("__tm_vcb", coalesce(sum(col("__tm_cv")).over(
        wV.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tm_vca", col("__tm_bc") - col("__tm_vcb") - col("__tm_cv"))
      .withColumn("__tm_keep",
        col("__tm_cv")
          - greatest(lit(0L), least(col("__tm_cv"), col("__tm_tl") - col("__tm_vcb")))
          - greatest(lit(0L), least(col("__tm_cv"), col("__tm_th") - col("__tm_vca"))))
      .groupBy(gcols: _*)
      .agg(sum(col("__tm_keep") * col("__tm_v")).as("__tm_psum"))
    rng.join(interior, groupCols, "left")
      .join(psum, groupCols, "left")
      .select((gcols :+
        col("__tm_n").as("n_rows") :+
        (col("__tm_n") - lit(2L) * col("__tm_t")).as("n_kept") :+
        when(col("__tm_isum").isNull && col("__tm_psum").isNull,
          lit(null).cast("long"))
          .otherwise(coalesce(col("__tm_isum"), lit(0L)) +
            coalesce(col("__tm_psum"), lit(0L))).as("sum_kept")): _*)
      .withColumn("trimmed_mean",
        col("sum_kept").cast("double") / col("n_kept").cast("double"))
  }

  /** Pareto frontier over two integer objectives — the multi-objective
    * data-selection primitive (keep documents not dominated on
    * (quality↑, cost↓); scalarizing to one score hides the trade-off the
    * frontier preserves). A row is dominated iff another row is ≥ in
    * quality and ≤ in cost with at least one strict.
    *
    * Scale shape: two-phase. Phase 1 buckets cost into `buckets` integer
    * ranges, takes per-bucket max quality (one tiny aggregate), and drops
    * every row dominated by a STRICTLY-cheaper bucket's max — a
    * conservative, provably-sound prefilter (integer bucket edges: b' < b
    * ⇒ cost' < cost) that runs as one broadcast join + filter over the
    * scan, eliminating the overwhelming majority at corpus scale. Phase 2
    * runs the exact sweep over the survivors with two range-frame windows
    * (max quality over cost < current, and over cost ≤ current) — a
    * single-partition sort, which is safe ONLY because survivors are
    * frontier-sized, not corpus-sized (the q132 rule, satisfied by
    * construction). All-integer comparisons; fully deterministic.
    *
    * Output: doc_id, quality, cost, on_front (every input row, flagged).
    */
  def paretoFront(df: DataFrame, idCol: String, qualityCol: String,
      costCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, "paretoFront: need >= 2 buckets")
    val base = df.select(col(idCol).as("doc_id"),
      col(qualityCol).cast("long").as("q"), col(costCol).cast("long").as("c"))
    val rng = base.agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"))
    val bucketed = base.crossJoin(broadcast(rng))
      .withColumn("b", expr(s"((c - cmin) * ${buckets}L) div (cmax - cmin + 1)"))
    val bmax = bucketed.groupBy("b").agg(max(col("q")).as("bq"))
      .withColumn("prevMax", max(col("bq")).over(Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)))
    val survivors = bucketed
      .join(broadcast(bmax.select(col("b"), col("prevMax"))), Seq("b"), "left")
      .where(col("prevMax").isNull || col("prevMax") < col("q"))
    val wStrict = Window.orderBy(col("c"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wIncl = Window.orderBy(col("c"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val front = survivors
      .withColumn("mqLt", max(col("q")).over(wStrict))
      .withColumn("mqLe", max(col("q")).over(wIncl))
      .where(!(coalesce(col("mqLt"), lit(Long.MinValue)) >= col("q") ||
        col("mqLe") > col("q")))
      .select(col("doc_id"), lit(true).as("on_front"))
    base.join(broadcast(front), Seq("doc_id"), "left")
      .select(col("doc_id"), col("q").as("quality"), col("c").as("cost"),
        coalesce(col("on_front"), lit(false)).as("on_front"))
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
