package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks natively, composed from built-ins
  * (preference (a) of the custom-operator ladder: no custom plan needed).
  */
object Temporal {

  /** As-of join: for every left row, attach the payload of the latest
    * right row with the same key and `right.ts <= left.ts`.
    *
    * Contract: right rows whose payload is null are treated as ABSENT (the
    * ignoreNulls window skips them) — an explicit "unset" right row does
    * not shadow an earlier value. Use a sentinel payload if tombstone
    * semantics are needed.
    *
    * Implemented as union + ordered window (`last(_, ignoreNulls)` over an
    * unbounded-preceding frame) rather than a range join: ONE shuffle on
    * the key, no pair explosion, skew bounded by per-key row counts — the
    * shape that survives 100 TB. Right rows sort before left rows at equal
    * ts so `<=` semantics hold.
    *
    * @param left      (key, ts, …left cols)
    * @param right     (key, ts, payload)
    * @param payloadCol single right-side payload column to carry
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, payloadCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__is_left", lit(1))
      .withColumn("__payload", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right.select(col(keyCol), col(tsCol),
      lit(0).as("__is_left"), col(payloadCol).as("__payload"))
    val unioned = l.select((Seq(col(keyCol), col(tsCol), col("__is_left"), col("__payload")) ++
      leftCols.filterNot(c => c == keyCol || c == tsCol).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)
    // __payload as final tiebreak: two right rows with identical (key, ts)
    // would otherwise resolve by engine-internal row order (nondeterministic)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__is_left"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1)
      .select(leftCols.map(col) :+ col("__asof").as(s"asof_$payloadCol"): _*)
  }

  /** Banded range join: `left.v BETWEEN right.lo AND right.hi`. A raw
    * interval predicate is a nested-loop join (O(n·m) — dead at 100 TB);
    * bucketing by `floor(x / band)` turns it into an equi-join: each
    * interval replicates into every bucket it touches (ceil(width/band)+1
    * rows — pick `band` ≈ the typical interval width so that's ~2), a
    * point joins only its own bucket, and the exact BETWEEN re-checks the
    * equi-matched candidates. Result is bit-identical to the nested-loop
    * form for ANY interval width; `band` tunes replication vs selectivity
    * only. ONE hash shuffle on the bucket key.
    */
  def bandJoin(
      left: DataFrame, right: DataFrame,
      vCol: String, loCol: String, hiCol: String,
      band: Double, maxBuckets: Long = 1L << 20): DataFrame = {
    require(band > 0, "band must be positive")
    val l = left.withColumn("__bucket",
      floor(col(vCol) / band).cast("long"))
    val bLo = floor(col(loCol) / band).cast("long")
    val bHi = floor(col(hiCol) / band).cast("long")
    // Replication guard: one pathological interval with width >> band would
    // explode into millions of bucket rows, and sequence() hard-errors past
    // ~Int.MaxValue elements — an opaque failure. Fail with an actionable
    // message (raise the band, or raise maxBuckets deliberately) instead.
    val guardedLo = when(bHi - bLo > maxBuckets,
      raise_error(concat(
        lit(s"bandJoin: interval spans more than $maxBuckets buckets at band=$band: ["),
        col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"),
        lit("] — increase band or maxBuckets"))).cast("long"))
      .otherwise(bLo)
    val r = right.withColumn("__bucket",
      explode(sequence(guardedLo, bHi)))
    l.join(r, Seq("__bucket"))
      .where(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Batch sessionization with an idle-gap rule — the per-event session
    * ASSIGNMENT complement to the streaming session window
    * (`StreamingOps.sessionCounts` aggregates; this labels, so sessions
    * can join back to their events for funnel/attribution work). The
    * classic lag-then-running-sum shape: a session break is a gap >
    * `gapUs` from the previous event of the same key (first event breaks
    * by definition), and the session ordinal is the running count of
    * breaks. All arithmetic is epoch-µs integers (the q50/q98 rule);
    * (ts, id) is the total order so ties cannot flip engines.
    *
    * Scale shape: both windows are keyed on `keyCol` (hash-partitioned,
    * no single reducer — the q132 rule) over the SAME (key, ts, id) sort,
    * so Catalyst plans ONE exchange + ONE sort reused by both; the
    * per-session rollup is one more keyed aggregation. Skew bound is
    * per-key event count, same as any per-entity window.
    *
    * Output: one row per session — key, session_seq (1-based), n_events,
    * start_us, end_us, duration_us.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, gapUs: Long): DataFrame = {
    require(gapUs > 0, "sessionize: gapUs must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us"), col(idCol))
    val withBreaks = events
      .select(col(keyCol), col(idCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__brk",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withBreaks.groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** First-order event-transition matrix: counts of consecutive
    * (from_type → to_type) pairs per user journey — the Markov-chain
    * summary behind funnel diagnostics, anomalous-flow detection, and
    * session-model features. Consecutive = adjacent under the total
    * (ts, id) order within a key (the sessionize tie rule, so same-instant
    * events cannot flip engines). `rate` is the one presentation double
    * over the exact pair/row counts: P(to | from) with the denominator
    * counting OBSERVED transitions out of `from` (last events of a
    * journey emit no pair and are not part of any denominator).
    *
    * Scale shape: one keyed lag window (hash-partitioned on the journey
    * key — parallelism = #users, per-task sort bounded by the largest
    * journey) + one (from, to)-keyed aggregate whose output is
    * |event-type|² rows regardless of corpus size.
    */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"), col(idCol))
    val pairs = events
      .select(col(keyCol), col(idCol), col(typeCol).as("to_type"),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_pairs"))
    val fromTotals = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("n_from", sum(col("n_pairs")).over(fromTotals))
      .withColumn("rate",
        col("n_pairs").cast("double") / col("n_from").cast("double"))
  }

  /** Daily burst detection per event type: a day is a burst when its count
    * exceeds `multNum/multDen` × the trailing `windowDays`-day calendar
    * mean — the volume-anomaly gate (crawl storms, bot floods, pipeline
    * replays) in exact integers: the comparison is the cross-multiply
    * n·W·multDen > multNum·trailing, so no float mean ever exists. The
    * trailing window is CALENDAR days (RANGE over the epoch-day integer),
    * so silent days correctly drag the baseline down instead of being
    * skipped; days with no baseline (nothing in the preceding W days) are
    * not flagged.
    *
    * Scale shape: one (type, day) count aggregate — output is
    * types×days-sized, corpus-size-independent — then one type-keyed
    * range window over that small frame. The corpus is touched once.
    */
  def burstDays(events: DataFrame, typeCol: String, tsCol: String,
      windowDays: Int, multNum: Long, multDen: Long = 1L): DataFrame = {
    require(windowDays >= 1 && multNum >= 1 && multDen >= 1,
      "burstDays: windowDays/multNum/multDen must be >= 1")
    // integer div, not `/`: double division of epoch-µs near a midnight
    // boundary can round up across the integer before the cast truncates
    val daily = events
      .select(col(typeCol).as("event_type"),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("day", expr("__us div 86400000000L"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-windowDays.toLong, -1L)
    // full-baseline guard: without it every early sparse day flags (a
    // 1/day series' second day has trailing mean 1/7 and 1 > 2/7) — a
    // burst verdict needs windowDays of observed history for the type;
    // after that, an EMPTY trailing week genuinely is a burst (n > 0
    // after silence), hence coalesce(trailing, 0) rather than a null gate
    val first = Window.partitionBy(col("event_type"))
    daily
      .withColumn("trailing_n", sum(col("n")).over(w))
      .withColumn("is_burst",
        col("day") - min(col("day")).over(first) >= windowDays &&
          col("n") * windowDays * multDen >
            lit(multNum) * coalesce(col("trailing_n"), lit(0L)))
  }

  /** Retention cohort analysis: users bucketed by first-seen day, activity
    * counted per (cohort_day, day_offset) — the classic retention triangle
    * (how many of day-d's new users were still active k days later), the
    * engagement analogue of the corpus-drift monitor. All integers: days
    * are epoch-day `div`s, the cohort is a per-user min, offsets are
    * differences. `n_users` counts DISTINCT active users per cell;
    * `n_events` the raw volume.
    *
    * Scale shape: one per-user min aggregate (users-sized) joined back on
    * the user key onto one (cohort, offset, user) distinct — two keyed
    * shuffles total; output is cohorts×offsets-sized. At 100 TB the
    * first-seen frame is the only state and it is user-cardinality
    * bounded.
    */
  def retentionCohorts(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val days = events.select(col(keyCol).as("u"),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("day", expr("__us div 86400000000L"))
      .select("u", "day")
    val firstSeen = days.groupBy("u").agg(min(col("day")).as("cohort_day"))
    days.join(firstSeen, Seq("u"))
      .withColumn("day_offset", col("day") - col("cohort_day"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("u")).as("n_users"), count(lit(1)).as("n_events"))
  }

  /** Half-life recency scoring in exact integer arithmetic — the
    * freshness-weighted engagement signal a curation/ranking pipeline
    * computes per user/host/source ("how active, discounted by age"),
    * with the usual exp(−λ·age) replaced by the power-of-two decay it
    * approximates: each event contributes
    *
    *   scale >> min(ageDays div halfLifeDays, 62)
    *
    * relative to the fixed `anchorUs` (events after the anchor clamp to
    * age 0; the shift cap keeps the result well-defined past 62
    * half-lives). Integer shifts + sums are associative-commutative, so
    * the score is bit-identical under any partitioning and engine — the
    * pageRankInt exactness rule; float exponentials could never sit in
    * the hash gate.
    *
    * Scale shape: one codegen projection (epoch diff, div, shift) + one
    * keyed aggregation — no window, no join, no driver state. The anchor
    * is a caller-supplied literal, NOT a computed max(ts) (that would add
    * a corpus scan + broadcast and make the score non-reproducible across
    * runs as data arrives).
    *
    * Output: key, n_events, score (Σ contributions), freshest_days
    * (min age).
    */
  def recencyScore(events: DataFrame, keyCol: String, tsCol: String,
      anchorUs: Long, halfLifeDays: Int, scale: Long = 1000000L): DataFrame = {
    require(halfLifeDays >= 1, "recencyScore: halfLifeDays must be >= 1")
    require(scale > 0, "recencyScore: scale must be positive")
    val ageDays = greatest(lit(0L),
      expr(s"(${anchorUs}L - unix_micros(${tsCol})) div 86400000000L"))
    events
      .select(col(keyCol), ageDays.as("age_days"))
      .withColumn("halvings",
        least(expr(s"age_days div ${halfLifeDays}L"), lit(62L)).cast("int"))
      .withColumn("contrib", expr(s"shiftright(${scale}L, halvings)"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("contrib")).as("score"),
        min(col("age_days")).as("freshest_days"))
  }
}
