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
}
