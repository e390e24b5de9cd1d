package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering keys.
  *
  * At 100 TB the scan is the query: parquet row-group min/max stats prune
  * what predicates never touch, but a sort on one column only prunes that
  * column's predicates. Interleaving the bits of k quantized columns gives
  * every column locality in the SAME 1-D sort order, so range-partitioning
  * and sorting by the Z-key makes row-group stats selective for ALL k
  * dimensions at once — the Delta Lake / Databricks `ZORDER BY` idea,
  * built from plain Catalyst bit arithmetic.
  *
  * Determinism (the DuckDB oracle replays every bit): quantization is
  * `floor((v - min) / (max - min) * (2^bits - 1))` — IEEE double subtract/
  * divide/multiply are exactly rounded, so both engines compute identical
  * bits from identical inputs; the interleave is pure integer shifts.
  *
  * Scale shape: the min/max stats are ONE scalar aggregate broadcast back
  * via a literal-free crossJoin (no driver round-trip in the plan — the
  * 1-row side broadcasts); the key itself is a per-row codegen projection,
  * and `zorderBy` finishes with a range repartition + within-partition
  * sort by the key — the exact write layout a parquet sink wants.
  */
object Layout {

  /** Bit-interleaved Morton key over already-quantized non-negative int
    * columns (each in [0, 2^bits)): bit b of column i lands at position
    * b * ncols + i. With k·bits ≤ 63 the key fits a BIGINT.
    */
  def mortonKey(quantized: Seq[Column], bits: Int): Column = {
    val n = quantized.size
    require(n >= 1, "mortonKey needs at least one column")
    require(n * bits <= 63, s"$n cols x $bits bits exceeds a signed 64-bit key")
    val terms = for {
      (q, i) <- quantized.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ + _)
  }

  /** Quantize `v` into [0, 2^bits) given column min/max (max==min → 0). */
  def quantize(v: Column, vmin: Column, vmax: Column, bits: Int): Column = {
    val maxq = (1L << bits) - 1
    when(vmax <= vmin, lit(0L)).otherwise(
      floor((v.cast("double") - vmin.cast("double"))
        / (vmax.cast("double") - vmin.cast("double")) * lit(maxq.toDouble))
        .cast("long"))
  }

  /** Append a `zkey` Morton key over `cols` (numeric), quantized against
    * the columns' global min/max.
    */
  def withZorderKey(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val qs = cols.map(c =>
      quantize(col(c), col(s"__min_$c"), col(s"__max_$c"), bits))
    joined.withColumn("zkey", mortonKey(qs, bits))
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Z-order the frame for writing: key, range-repartition, sort within
    * partitions — every output file covers a tight hyper-rectangle of the
    * `cols` space, so parquet min/max stats prune multi-dimensionally.
    */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 16,
      numPartitions: Int = 0): DataFrame = {
    val keyed = withZorderKey(df, cols, bits)
    val parts = if (numPartitions > 0) numPartitions
      else keyed.sparkSession.sessionState.conf.numShufflePartitions
    keyed.repartitionByRange(parts, col("zkey"))
      .sortWithinPartitions("zkey")
  }
}
