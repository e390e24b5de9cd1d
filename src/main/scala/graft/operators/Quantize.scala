package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the memory-side
  * enabler for similarity search at corpus scale: a 64-dim float32 vector
  * (256 B) becomes 64 int8 codes + one scale (~68 B), a ~3.7× reduction
  * that lets executors hold the code table for billions of vectors while
  * full-precision vectors stay in parquet for re-ranking (the standard
  * IVF-PQ-style two-tier layout, here with the simplest codebook).
  *
  * Symmetric per-vector scaling: scale = max|x|/127, code = ⌊x/scale + ½⌋.
  * Zero maps to zero, codes never exceed ±127 by construction, and every
  * step (divide, floor, multiply, left-to-right error sum) is a single
  * IEEE-754 operation — so scale and reconstruction error are
  * bit-reproducible cross-engine (the oracle-determinism rules in
  * Relational.scala). A pure per-row projection: no shuffle, no state.
  */
object Quantize {

  /** (idCol, scale, codes array<long in [-127,127]>, max_abs_code,
    * recon_err = Σ|x − code·scale| folded left-to-right). All-zero vectors
    * get scale 0, zero codes, zero error.
    */
  def int8(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    // `scale` is projected as an attribute BEFORE the per-element lambdas
    // reference it — nested, the array_max would re-evaluate per element
    // (the higher-order-lambda trap, PLANS.md)
    df.select(col(idCol), transform(col(embCol), x => x.cast("double")).as("e"))
      .select(col(idCol), col("e"),
        (array_max(transform(col("e"), x => abs(x))) / 127).as("scale"))
      .select(
        col(idCol),
        col("scale"),
        when(col("scale") === 0d, transform(col("e"), _ => lit(0L)))
          .otherwise(transform(col("e"),
            x => floor(x / col("scale") + 0.5).cast("long")))
          .as("codes"),
        when(col("scale") === 0d, lit(0L))
          .otherwise(array_max(transform(col("e"),
            x => abs(floor(x / col("scale") + 0.5)).cast("long"))))
          .as("max_abs_code"),
        when(col("scale") === 0d, lit(0d))
          .otherwise(aggregate(col("e"), lit(0d),
            (acc, x) => acc + abs(x - floor(x / col("scale") + 0.5) * col("scale"))))
          .as("recon_err"))
  }
}
