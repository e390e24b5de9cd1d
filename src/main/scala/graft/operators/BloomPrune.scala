package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning (SURVEY.md §2-C scale notes).
  *
  * The 100 TB pattern: when a big fact table is semi-joined against a
  * selective dimension subset, ship a bloom filter of the dimension keys to
  * every scan task and drop non-matching fact rows BEFORE the shuffle (or
  * before feeding the broadcast join), so the exchange carries only rows
  * that can possibly match. Spark's own runtime row-group filtering
  * (InjectRuntimeFilter) does this opportunistically; this operator makes
  * the technique explicit and composable, mirroring what the reference
  * inherits from Hive's `hive.optimize.semijoin` bloom pushdown.
  *
  * Exactness: the bloom pass only ever removes rows whose key is provably
  * absent (no false negatives), and every surviving row still goes through
  * a real semi join — so the result is bit-identical to the plain semi
  * join; false positives cost only wasted shuffle bytes, never wrong rows.
  */
object BloomPrune {

  /** Exact semi join of `large` against `small`, pre-pruned by a broadcast
    * bloom filter over `small`'s long-typed key.
    *
    * The filter is built with one driver-side aggregate over the SMALL side
    * only (same cardinality bound as deciding to broadcast it), then rides
    * the closure to every executor: memory per task is `fpp`-controlled
    * bits, independent of the large side's size.
    */
  def prunedSemiJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      fpp: Double = 0.01): DataFrame = {
    val spark = large.sparkSession
    // Checkpoint the key column once: the count, the bloom aggregation, and
    // the broadcast-semi-join below are three separate consumers, and each
    // would otherwise re-execute whatever plan produced `small` (the q67
    // lesson: a frame read by N actions without staging costs N producer
    // runs). The checkpoint is keys-only, so it is small by construction.
    val keys = small.select(col(smallKey)).localCheckpoint()
    // expectedItems from a cheap exact count of the small side; stat
    // .bloomFilter aggregates distributed, only the bitset reaches the
    // driver
    val n = math.max(1L, keys.count())
    val bf: BloomFilter = keys.stat.bloomFilter(smallKey, n, fpp)
    val bcast = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k))
    large
      .where(mightContain(col(largeKey)))
      .join(broadcast(keys.distinct()),
        col(largeKey) === col(smallKey), "left_semi")
  }
}
