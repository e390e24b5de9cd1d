package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §2-C scale notes).
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting is the
  * complementary static technique for aggregate/join keys whose hot values
  * are known to dwarf a single task (e.g. an empty-string text hash, a null
  * bucket, a celebrity user_id at 100 TB).
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, saltFactor); the small side is replicated saltFactor× with every
    * salt value. The join key becomes (key, salt) so a hot key spreads over
    * saltFactor tasks. Row multiplicity is unchanged: each large-side row
    * matches exactly the one replica carrying its salt.
    *
    * The salt is `rand()`-based and nondeterministic by design — results
    * are identical regardless of salt placement; use only where the plan,
    * not the values, depends on the salt.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would emit one null-padded row PER SALT REPLICA for
    // unmatched small-side keys, inflating multiplicity saltFactor-fold
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val salted = large.withColumn("__salt", (rand() * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase salted aggregation for COUNT/SUM-shaped aggregates over a
    * skewed group key: pre-aggregate on (key, salt), then combine partials
    * on key — the hot key's rows never converge on one task until they are
    * already reduced to saltFactor partial rows.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int = 8): DataFrame = {
    val partial = df
      .withColumn("__salt", (rand() * saltFactor).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial.groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as(s"sum_$valueCol"))
  }
}
