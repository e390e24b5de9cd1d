package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val large = spark.range(0, 50000)
    .select($"id".as("fk"), ($"id" % 97).as("payload"))
  private lazy val small = spark.range(0, 50000)
    .where($"id" % 211 === 0).select($"id".as("k"))

  test("prunedSemiJoin equals plain semi join exactly") {
    val plain = large.join(small, $"fk" === $"k", "left_semi")
      .orderBy("fk").as[(Long, Long)].collect().toSeq
    val pruned = BloomPrune.prunedSemiJoin(large, small, "fk", "k")
      .orderBy("fk").as[(Long, Long)].collect().toSeq
    assert(pruned == plain)
    assert(pruned.nonEmpty)
  }

  test("null keys on the large side never match") {
    val withNulls = large.select(
      when($"fk" % 5 === 0, lit(null).cast("long")).otherwise($"fk").as("fk"),
      $"payload")
    val plain = withNulls.join(small, $"fk" === $"k", "left_semi").count()
    val pruned = BloomPrune.prunedSemiJoin(withNulls, small, "fk", "k").count()
    assert(pruned == plain)
  }

  test("bloom prune keeps the large side shuffle-free: scan -> filter -> broadcast semi join") {
    val plan = BloomPrune.prunedSemiJoin(large, small, "fk", "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast semi join in:\n$plan")
    // the only exchange feeding the join must be the broadcast of the SMALL
    // side — no shuffle exchange anywhere in the pruned-join subtree
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"large side should not shuffle:\n$plan")
  }
}
