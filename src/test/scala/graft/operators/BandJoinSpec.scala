package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BandJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val points = spark.range(0, 2000)
    .select(($"id" * 37 % 1000).cast("double").as("v"), $"id".as("pid"))
  // overlapping intervals of assorted widths, incl. wider than the band
  private lazy val intervals = spark.range(0, 80).select(
    ($"id" * 13 % 900).cast("double").as("lo"),
    ($"id" * 13 % 900 + ($"id" % 5) * 40 + 10).cast("double").as("hi"),
    $"id".as("iid"))

  test("bandJoin equals the nested-loop BETWEEN join exactly (any widths)") {
    val plain = points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").orderBy("pid", "iid")
      .as[(Long, Long)].collect().toSeq
    val banded = Temporal.bandJoin(points, intervals, "v", "lo", "hi", band = 50.0)
      .select("pid", "iid").orderBy("pid", "iid")
      .as[(Long, Long)].collect().toSeq
    assert(banded == plain)
    assert(banded.nonEmpty)
  }

  test("bandJoin plan is an equi-join on the bucket, not a nested loop") {
    val plan = Temporal.bandJoin(points, intervals, "v", "lo", "hi", 50.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected bucket equi-join:\n$plan")
  }
}
