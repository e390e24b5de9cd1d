package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Odds and ends of the §2-B surface whose values are engine-specific and
  * therefore live outside the DuckDB oracle gate.
  */
class MiscSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = queries.Tables.t(spark, "/root/testdata/sf0.001", "events")

  test("approx_count_distinct (HLL) is within 5% of exact") {
    val r = events.agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id").as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("q49 per-group HLL (incl. rsd=0.02 sketch) lands inside its error budget") {
    val rows = SparkEntry.queries("q49_approx_distinct")(spark, "/root/testdata/sf0.001")
      .collect()
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("u"), countDistinct($"props").as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      assert((r.getLong(1), r.getLong(2)) == exact(et), s"$et exact counts diverge")
      assert(r.getBoolean(3), s"$et HLL(users, rsd=0.05) outside 15% budget")
      assert(r.getBoolean(4), s"$et HLL(props, rsd=0.02) outside 6% budget")
    }
  }

  test("broadcast hint forces BroadcastHashJoin; without it small-table join still resolves") {
    val nation = queries.Tables.t(spark, "/root/testdata/sf0.001", "nation")
    val customer = queries.Tables.t(spark, "/root/testdata/sf0.001", "customer")
    val j = customer.join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(j.count() == customer.count())
  }

  test("join strategy hints: shuffle_hash and merge are honored") {
    val o = queries.Tables.t(spark, "/root/testdata/sf0.001", "orders")
    val c = queries.Tables.t(spark, "/root/testdata/sf0.001", "customer")
    val sh = o.join(c.hint("shuffle_hash"), $"o_custkey" === $"c_custkey")
    assert(sh.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"))
    val sm = o.join(c.hint("merge"), $"o_custkey" === $"c_custkey")
    assert(sm.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
  }

  test("per-query plans: agg pushes partial aggregation below the exchange") {
    val plan = SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // partial_sum before Exchange = map-side combine is in place
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"), plan)
    assert(plan.contains("Exchange"))
  }

  test("repartition/bucketed co-location shape: repartition by key removes extra exchange") {
    val li = queries.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      .repartition(4, $"l_orderkey")
    val agg = li.groupBy($"l_orderkey").agg(sum($"l_quantity"))
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(agg.queryExecution.executedPlan.toString).size
    // the groupBy reuses the repartition's hash distribution: exactly one
    // exchange (the explicit repartition), none injected for the aggregate
    assert(exchanges == 1, agg.queryExecution.executedPlan.toString)
  }
}
