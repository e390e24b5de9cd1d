package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the operators whose round-1 plans
  * were flagged as scale hazards: correctness alone does not prove the plan
  * survives 100×, so the shape itself is pinned here.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q41 token rank is bounded: TakeOrderedAndProject, no global sort of all tokens") {
    // the full distinct-token table must reduce through per-partition
    // top-K + K-row merge (TakeOrderedAndProject); the rank window then
    // touches only the ≤ topK surviving rows
    val p = plan("q41_token_freq")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q33 simhash is a projection over the scan: no Generate, one exchange only for the final sort") {
    val p = plan("q33_simhash")
    assert(!p.contains("Generate"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("q37 candidate generation joins on (table, bucket) keys — no nested-loop pair space") {
    val p = plan("q37_embed_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q54 IVF assignment is shuffle-free: no crossJoin row inflation for the corpus scan") {
    val p = plan("q54_ivf_search")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q49 distinct counts plan without Expand: no row multiplication ahead of the shuffle") {
    // two DISTINCT columns in one Aggregate would Expand (4x the events
    // table through the exchange); the split-and-join form must not
    val p = plan("q49_approx_distinct")
    assert(!p.contains("Expand"), p)
  }
}
