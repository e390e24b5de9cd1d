package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SemDeDup on a crafted embedding set with known duplicate structure:
  * the within-cluster smaller-id rule, the MIN dup_of choice, and the
  * brute-force keep-set invariant must all hold exactly.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Two well-separated directions (+x-ish and +y-ish) with near-identical
  // copies inside each group; 64-dim to match the corpus shape.
  private def vec(dir0: Int, jitter: Float): Seq[Float] = {
    val v = Array.fill(64)(0.0f)
    v(dir0) = 1.0f
    v(63) = jitter
    v.toSeq
  }

  private def emb = {
    import spark.implicits._
    Seq(
      (10L, vec(0, 0.00f)), // group A canonical
      (11L, vec(0, 0.01f)), // ~identical to 10 -> dup_of 10
      (12L, vec(0, 0.02f)), // ~identical to 10/11 -> dup_of 10 (MIN)
      (20L, vec(1, 0.00f)), // group B canonical
      (21L, vec(1, 0.01f)), // dup_of 20
      (30L, vec(2, 0.00f))  // lone direction: same cluster as nobody close
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("near-identical vectors dedup to the smallest same-cluster id") {
    val m = IvfIndex.fit(emb, nlist = 3, iters = 2, maxSample = 100)
    val out = Dedup.semanticDedup(emb, m, threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))).toMap
    assert(out.size == 6)
    assert(out(10L) == (None, true))
    assert(out(11L) == (Some(10L), false))
    assert(out(12L) == (Some(10L), false)) // MIN of {10, 11}
    assert(out(20L) == (None, true))
    assert(out(21L) == (Some(20L), false))
    assert(out(30L) == (None, true))
  }

  test("keep-set invariant: no kept pair in the same cluster is >= threshold") {
    val m = IvfIndex.fit(emb, nlist = 2, iters = 2, maxSample = 100)
    val out = Dedup.semanticDedup(emb, m, threshold = 0.95)
    val kept = out.where(col("keep"))
      .select(col("vec_id"), col("cid")).as("k")
    val withEmb = kept.join(emb, Seq("vec_id"))
    val viol = withEmb.as("a").join(withEmb.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .where(graft.functions.cosine_sim(col("a.embedding"), col("b.embedding")) >= 0.95)
      .count()
    assert(viol == 0)
    // and every dropped vector points at a kept-or-smaller id that is
    // actually within the threshold in its own cluster
    val dropped = out.where(!col("keep")).collect()
    assert(dropped.forall(r => r.getLong(2) < r.getLong(0)))
  }

  test("candidate join carries ids only — embeddings rejoin by id") {
    val m = IvfIndex.fit(emb, nlist = 2, iters = 1, maxSample = 100)
    val plan = Dedup.semanticDedup(emb, m, threshold = 0.95)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
  }
}
