package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Quantize.pqTopK: recall on a corpus with obvious per-subspace cluster
  * structure, partition independence (the batch-exact contract), the
  * dims-divisibility guard, and the one-exchange search plan.
  */
class PqAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 4 dims = 2 subspaces × 2: group A lives on axis 1 of subspace 0,
  // group B on axis 1 of subspace 1 — each subspace separates the groups
  // on its own, so any sane codebook reproduces the partition and ADC
  // ranks same-group rows first.
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.00f, 0.02f, 0.00f, 0.01f)), // seeds: one per group
      (2L, Seq(0.00f, 0.01f, 1.00f, 0.02f)),
      (3L, Seq(0.98f, 0.00f, 0.02f, 0.00f)),
      (4L, Seq(1.02f, 0.03f, 0.01f, 0.02f)),
      (5L, Seq(0.01f, 0.02f, 0.97f, 0.01f)),
      (6L, Seq(0.02f, 0.00f, 1.03f, 0.03f))
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("ADC top-k ranks same-group rows first; distances are exact nonneg longs") {
    val out = Quantize.pqTopK(corpus, corpus.where(col("vec_id") === 1L),
        m = 2, kCent = 2, iters = 2, topK = 3)
      .orderBy("rn").collect()
    assert(out.length == 3)
    assert(out.forall(_.getLong(0) == 1L))
    // the two same-group rows (3, 4) must precede any cross-group row
    val nids = out.map(_.getLong(1)).toSeq
    assert(Set(nids(0), nids(1)) == Set(3L, 4L), s"got $nids")
    assert(out.forall(_.getLong(2) >= 0L))
    // rows quantized into the same codebook cell as the query are at ADC
    // distance strictly below any cross-group row
    assert(out(0).getLong(2) < out(2).getLong(2))
  }

  test("partition independence: repartition(7) returns the identical frame") {
    val a = Quantize.pqTopK(corpus, corpus.where(col("vec_id") % 2 === 1L),
      m = 2, kCent = 2, iters = 2, topK = 2).orderBy("qid", "rn").collect()
    val b = Quantize.pqTopK(corpus.repartition(7),
      corpus.where(col("vec_id") % 2 === 1L),
      m = 2, kCent = 2, iters = 2, topK = 2).orderBy("qid", "rn").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("dims not divisible by m is rejected") {
    val e = intercept[IllegalArgumentException] {
      Quantize.pqTopK(corpus, corpus.limit(1), m = 3, kCent = 2,
        iters = 1, topK = 1)
    }
    assert(e.getMessage.contains("not divisible"))
  }

  test("search plan: one exchange (the per-query window), no shuffle on the encode scan") {
    val df = Quantize.pqTopK(corpus, corpus.where(col("vec_id") === 1L),
      m = 2, kCent = 2, iters = 2, topK = 3)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the broadcast of the query tables must not become a shuffled join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly the window exchange, got $exchanges:\n$p")
  }

  // ---- IVFADC (Quantize.ivfAdcTopK) ----

  test("ivfadc nprobe=1 on separated groups returns only same-list neighbors") {
    // the two groups separate at the coarse stage (kCoarse = 2, seeds 1/2
    // are one per group), so probing one list must keep results in-group
    val out = Quantize.ivfAdcTopK(corpus, corpus.where(col("vec_id") === 1L),
        kCoarse = 2, nprobe = 1, m = 2, kCent = 2, iters = 2, topK = 5)
      .collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(1)).toSet.subsetOf(Set(3L, 4L)),
      s"cross-list neighbor leaked: ${out.map(_.getLong(1)).toSeq}")
  }

  test("ivfadc nprobe=kCoarse covers the whole corpus (the PQ-flat degeneration)") {
    val out = Quantize.ivfAdcTopK(corpus, corpus.where(col("vec_id") === 1L),
        kCoarse = 2, nprobe = 2, m = 2, kCent = 2, iters = 2, topK = 5)
      .orderBy("rn").collect()
    // all 5 non-self rows are reachable when every list is probed
    assert(out.length == 5)
    assert(out.map(_.getLong(1)).toSet == Set(2L, 3L, 4L, 5L, 6L))
    // same-group rows still rank first under residual ADC
    assert(Set(out(0).getLong(1), out(1).getLong(1)) == Set(3L, 4L))
  }

  test("ivfadc partition independence: repartition(7) returns the identical frame") {
    val q = corpus.where(col("vec_id") % 2 === 1L)
    val a = Quantize.ivfAdcTopK(corpus, q, kCoarse = 2, nprobe = 2,
      m = 2, kCent = 2, iters = 2, topK = 3).orderBy("qid", "rn").collect()
    val b = Quantize.ivfAdcTopK(corpus.repartition(7), q, kCoarse = 2,
      nprobe = 2, m = 2, kCent = 2, iters = 2, topK = 3)
      .orderBy("qid", "rn").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("ivfadc guards: nprobe must not exceed kCoarse") {
    val e = intercept[IllegalArgumentException] {
      Quantize.ivfAdcTopK(corpus, corpus.limit(1), kCoarse = 2, nprobe = 3,
        m = 2, kCent = 2, iters = 1, topK = 1)
    }
    assert(e.getMessage.contains("nprobe"))
  }
}
