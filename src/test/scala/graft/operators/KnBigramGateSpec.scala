package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TextAnalysis.knBigramGate: hand-computed Kneser–Ney rationals on a
  * literal corpus — the discounted bigram branch, the unseen-context
  * continuation backoff, the unseen-continuation zero, the no-bigram
  * vacuous pass, and the keep-rule boundary.
  */
class KnBigramGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // train model: bigrams (a,b)×2, (b,a)×1, (a,c)×1
  //   c12: ab=2 ba=1 ac=1; ctx: a(c1=3,n1fol=2) b(c1=1,n1fol=1)
  //   cont: a=1 b=1 c=1; N = 3 bigram types
  private def train = {
    import spark.implicits._
    Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
  }

  private def gate(docs: Seq[(Long, String)], threshDen: Long = 1000L) = {
    import spark.implicits._
    TextAnalysis.knBigramGate(docs.toDF("doc_id", "text"), train,
        "doc_id", "text", threshDen)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
  }

  test("seen bigram: P(b|a) = 21/36 — probable at 1/1000, improbable at a tight threshold") {
    // num = max(4·2−3,0)·3 + 3·2·1 = 21, den = 4·3·3 = 36
    val Seq((_, nBg, nUnseen, nImprob, ppm, keep)) = gate(Seq((10L, "a b"))).toSeq
    assert((nBg, nUnseen, nImprob, ppm, keep) == ((1L, 0L, 0L, 0L, true)))
    // threshDen = 1: improbable ⇔ num·1 < den ⇔ 21 < 36 — flips the flag
    val Seq((_, _, _, nImprob1, _, _)) = gate(Seq((10L, "a b")), threshDen = 1L).toSeq
    assert(nImprob1 == 1L)
  }

  test("unseen context backs off to the continuation estimate") {
    // (z, b): c1(z) = 0 → num = ncont(b) = 1, den = N = 3 → P = 1/3 ≥ 1/1000
    val Seq((_, nBg, nUnseen, nImprob, _, keep)) = gate(Seq((11L, "z b"))).toSeq
    assert((nBg, nUnseen, nImprob, keep) == ((1L, 1L, 0L, true)))
  }

  test("unseen continuation after a seen context is improbable (num = 0)") {
    // (a, z): c12 = 0 → max(−3,0)·N = 0; ncont(z) = 0 → num = 0 < den
    val Seq((_, nBg, nUnseen, nImprob, ppm, keep)) = gate(Seq((12L, "a z"))).toSeq
    assert((nBg, nUnseen, nImprob, ppm, keep) == ((1L, 0L, 1L, 1000000L, false)))
  }

  test("no-bigram docs pass vacuously; keep boundary is exactly 20%") {
    // "" and a 1-token doc have zero bigrams → keep
    val res = gate(Seq((13L, ""), (14L, "a"),
      // 5 bigrams, exactly 1 improbable (a z) → n_improb·5 = n_bigrams → keep
      (15L, "a b a b a z"),
      // 4 bigrams, 1 improbable → 5 > 4 → drop
      (16L, "a b a b z")))
    assert(res(0)._6 && res(1)._6)
    val d15 = res(2); val d16 = res(3)
    assert((d15._2, d15._4, d15._6) == ((5L, 1L, true)), s"$d15")
    assert((d16._2, d16._4, d16._6) == ((4L, 1L, false)), s"$d16")
  }

  test("partition independence: repartitioned docs give the identical frame") {
    import spark.implicits._
    val docs = Seq((20L, "a b"), (21L, "z b"), (22L, "a z"), (23L, "a b a c"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.knBigramGate(docs, train, "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = TextAnalysis.knBigramGate(docs.repartition(5), train.repartition(3),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("perplexityTertiles: buckets partition the corpus, labels fixed") {
    import spark.implicits._
    // 12 docs spanning fluent (train-identical) to improbable (OOV runs)
    val docs = ((1 to 4).map(i => (i.toLong, "a b a b")) ++
      (5 to 8).map(i => (i.toLong, "a b z" + ("z" * (i % 3)))) ++
      (9 to 12).map(i => (i.toLong, s"q$i r$i s$i t$i u$i"))).toDF("doc_id", "text")
    val r = TextAnalysis.perplexityTertiles(docs, train, "doc_id", "text")
      .orderBy("qbin").collect()
    assert(r.map(_.getLong(r(0).fieldIndex("n_docs"))).sum == 12L)
    val labels = r.map(x => x.getInt(0) -> x.getString(x.fieldIndex("bucket_label")))
    labels.foreach { case (qbin, lab) =>
      val want = if (qbin == 0) "head" else if (qbin == 1) "middle" else "tail"
      assert(lab == want, s"qbin=$qbin label=$lab")
    }
    // the head bucket is the fluent group: min_ppm of qbin 0 is the
    // corpus minimum and max_ppm of the last bucket the corpus maximum
    val minHead = r.head.getLong(r.head.fieldIndex("min_ppm"))
    val maxTail = r.last.getLong(r.last.fieldIndex("max_ppm"))
    assert(minHead == 0L, s"fluent docs have zero improb_ppm, got $minHead")
    assert(maxTail > minHead)
  }

  test("perplexityTertiles: equivalence with quantileBin over the gate") {
    import spark.implicits._
    val docs = ((1 to 3).map(i => (i.toLong, "a b a b")) ++
      (4 to 6).map(i => (i.toLong, s"x$i y$i"))).toDF("doc_id", "text")
    val gate = TextAnalysis.knBigramGate(docs, train, "doc_id", "text")
    val direct = HistogramQuantiles.quantileBin(gate, "improb_ppm", 64,
        Seq(1.0 / 3, 2.0 / 3))
      .groupBy("qbin").count().orderBy("qbin").collect()
      .map(x => (x.getInt(0), x.getLong(1)))
    val viaOp = TextAnalysis.perplexityTertiles(docs, train, "doc_id", "text")
      .orderBy("qbin").collect()
      .map(x => (x.getInt(0), x.getLong(x.fieldIndex("n_docs"))))
    assert(viaOp.toSeq == direct.toSeq)
  }
}
