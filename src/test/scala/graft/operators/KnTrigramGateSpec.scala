package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TextAnalysis.knTrigramGate: hand-computed nested Kneser–Ney rationals
  * on a literal corpus — the discounted trigram branch, the two backoff
  * rungs (unseen (w1,w2) context → middle model; unseen w2 middle → pure
  * continuation), the unseen-continuation zero, and the vacuous pass.
  * sf-scale behavior is oracle-checked via q224.
  */
class KnTrigramGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // train trigrams: abc×2, bca×1, cab×1, abd×1
  //   ctx12: (a,b) c12=3 nfol12=2; (b,c) 1,1; (c,a) 1,1
  //   n23: (b,c)=1 (c,a)=1 (a,b)=1 (b,d)=1
  //   mid2: b (nmid2=2, nfol2=2); c (1,1); a (1,1)
  //   cont3: a=b=c=d=1; N = 4
  private def train = {
    import spark.implicits._
    Seq((1L, "a b c a b c"), (2L, "a b d")).toDF("doc_id", "text")
  }

  private def gate(docs: Seq[(Long, String)], threshDen: Long = 1000L) = {
    import spark.implicits._
    TextAnalysis.knTrigramGate(docs.toDF("doc_id", "text"), train,
        "doc_id", "text", threshDen)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
  }

  test("seen trigram: P(c|a b) = 220/384 — probable at 1/1000, flips at threshDen 1") {
    // p2num = max(4·1−3,0)·4 + 3·2·1 = 10, p2den = 4·2·4 = 32
    // num = max(4·2−3,0)·32 + 3·2·10 = 220, den = 4·3·32 = 384
    val Seq((_, nTg, nUnseen, nImprob, ppm, keep)) = gate(Seq((10L, "a b c"))).toSeq
    assert((nTg, nUnseen, nImprob, ppm, keep) == ((1L, 0L, 0L, 0L, true)))
    val Seq((_, _, _, nImprob1, _, _)) = gate(Seq((10L, "a b c")), threshDen = 1L).toSeq
    assert(nImprob1 == 1L, "220 < 384 must flip at the tight threshold")
  }

  test("unseen (w1,w2) context backs off to the middle continuation model") {
    // (z,b,c): c12 = 0 → P2(c|b) = 10/32 ≥ 1/1000
    val Seq((_, nTg, nUnseen, nImprob, _, keep)) = gate(Seq((11L, "z b c"))).toSeq
    assert((nTg, nUnseen, nImprob, keep) == ((1L, 1L, 0L, true)))
  }

  test("unseen middle word backs off to the pure continuation estimate") {
    // (z,q,c): c12 = 0 AND nmid2(q) = 0 → Pc(c) = 1/4 ≥ 1/1000
    val Seq((_, nTg, nUnseen, nImprob, _, keep)) = gate(Seq((12L, "z q c"))).toSeq
    assert((nTg, nUnseen, nImprob, keep) == ((1L, 1L, 0L, true)))
  }

  test("unseen continuation after a seen context is improbable (num = 0)") {
    // (a,b,z): c12 = 3 but n23(b,z) = ncont3(z) = 0 → num = 0 < den
    val Seq((_, nTg, nUnseen, nImprob, ppm, keep)) = gate(Seq((13L, "a b z"))).toSeq
    assert((nTg, nUnseen, nImprob, ppm, keep) == ((1L, 0L, 1L, 1000000L, false)))
  }

  test("docs under three tokens pass vacuously") {
    val res = gate(Seq((14L, ""), (15L, "a"), (16L, "a b")))
    res.foreach { case (_, nTg, _, _, _, keep) =>
      assert(nTg == 0L && keep)
    }
  }

  test("partition independence: repartitioned inputs give the identical frame") {
    import spark.implicits._
    val docs = Seq((20L, "a b c"), (21L, "z b c"), (22L, "a b z"),
      (23L, "a b c a b d")).toDF("doc_id", "text")
    val a = TextAnalysis.knTrigramGate(docs, train, "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = TextAnalysis.knTrigramGate(docs.repartition(5), train.repartition(3),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }
}
