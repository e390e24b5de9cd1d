package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** graft.expr.UnigramExpected + TextAnalysis.unigramLmSoftEm — Kudo 2018
  * §3.2's TRUE E-step (forward–backward expected counts, soft EM), the
  * marginal-count sibling of the Viterbi hard-EM rung (VERDICT r19 #2).
  * sf-scale behavior is oracle-checked via q231 (the DuckDB twin replays
  * the forward/backward folds and the quantized emission); these specs pin
  * the semantics on hand-built vocabs: exact hand-computed posteriors, the
  * hard-vs-soft divergence the E-step exists to fix, per-boundary mass
  * conservation under quantization, exact agreement with a plain-double
  * reference when no renormalization fires, and the deep-word boost path.
  */
class UnigramSoftEmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Direct kernel call; returns (piece, q) in emission order. */
  private def expected(w: String, vocab: Seq[(String, Double)],
      unk: Double = 1e-9): Seq[(String, Long)] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    vocab.foreach { case (p, v) => m.put(p, java.lang.Double.valueOf(v)) }
    val maxLen = vocab.map(v => v._1.codePointCount(0, v._1.length)).max
    val arr = graft.expr.Kernels.unigramExpected(
      UTF8String.fromString(w), m, unk, maxLen)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getLong(1))
    }
  }

  /** Plain-double reference (no renormalization — valid while no sum falls
    * below 2^-256): same fold orders, same association, same quantization.
    * When no boost fires the kernel's scalb(·, 0) is the identity, so the
    * two must agree BIT-FOR-BIT, not approximately. BMP-only inputs.
    */
  private def naive(w: String, vocab: Map[String, Double], unk: Double,
      maxLen: Int): Seq[(String, Long)] = {
    val n = w.length
    def sp(j: Int, i: Int): Double = vocab.getOrElse(w.substring(j, i),
      if (i - j == 1) unk else 0.0)
    val fa = new Array[Double](n + 1)
    fa(0) = 1.0
    for (i <- 1 to n) {
      var s = 0.0
      for (j <- math.max(0, i - maxLen) until i) {
        val p = sp(j, i); if (p > 0) s += fa(j) * p
      }
      fa(i) = s
    }
    val ba = new Array[Double](n + 1)
    ba(n) = 1.0
    for (j <- (n - 1) to 0 by -1) {
      var s = 0.0
      for (i <- (j + 1) to math.min(n, j + maxLen)) {
        val p = sp(j, i); if (p > 0) s += p * ba(i)
      }
      ba(j) = s
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i) {
      val p = sp(j, i)
      if (p > 0) {
        val q = math.floor((((fa(j) * p) * ba(i)) / fa(n)) * 16777216.0).toLong
        if (q > 0) out += ((w.substring(j, i), q))
      }
    }
    out.toSeq
  }

  // all probabilities powers of two: every forward/backward sum is exact in
  // binary, so the hand-derived rationals below are the true posteriors
  private val tieVocab = Seq("a" -> 0.25, "b" -> 0.25, "ab" -> 0.25, "ba" -> 0.25)

  test("hand-checked posteriors on 'aba': ab and ba each 4/9, chars 5/9, b 1/9") {
    // segmentations: a|b|a (2^-6), ab|a (2^-4), a|ba (2^-4); Z = 9·2^-6.
    // All arithmetic exact except the final division (correctly rounded),
    // so q = floor(double(k/9)·2^24) — none near an integer boundary.
    val qs = expected("aba", tieVocab).toMap
    assert(qs("ab") == math.floor(4.0 / 9.0 * 16777216.0).toLong) // 7456540
    assert(qs("ba") == math.floor(4.0 / 9.0 * 16777216.0).toLong)
    assert(qs("b") == math.floor(1.0 / 9.0 * 16777216.0).toLong) // 1864135
    // 'a' occurs as TWO spans (0,1) and (2,3), each with posterior 5/9 —
    // the emission is per-occurrence, so both rows carry q(5/9)
    val aRows = expected("aba", tieVocab).filter(_._1 == "a").map(_._2)
    assert(aRows == Seq.fill(2)(math.floor(5.0 / 9.0 * 16777216.0).toLong))
  }

  test("per-boundary mass conservation under quantization (aba)") {
    // every segmentation crosses each inter-codepoint boundary exactly
    // once, so posteriors of the spans covering a boundary sum to 1;
    // quantization can lose at most one unit per span
    val rows = expected("aba", tieVocab)
    // boundary 0|1: spans (0,1)=a#first and (0,2)=ab
    val b01 = rows.head._2 + rows.toMap.apply("ab")
    assert(b01 == 16777215L, s"= 2^24 - 1 (one floor each), got $b01")
    // boundary 1|2: spans (0,2)=ab, (1,2)=b, (1,3)=ba
    val b12 = rows.toMap.apply("ab") + rows.toMap.apply("b") + rows.toMap.apply("ba")
    assert(b12 == 16777215L, b12.toString)
  }

  test("soft vs hard divergence: the Viterbi path misses a near-tied piece") {
    // 'aba' under tieVocab: Viterbi ties ab|a vs a|ba at 2^-4 and the
    // ascending-j rule picks a|ba — hard counts give ab ZERO usage (it
    // would be pruned), while the lattice posterior of ab is 4/9
    val hard = expected("aba", tieVocab) // soft: ab present
    val viterbi = Seq(Tuple1("aba")).toDF("t")
      .select(graft.functions.unigram_segment(col("t"),
        tieVocab.map(_._1), tieVocab.map(_._2), 1e-9).as("p"))
      .collect()(0).getSeq[String](0)
    assert(viterbi == Seq("a", "ba"), viterbi.toString)
    assert(hard.toMap.apply("ab") > 0L,
      "soft EM must assign ab its lattice mass even though Viterbi never uses it")
  }

  test("unique segmentation: every span gets exactly 2^24 (unk included, surrogate-safe)") {
    // only single-char pieces exist, so the lattice has one path and every
    // posterior is exactly 1.0 (single-term folds and the division cancel
    // bit-for-bit); the emoji is ONE unk codepoint, not two halves
    val rows = expected("a😀a", Seq("a" -> 0.5), unk = 0.001)
    assert(rows == Seq("a" -> 16777216L, "😀" -> 16777216L, "a" -> 16777216L))
  }

  test("bit-exact agreement with the plain-double reference (no-renorm regime)") {
    val vocab = Map("a" -> 0.25, "b" -> 0.25, "ab" -> 0.125, "ba" -> 0.125,
      "aa" -> 0.0625, "bb" -> 0.03125, "abab" -> 0.015625)
    val unk = math.pow(2.0, -20)
    val rnd = new scala.util.Random(20)
    (1 to 200).foreach { _ =>
      val w = Seq.fill(1 + rnd.nextInt(12))(
        "abc".charAt(rnd.nextInt(3))).mkString // 'c' exercises the unk rung
      val k = expected(w, vocab.toSeq, unk)
      val n = naive(w, vocab, unk, 4)
      assert(k == n, s"word=$w kernel=$k naive=$n")
    }
  }

  test("deep word: boosted lattice sums stay finite, deterministic, and bounded") {
    // 300 chars: the plain forward product underflows after ~100 chars
    // (1e-3 per step); the boost representation must carry the mass
    val w = "a" * 300
    val vocab = Seq("a" -> 1e-3, "aa" -> 1e-7)
    val r1 = expected(w, vocab)
    val r2 = expected(w, vocab)
    assert(r1 == r2, "bit-determinism across runs")
    assert(r1.nonEmpty)
    // posteriors are probabilities: q ≤ 2^24 (+0 — eq ≤ 1 up to ulps that
    // cannot cross the floor boundary from exactly-representable sums here)
    assert(r1.forall(_._2 <= 16777216L), r1.filter(_._2 > 16777216L).toString)
    // the aa-alternative is NOT negligible: p(aa)/p(a)^2 = 0.1 per 2-char
    // block, so the lattice keeps ~15% alternative mass at every interior
    // position (posterior ≈ 0.845 — the interior stabilizes at q=14179335,
    // symmetric toward both edges). Soft EM reporting that mass while
    // Viterbi reports only the winning tiling is exactly the point.
    val aQs = r1.filter(_._1 == "a").map(_._2)
    assert(aQs.size == 300 && aQs.forall(q => q >= 8388608L && q <= 16777216L),
      aQs.distinct.toString)
    assert(aQs == aQs.reverse, "boundary-symmetric lattice => symmetric posteriors")
    assert(r1.exists { case (p, q) => p == "aa" && q > 0L },
      "the alternative tiling's mass must surface")
  }

  test("whitespace words are independent lattices; empty and null pass through") {
    val rows = expected("aba aba", tieVocab)
    assert(rows.size == 10 && rows.take(5) == rows.drop(5),
      "two identical words emit identical blocks")
    assert(expected("", tieVocab).isEmpty)
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(graft.functions.unigram_expected(col("t"),
        Seq("a"), Seq(0.5), 1e-9).as("p")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("unigramLmSoftEm: soft keeps what hard would prune; p2 re-estimates from soft mass") {
    // corpus 'aba': seed = chars {a:2, b:1} + multi {ab:1, ba:1} (+aba is
    // len-3 > maxPieceLen 2), total 5 → probs a=.4 b=.2 ab=.2 ba=.2.
    // Viterbi picks a|ba (commutative-multiply tie, ascending-j), so
    // usage_hard(ab) = 0 — hard EM would prune ab; the lattice posterior
    // of ab is positive, so soft EM keeps it.
    val out = TextAnalysis.unigramLmSoftEm(
        Seq((1L, "aba")).toDF("doc_id", "text"), "text",
        maxPieceLen = 2, topV = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    val ab = out("ab")
    assert(ab.getLong(ab.fieldIndex("usage_hard")) == 0L)
    assert(ab.getLong(ab.fieldIndex("usage_soft_q")) > 0L)
    assert(!ab.getBoolean(ab.fieldIndex("pruned")),
      "soft EM must keep the near-tied piece hard EM starves")
    assert(!ab.isNullAt(ab.fieldIndex("p2")))
    val ba = out("ba")
    assert(ba.getLong(ba.fieldIndex("usage_hard")) == 1L)
    assert(ba.getLong(ba.fieldIndex("usage_soft_q")) > 0L)
    // characters always survive with the 2^24 backbone smoothing
    Seq("a", "b").foreach { c =>
      assert(!out(c).getBoolean(out(c).fieldIndex("pruned")))
      assert(!out(c).isNullAt(out(c).fieldIndex("p2")))
    }
    // p2 is a probability distribution over the kept vocabulary
    val p2s = out.values.filter(r => !r.isNullAt(r.fieldIndex("p2")))
      .map(r => r.getDouble(r.fieldIndex("p2")))
    assert(math.abs(p2s.sum - 1.0) < 1e-9, p2s.sum.toString)
  }

  test("unigramLmTrainSoft vs unigramLmTrain: the loops ship DIFFERENT final vocabularies (VERDICT r19 #2, loop level)") {
    // corpus 'aba', seed multis {ab, ba}, schedule [2] (seedV 3 → targetV
    // 2 at frac 0.4): the Viterbi tie ab|a vs a|ba breaks to a|ba
    // (commutative-multiply tie, ascending j), so HARD usage of ab is 0
    // and the u > 0 prune kills it EVEN THOUGH the schedule has room for
    // two pieces. Its lattice posterior is 5/12 — soft EM keeps it. This
    // is Kudo §3.2's motivation compounded through the loop.
    val docs = Seq((1L, "aba")).toDF("doc_id", "text")
    val hard = TextAnalysis.unigramLmTrain(docs, "text",
        maxPieceLen = 2, seedV = 3, targetV = 2, pruneFrac = 0.4)
      .collect().map(r => r.getString(0) -> r).toMap
    val soft = TextAnalysis.unigramLmTrainSoft(docs, "text",
        maxPieceLen = 2, seedV = 3, targetV = 2, pruneFrac = 0.4)
      .collect().map(r => r.getString(0) -> r).toMap
    val hAb = hard("ab")
    assert(hAb.getInt(hAb.fieldIndex("rounds_survived")) == 0)
    assert(hAb.isNullAt(hAb.fieldIndex("final_p")),
      "hard EM prunes the Viterbi-invisible piece")
    val sAb = soft("ab")
    assert(sAb.getInt(sAb.fieldIndex("rounds_survived")) == 1)
    assert(!sAb.isNullAt(sAb.fieldIndex("final_p")),
      "soft EM keeps the piece via its lattice mass")
    assert(sAb.getLong(sAb.fieldIndex("final_usage_q")) > 0L)
    // both loops keep ba (Viterbi winner AND positive mass)
    assert(!hard("ba").isNullAt(hard("ba").fieldIndex("final_p")))
    assert(!soft("ba").isNullAt(soft("ba").fieldIndex("final_p")))
    // the soft final model is a probability distribution
    val p2s = soft.values.filter(r => !r.isNullAt(r.fieldIndex("final_p")))
      .map(r => r.getDouble(r.fieldIndex("final_p")))
    assert(math.abs(p2s.sum - 1.0) < 1e-9, p2s.sum.toString)
  }

  test("expected-count plan: zero-shuffle codegen projection") {
    val words = Seq(Tuple1("abcab")).toDF("word")
    val plan = words.select(graft.functions.unigram_expected(col("word"),
        tieVocab.map(_._1), tieVocab.map(_._2), 1e-9))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("unigram_expected"), plan)
  }
}
