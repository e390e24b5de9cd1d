package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** graft.expr.UnigramSegment + TextAnalysis.unigramLmVocab — the
  * SentencePiece unigram-LM rung (Kudo 2018). sf-scale behavior is
  * oracle-checked via q218 (the DuckDB twin replays the Viterbi DP with a
  * recursive CTE); these specs pin the DP semantics on hand-built vocabs:
  * the max-product path, the ascending-j tie rule, the unknown-codepoint
  * fallback, and the induction loop's usage/prune signal.
  */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seg(text: String, vocab: Seq[(String, Double)],
      unk: Double = 1e-9): Seq[String] = {
    val df = Seq(Tuple1(text)).toDF("t")
    df.select(graft.functions.unigram_segment(col("t"),
        vocab.map(_._1), vocab.map(_._2), unk).as("p"))
      .collect()(0).getSeq[String](0)
  }

  private val toyVocab = Seq(
    "a" -> 0.2, "b" -> 0.2, "c" -> 0.1, "ab" -> 0.3, "abc" -> 0.2)

  test("max-product path: 'abcab' -> [abc, ab] (hand-checked DP)") {
    // dp: abc (0.2) then ab (0.3) = 0.06 beats ab|c|ab (0.3*0.1*0.3=0.009)
    // and all char paths
    assert(seg("abcab", toyVocab) == Seq("abc", "ab"))
    assert(seg("abc", toyVocab) == Seq("abc"))
    assert(seg("ba", toyVocab) == Seq("b", "a"))
  }

  test("exact score tie keeps the smallest j (longest final piece)") {
    // p(aa) = 0.0625 = p(a)^2 exactly (both powers of two): path 'aa'
    // ties path 'a|a' bit-for-bit, so the ascending-j strict-> rule must
    // pick j=0, the single piece
    assert(seg("aa", Seq("a" -> 0.25, "aa" -> 0.0625)) == Seq("aa"))
  }

  test("unknown single codepoint falls back; unknown pairs never merge") {
    assert(seg("axa", Seq("a" -> 0.5)) == Seq("a", "x", "a"))
    // unknown fallback is per-codepoint: a surrogate-pair emoji is ONE
    // piece, not two broken halves
    assert(seg("a😀a", Seq("a" -> 0.5)) == Seq("a", "😀", "a"))
  }

  test("long-word underflow: boosted DP keeps the max-product path (ADVICE r18)") {
    // 400 'a's with p(a)=1e-3, p(aa)=1e-7: the true max-product path is
    // all singles ((1e-3)^400 = 1e-1200 beats the aa-tiling's 1e-1400),
    // but the PLAIN linear dp underflows to 0.0 after ~103 chars, every
    // candidate then ties at 0, and first-j-wins degenerates to greedy
    // longest-piece — emitting "aa" pairs. The power-of-two boost
    // representation keeps the comparison exact at any length.
    val word = "a" * 400
    assert(seg(word, Seq("a" -> 1e-3, "aa" -> 1e-7)) == Seq.fill(400)("a"))
    // and the opposite preference still holds on the same shape: when the
    // pair really is better, the boosted DP picks it at depth too
    assert(seg(word, Seq("a" -> 1e-4, "aa" -> 1e-3)) == Seq.fill(200)("aa"))
  }

  test("whitespace words segment independently; empty -> []") {
    assert(seg("ab ab", toyVocab) == Seq("ab", "ab"))
    assert(seg("", toyVocab) == Seq.empty)
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(graft.functions.unigram_segment(col("t"),
        Seq("a"), Seq(0.5), 1e-9).as("p")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("alphabet beyond 65536 codepoints: capped seed, tail via unk (ADVICE r18)") {
    // 70k distinct codepoints exceed the UnigramSegment plan-embed bound;
    // before the cap this threw at plan build. Now the seed keeps the
    // top-(65536 − topV) codepoints by frequency and the tail rides the
    // decoder's unk fallback. 'a' repeats, so it must survive the cut.
    val cps = ((0x1000 to 0xD7FF) ++ (0x10000 until 0x15000)).take(70000)
    assert(cps.size == 70000)
    val text = ("a a a " + cps.map(cp => new String(Character.toChars(cp))).mkString(" "))
    val out = TextAnalysis.unigramLmVocab(Seq(Tuple1(text)).toDF("text"), "text",
      maxPieceLen = 4, topV = 48)
    val rows = out.collect()
    assert(rows.length <= 65536, s"vocab must respect the plan-embed bound, got ${rows.length}")
    assert(rows.exists(r => r.getString(0) == "a" && r.getLong(1) == 3L),
      "the high-frequency codepoint must survive the cap")
  }

  test("unigramPruneSchedule: geometric keep counts down to the target") {
    assert(TextAnalysis.unigramPruneSchedule(96, 24, 0.5) == Seq(48, 24))
    assert(TextAnalysis.unigramPruneSchedule(100, 10, 0.3) ==
      Seq(70, 49, 35, 25, 18, 13, 10))
    intercept[IllegalArgumentException] {
      TextAnalysis.unigramPruneSchedule(10, 10, 0.5)
    }
    // ceil fixed point (round-19 review finding): for v < 1/frac the bare
    // ceil(v·(1−f)) equals v, so without the strict-decrease clamp this
    // call never terminated; the schedule must still end at the target
    val s = TextAnalysis.unigramPruneSchedule(200, 50, 0.01)
    assert(s.last == 50 && s.zip(s.tail).forall { case (a, b) => a > b },
      s"schedule must strictly decrease to the target: $s")
    // tiny fractions degrade to linear single-step pruning, not a hang
    assert(s.head == 198 && s.length == 149, s"$s")
  }

  test("probs below the one-boost floor are rejected at plan build (round-19 review)") {
    // 1e-100 < 2^-84 would drive the boosted dp to exactly 0.0 and leave
    // the backtrack with no predecessor — the expression must refuse
    val e = intercept[IllegalArgumentException] {
      seg("aaa", Seq("a" -> 1e-100))
    }
    assert(e.getMessage.contains("2^-84"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      seg("aaa", Seq("a" -> 0.5), unk = 1e-100)
    }
    assert(e2.getMessage.contains("2^-84"), e2.getMessage)
  }

  test("unigramLmTrain: full Kudo loop — monotone shrinkage, chars never die (hand-checked)") {
    // corpus: ab x4, cd x2, xy x1. Seed multi = {ab, cd, xy}; schedule
    // (seedV=4, targetV=1, frac=0.5) = [2, 1]. Pass 1 uses all three
    // pairs; round 1 keeps top-2 by usage (ab:4, cd:2 — xy pruned);
    // round 2 keeps top-1 (ab). Final model = chars + ab with weights
    // a:1 b:1 c:1 d:1 x:2 y:2 ab:4 (usage under the round-2 model, +1
    // char backbone), so final_p(ab) = 4/12 exactly.
    val out = TextAnalysis.unigramLmTrain(
        Seq(Tuple1("ab ab ab ab cd cd xy")).toDF("text"), "text",
        maxPieceLen = 4, seedV = 4, targetV = 1, pruneFrac = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(2), r.getInt(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getLong(5))).toMap
    // rounds_survived: the nested prune ladder
    assert(out("ab") == ((false, 2, Some(4.0 / 12.0), 4L)), out("ab").toString)
    assert(out("cd")._2 == 1 && out("cd")._3.isEmpty && out("cd")._4 == 0L)
    assert(out("xy")._2 == 0 && out("xy")._3.isEmpty)
    // characters always reach the final model
    Seq("a", "b", "c", "d", "x", "y").foreach { c =>
      assert(out(c)._1 && out(c)._2 == 2 && out(c)._3.isDefined, s"$c: ${out(c)}")
    }
    // final usage: cd decodes c|d (wc 2), xy decodes x|y (wc 1)
    assert(out("c")._4 == 2L && out("x")._4 == 1L)
    // monotone multi-vocabulary shrinkage: 3 seeded -> 2 -> 1
    val multiByRound = (0 to 2).map(r =>
      out.count { case (_, (isChar, rs, _, _)) => !isChar && rs >= r })
    assert(multiByRound == Seq(3, 2, 1), multiByRound.toString)
  }

  test("unigramFertilityBySource: trained-vocab pieces per kchar, join-free corpus side") {
    // sources A ("ab ab") and B ("a b"): the trained model keeps multi
    // piece "ab", so A decodes 2 pieces over 4 chars (500/kchar) and B
    // decodes 2 single-char pieces over 2 chars (1000/kchar) — the
    // fertility gap IS the signal (the vocabulary fits A, not B)
    val df = Seq(("A", "ab ab"), ("B", "a b")).toDF("source", "text")
    val out = TextAnalysis.unigramFertilityBySource(df, "text", "source",
        maxPieceLen = 4, seedV = 4, targetV = 1, pruneFrac = 0.5)
      .orderBy("source").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out("A") == ((1L, 4L, 2L, 500L)), out("A").toString)
    assert(out("B") == ((1L, 2L, 2L, 1000L)), out("B").toString)
    // the corpus-sized side is a pure decode projection + one aggregate:
    // no join anywhere in the final plan
    val plan = TextAnalysis.unigramFertilityBySource(df, "text", "source",
        maxPieceLen = 4, seedV = 4, targetV = 1, pruneFrac = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("unigramLmVocab: chars always kept, unused multi-pieces pruned") {
    // corpus: 'ababab' x3, 'cd' x1 — 'ab' dominates; 'ba' is a frequent
    // substring (seeded) but the Viterbi path never uses it
    val docs = Seq((1L, "ababab ababab ababab cd")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLmVocab(docs, "text",
      maxPieceLen = 2, topV = 4).collect()
    val byPiece = out.map(r => r.getString(0) -> r).toMap
    // every single char present and kept
    Seq("a", "b", "c", "d").foreach { ch =>
      val r = byPiece(ch)
      assert(r.getBoolean(r.fieldIndex("is_char")))
      assert(r.getBoolean(r.fieldIndex("keep")))
    }
    val ab = byPiece("ab")
    assert(ab.getLong(ab.fieldIndex("usage")) == 9L, // 3 words x 3 'ab'
      ab.toString)
    assert(ab.getBoolean(ab.fieldIndex("keep")))
    val ba = byPiece("ba")
    assert(ba.getLong(ba.fieldIndex("usage")) == 0L, ba.toString)
    assert(!ba.getBoolean(ba.fieldIndex("keep")))
  }

  test("unigramLmVocab: usage is weighted by word count, not distinct words") {
    val docs = Seq((1L, "ab ab ab"), (2L, "ab cd")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLmVocab(docs, "text",
      maxPieceLen = 2, topV = 2).collect()
    val ab = out.find(_.getString(0) == "ab").get
    assert(ab.getLong(ab.fieldIndex("usage")) == 4L, ab.toString)
  }

  test("unigramLmEm: prune sticks, characters survive, p2 re-estimates from usage") {
    // corpus: 'ababab' x3 + 'cd' — pass-1 usage: ab=9, cd=1, ba=0, chars 0.
    // w2: ab=9, cd=1, chars +1 each (a b c d), ba pruned -> total2 = 14.
    val docs = Seq((1L, "ababab ababab ababab cd")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLmEm(docs, "text", maxPieceLen = 2, topV = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    val ba = out("ba")
    assert(ba.getBoolean(ba.fieldIndex("pruned")))
    assert(ba.isNullAt(ba.fieldIndex("p2")))
    assert(ba.getLong(ba.fieldIndex("usage_2")) == 0L)
    val ab = out("ab")
    assert(!ab.getBoolean(ab.fieldIndex("pruned")))
    assert(ab.getDouble(ab.fieldIndex("p2")) == 9.0 / 14.0)
    assert(ab.getLong(ab.fieldIndex("usage_1")) == 9L)
    assert(ab.getLong(ab.fieldIndex("usage_2")) == 9L)
    val a = out("a")
    assert(!a.getBoolean(a.fieldIndex("pruned")), "zero-usage chars survive")
    assert(a.getDouble(a.fieldIndex("p2")) == 1.0 / 14.0)
    val cd = out("cd")
    assert(cd.getLong(cd.fieldIndex("usage_2")) == 1L)
  }

  test("segmentation plan: zero-shuffle codegen projection") {
    val words = Seq(Tuple1("abcab")).toDF("word")
    val plan = words.select(graft.functions.unigram_segment(col("word"),
        toyVocab.map(_._1), toyVocab.map(_._2), 1e-9))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("unigram_segment"), plan)
  }
}
