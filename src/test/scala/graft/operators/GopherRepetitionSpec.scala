package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** gopherRepetition (Rae et al. 2021 Table A1, the full thirteen-signal
  * repetition filter) on hand-computed inputs; sf-scale behavior is
  * oracle-checked via q205. The kernel's counting rules under test:
  * duplicates are occurrences BEYOND the first, n-gram coverage is
  * count × token-chars (separators excluded), dup-n-gram coverage is the
  * SPAN UNION of duplicated windows, and chars are Unicode code points.
  */
class GopherRepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(text: String): org.apache.spark.sql.Row =
    TextAnalysis.gopherRepetition(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").collect()(0)

  private def f(r: org.apache.spark.sql.Row, name: String): Double =
    r.getDouble(r.fieldIndex(name))

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("line and paragraph duplicate stats: beyond-first counting, empties excluded") {
    // lines: aa, bb, aa, cc (the "" between \n\n is excluded) -> 1 dup of 2 chars / 8
    // paragraphs (split "\n\n"): "aa\nbb\naa" and "cc" -> no dups
    val r = run("aa\nbb\naa\n\ncc")
    assert(f(r, "dup_line_frac") == 0.25)
    assert(f(r, "dup_line_char_frac") == 2.0 / 8)
    assert(f(r, "dup_para_frac") == 0.0)
    assert(f(r, "dup_para_char_frac") == 0.0)
    // the whole text is ONE space-split token; no 2-gram exists
    assert(r.getLong(r.fieldIndex("n_tokens")) == 1L)
    assert(f(r, "top_2gram_char_frac") == 0.0)
    // dup_line_char_frac 0.25 > 0.20 -> rejected
    assert(!r.getBoolean(r.fieldIndex("keep")))
  }

  test("identical paragraphs are counted at the paragraph level") {
    val r = run("pp qq\n\npp qq")
    // paragraphs: "pp qq" x2 -> dup 1/2, chars 5 dup of 10
    assert(f(r, "dup_para_frac") == 0.5)
    assert(f(r, "dup_para_char_frac") == 0.5)
    // lines: "pp qq" x2 (the "\n\n" makes one empty line, excluded)
    assert(f(r, "dup_line_frac") == 0.5)
  }

  test("top n-gram coverage: count x token-chars, separators excluded") {
    val r = run("x y x y z")
    // 2-grams: "x y" x2 (2 chars) beats "y x"/"y z" x1 -> 4/5
    assert(f(r, "top_2gram_char_frac") == 4.0 / 5)
    // 3-grams all distinct: best = 3 chars -> 3/5
    assert(f(r, "top_3gram_char_frac") == 3.0 / 5)
    assert(f(r, "top_4gram_char_frac") == 4.0 / 5)
    // only one 5-token window -> no duplicated 5-gram
    assert(f(r, "dup_5gram_char_frac") == 0.0)
  }

  test("dup n-gram coverage is a span union, not a per-window sum") {
    // "a b c d e" duplicated at positions 0 and 5: covers tokens 0..9 of 11
    val r = run("a b c d e a b c d e x")
    assert(f(r, "dup_5gram_char_frac") == 10.0 / 11)
    // all 6-grams distinct
    assert(f(r, "dup_6gram_char_frac") == 0.0)
  }

  test("overlapping duplicated windows count each token once") {
    // six a's: both 5-gram windows are "a a a a a" (count 2) and their
    // union covers all 6 tokens exactly once
    val r = run("a a a a a a")
    assert(f(r, "dup_5gram_char_frac") == 1.0)
    // top-2-gram coverage may exceed 1 under overlap: "a a" occurs 5 times
    assert(f(r, "top_2gram_char_frac") == 10.0 / 6)
  }

  test("chars are code points: multibyte tokens weigh their full length") {
    val r = run("ああ ああ")
    // one 2-gram, count 1, 4 token chars / 4 total -> 1.0
    assert(f(r, "top_2gram_char_frac") == 1.0)
    assert(!r.getBoolean(r.fieldIndex("keep")))
  }

  test("empty text: all denominators guarded to 0.0, keep = true") {
    val r = run("")
    assert(f(r, "dup_line_frac") == 0.0)
    assert(f(r, "top_2gram_char_frac") == 0.0)
    assert(f(r, "dup_10gram_char_frac") == 0.0)
    assert(r.getBoolean(r.fieldIndex("keep")))
  }

  test("a long diverse doc passes every Table A1 threshold") {
    val text = (0 until 40).map(i => s"tok$i").mkString(" ")
    val r = run(text)
    assert(r.getBoolean(r.fieldIndex("keep")), r.toString)
    assert(f(r, "dup_5gram_char_frac") == 0.0)
  }

  test("plan is a shuffle-free codegen projection over the kernel") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextAnalysis.gopherRepetition(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"filter must not shuffle:\n$plan")
    assert(plan.contains("repetition_signals"), s"expected the codegen kernel:\n$plan")
  }

  test("repetitionHealthBySource: flagged counts and ratio-of-sums per source") {
    // diverse docs must be LONG: on a 5-token doc the single most frequent
    // 2-gram already covers 40% of the chars (the short-doc effect the
    // Table-A1 thresholds assume away)
    val df = Seq(
      ("clean", words("tok", 30)),                 // no dup anywhere
      ("dirty", "a b c d e a b c d e x"),          // cov5 = 10 of 11 chars
      ("dirty", words("m", 30))                    // 80 chars, no dup
    ).toDF("source", "text")
    val r = TextAnalysis.repetitionHealthBySource(df, "source", "text")
      .orderBy("source").collect()
    val clean = r(0); val dirty = r(1)
    assert(clean.getLong(clean.fieldIndex("n_docs")) == 1L)
    assert(clean.getLong(clean.fieldIndex("n_flagged")) == 0L)
    assert(clean.getDouble(clean.fieldIndex("dup5_char_frac")) == 0.0)
    assert(dirty.getLong(dirty.fieldIndex("n_docs")) == 2L)
    // the a..e doc trips dup-5gram (10/11 > 0.15) and top-2gram
    assert(dirty.getLong(dirty.fieldIndex("n_flagged")) == 1L)
    assert(dirty.getLong(dirty.fieldIndex("n_dup5_fail")) == 1L)
    // ratio of integer sums, NOT mean of fractions: (10+0)/(11+80)
    assert(dirty.getDouble(dirty.fieldIndex("dup5_char_frac")) == 10.0 / 91)
  }

  test("repetitionHealthBySource: exactly one shuffle (source-keyed aggregate)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextAnalysis.repetitionHealthBySource(corpus, "source", "text")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected the one source-keyed exchange:\n$plan")
  }

  test("null text: n_tokens null, fractions guard to 0.0, keep = true") {
    // the zero-denominator guard absorbs null signals (when(null > 0)
    // falls to otherwise) — a null doc trips no repetition gate, matching
    // the "filters reject on positive evidence" convention
    val r = TextAnalysis.gopherRepetition(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(r.isNullAt(r.fieldIndex("n_tokens")))
    assert(f(r, "dup_line_frac") == 0.0)
    assert(r.getBoolean(r.fieldIndex("keep")))
  }
}
