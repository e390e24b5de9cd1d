package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** stripHtml / normalizeText / mixtureWeights / corpusReport on
  * hand-computable inputs (sf-scale behavior is oracle-checked via
  * q109–q112).
  */
class TextHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- stripHtml ----

  private def strip1(html: String): (Int, String) = {
    val r = TextAnalysis.stripHtml(
      Seq((1L, html)).toDF("id", "html"), "id", "html").collect()(0)
    (r.getInt(1), r.getString(2))
  }

  test("stripHtml: script/style contents removed before bare-tag pass") {
    val (_, txt) = strip1(
      "<p>keep</p><script>var x = 1 < 2; drop()</script><style>p{a:b}</style>tail")
    assert(txt == "keep tail")
  }

  test("stripHtml: comments and attribute-laden tags removed, entities decoded") {
    val (nTags, txt) = strip1(
      """<div class="a" data-x="1 > 0"><!-- note -->A &amp;amp; B &lt;ok&gt;&nbsp;&#39;q&#39;</div>""")
    // &amp;amp; decodes to the literal text "&amp;" — the &amp;-last rule
    assert(txt == "A &amp; B <ok> 'q'")
    assert(nTags > 0)
  }

  test("stripHtml: n_tags counts markup on the raw input") {
    val (nTags, _) = strip1("<a><b>x</b></a>")
    assert(nTags == 4)
  }

  test("stripHtml: whitespace runs collapse and ends trim") {
    val (_, txt) = strip1("<p>  a\n\t b </p>")
    assert(txt == "a b")
  }

  // ---- normalizeText ----

  private def norm1(s0: String): (String, Boolean) = {
    val r = TextAnalysis.normalizeText(
      Seq((1L, s0)).toDF("id", "t"), "id", "t").collect()(0)
    (r.getString(2), r.getBoolean(4))
  }

  test("normalizeText: fullwidth ASCII folds to halfwidth") {
    assert(norm1("Ｈｅｌｌｏ！")._1 == "Hello!")
  }

  test("normalizeText: curly quotes, dashes, ellipsis to ASCII") {
    assert(norm1("“q” ‘s’ a–b—c d…")._1 ==
      "\"q\" 's' a-b-c d...")
  }

  test("normalizeText: NBSP and ideographic space become plain; zero-width and controls vanish") {
    val (txt, changed) = norm1("a\u00A0b\u3000c\u200Bd\u0007e")
    assert(txt == "a b cde")
    assert(changed)
  }

  test("normalizeText: clean text is unchanged") {
    val (txt, changed) = norm1("already clean")
    assert(txt == "already clean" && !changed)
  }

  // ---- mixtureWeights ----

  test("mixtureWeights: integer weights repeat exactly, zero drops, copies indexed") {
    val df = (1L to 20L).map(i => (i, if (i <= 10) "a" else "b")).toDF("id", "src")
    val r = Sampling.mixtureWeights(df, "id", "src", Map("a" -> 2.0, "b" -> 0.0))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(r.count(_._2 == "b") == 0)
    assert(r.count(_._2 == "a") == 20)
    assert(r.filter(_._1 == 3L).map(_._3).sorted.toSeq == Seq(1L, 2L))
  }

  test("mixtureWeights: fractional weight selects a deterministic id subset") {
    val df = (1L to 1000L).map(i => (i, "s")).toDF("id", "src")
    val r1 = Sampling.mixtureWeights(df, "id", "src", Map("s" -> 0.3))
      .collect().map(_.getLong(0)).sorted.toSeq
    val r2 = Sampling.mixtureWeights(df.repartition(7), "id", "src", Map("s" -> 0.3))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(r1 == r2) // repartition-stable
    assert(math.abs(r1.size - 300) < 60) // ~30% within hash tolerance
  }

  test("mixtureWeights: default weight applies to unlisted sources") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "src")
    val r = Sampling.mixtureWeights(df, "id", "src", Map("x" -> 3.0))
      .collect().map(x => (x.getString(1), x.getLong(2)))
    assert(r.count(_._1 == "x") == 3 && r.count(_._1 == "y") == 1)
  }

  test("mixtureWeights: rejects weights outside [0, 100]") {
    val df = Seq((1L, "x")).toDF("id", "src")
    intercept[IllegalArgumentException] {
      Sampling.mixtureWeights(df, "id", "src", Map("x" -> -0.1))
    }
  }

  // ---- curate ----

  test("curate: length gate, repetition gate, first-wins dedup compose into keep") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today fine"),
      (2L, "the quick brown fox jumps over the lazy dog today fine"), // dup of 1
      (3L, "short doc"), // fails length
      (4L, "spam spam spam spam spam spam spam spam spam spam ok")) // repetitive
      .toDF("doc_id", "text")
    val r = TextAnalysis.curate(docs, "doc_id", "text", minWords = 10)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getBoolean(2), x.getBoolean(3), x.getBoolean(5), x.getBoolean(6)))
    assert(r(0) == (1L, true, true, true, true))
    assert(r(1) == (2L, true, true, false, false)) // duplicate: copy_rank 2
    assert(r(2)._2 == false && r(2)._5 == false) // too short
    assert(r(3)._3 == false && r(3)._5 == false) // dup_frac too high
  }

  test("curate: dedup keys on NORMALIZED text (formatting variants collapse)") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one  two three four five six seven eight nine ten")) // double space
      .toDF("doc_id", "text")
    val r = TextAnalysis.curate(docs, "doc_id", "text", minWords = 5)
      .orderBy("doc_id").collect()
    assert(r(0).getBoolean(5) && !r(1).getBoolean(5)) // doc 2 is the copy
  }

  // ---- invertedIndex ----

  test("invertedIndex: postings ordered, positions exact, minDf prunes") {
    val docs = Seq(
      (10L, "a b a c"),
      (20L, "b a"),
      (30L, "c")).toDF("doc_id", "text")
    val r = TextAnalysis.invertedIndex(docs, "doc_id", "text")
      .orderBy("term").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getSeq[org.apache.spark.sql.Row](3)
          .map(p => (p.getLong(0), p.getSeq[Int](1).toList)).toList))
    assert(r.toSeq == Seq(
      ("a", 2L, 3L, List((10L, List(0, 2)), (20L, List(1)))),
      ("b", 2L, 2L, List((10L, List(1)), (20L, List(0)))),
      ("c", 2L, 2L, List((10L, List(3)), (30L, List(0))))))
    val pruned = TextAnalysis.invertedIndex(docs, "doc_id", "text", minDf = 3)
    assert(pruned.count() == 0)
  }

  // ---- corpusReport ----

  test("corpusReport: volumes, exact-dup rate, short fraction per source") {
    val docs = Seq(
      (1L, "a", "w w w"), (2L, "a", "w w w"), (3L, "a", "long " * 60),
      (4L, "b", "unique doc")).toDF("doc_id", "src", "text")
    val r = TextAnalysis.corpusReport(docs, "src", "text", shortTokens = 50)
      .orderBy("src").collect()
    val a = r(0)
    assert(a.getLong(1) == 3) // n_docs
    assert(a.getLong(3) == 2) // n_distinct (two identical "w w w")
    assert(math.abs(a.getDouble(5) - (1.0 - 2.0 / 3)) < 1e-12) // dup_frac
    assert(a.getLong(4) == 2 && math.abs(a.getDouble(6) - 2.0 / 3) < 1e-12)
    val b = r(1)
    assert(b.getLong(1) == 1 && b.getDouble(5) == 0.0)
  }

  // ---- charDiversityReport ----

  private def cdr(rows: Seq[(Long, String)]) =
    TextAnalysis.charDiversityReport(rows.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()

  test("charDiversityReport: exact counts, hand-computed collision numerator") {
    // "aab": n=3, distinct=2, coll = 2*1 + 1*0 = 2, ratio = 2/6
    val r = cdr(Seq((1L, "aab")))(0)
    assert(r.getLong(1) == 3 && r.getLong(2) == 2 && r.getLong(3) == 2)
    assert(r.getDouble(4) == 2.0 / 6.0)
  }

  test("charDiversityReport: code points, not UTF-16 units (surrogate pairs)") {
    // U+1F600 twice: 2 code points (4 UTF-16 units), 1 distinct, coll 2
    val r = cdr(Seq((1L, "😀😀")))(0)
    assert(r.getLong(1) == 2 && r.getLong(2) == 1 && r.getLong(3) == 2)
    assert(r.getBoolean(5)) // repeated-pair rate 1.0 and distinct < 10
  }

  test("charDiversityReport: gate flags junk, passes diverse text") {
    val r = cdr(Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaaa"),      // pure repetition
      (2L, "The quick brown fox jumps over the lazy dog; 0123456789!")))
    assert(r(0).getBoolean(5))
    assert(!r(1).getBoolean(5))
  }

  test("charDiversityReport: empty and single-char rows get null ratio, no flag crash") {
    val r = cdr(Seq((1L, ""), (2L, "x")))
    assert(r(0).getLong(1) == 0 && r(0).isNullAt(4))
    assert(r(1).getLong(1) == 1 && r(1).isNullAt(4))
    // both flagged solely via the distinct-count arm (0 and 1 < 10)
    assert(r(0).getBoolean(5) && r(1).getBoolean(5))
  }

  test("charDiversityReport: gate threshold is exact at the permille boundary (decimal arithmetic)") {
    // 'a'·5 + 15 distinct fillers: n=20, coll = 5·4 = 20, rate = 20/380
    // permille ≈ 52.63. At maxCollPermille=52 the strict > flags it
    // (20·1000 = 20000 > 52·380 = 19760); at 53 it does not (20140).
    // Pins the ADVICE-r14 decimal rewrite to the same exact semantics as
    // the old 64-bit cross-multiply on in-range values.
    val doc = Seq((1L, "aaaaa" + "bcdefghijklmnop"))
    val lo = TextAnalysis.charDiversityReport(doc.toDF("doc_id", "text"),
      "doc_id", "text", maxCollPermille = 52).collect()(0)
    val hi = TextAnalysis.charDiversityReport(doc.toDF("doc_id", "text"),
      "doc_id", "text", maxCollPermille = 53).collect()(0)
    assert(lo.getBoolean(5) && !hi.getBoolean(5))
  }

  test("bpeMerges: the Sennrich low/lower walk — counts, tie-break, merge application") {
    // word counts: low x3, lower x2, newest x1. Step 1: (l,o)=5 ties (o,w)=5,
    // lexicographic pick (l,o); step 2: (lo,w)=5; step 3: (low,e)=2 ties
    // (e,r)=2, pick (e,r).
    val d = Seq("low low low", "lower lower", "newest").toDF("text")
    val r = TextAnalysis.bpeMerges(d, "text", steps = 3).orderBy("step").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getString(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (1, "l", "o", "lo", 5L), (2, "lo", "w", "low", 5L), (3, "e", "r", "er", 2L)))
  }

  test("bpeMerges: consecutive pair runs merge greedily left-to-right (two-pass replace)") {
    // abab x2: (a,b) appears twice per word (overlap-counted like get_stats);
    // after merging, the CONSECUTIVE occurrences must both apply (the
    // single-replace bug leaves " ab a b "). aaa: greedy (a,a) -> [aa, a].
    val d = Seq("abab abab", "aaa").toDF("text")
    val r = TextAnalysis.bpeMerges(d, "text", steps = 3).orderBy("step").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getString(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (1, "a", "b", "ab", 4L), (2, "a", "a", "aa", 2L), (3, "ab", "ab", "abab", 2L)))
  }

  test("bpeVocabFreq: final vocabulary state yields segmented corpus token frequencies") {
    // after the 3 merges above: low x5 -> [low]; lower x2 -> [low, er];
    // newest x1 -> [n, e, w, e, s, t]. freq: low 5, e 2, er 2 (tie broken
    // token asc), n/s/t/w 1 each.
    val d = Seq("low low low", "lower lower", "newest").toDF("text")
    val r = TextAnalysis.bpeVocabFreq(d, "text", steps = 3, k = 7).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq(
      ("low", 5L), ("e", 2L), ("er", 2L), ("n", 1L), ("s", 1L), ("t", 1L), ("w", 1L)))
  }

  test("bpe_segment: applying the learned table reproduces the learner's vocabulary state and segments new words consistently") {
    val d = Seq("low low low", "lower lower", "newest").toDF("text")
    val merges = TextAnalysis.bpeMerges(d, "text", steps = 3).orderBy("step").collect()
      .map(r => Array(r.getString(1), r.getString(2)))
    def seg(t: String): Seq[String] =
      Seq(t).toDF("t").select(graft.functions.bpe_segment(org.apache.spark.sql.functions.col("t"), merges))
        .head().getSeq[String](0)
    // training words reproduce the learner's final state (merges l+o, lo+w, e+r)
    assert(seg("low") == Seq("low"))
    assert(seg("lower") == Seq("low", "er"))
    assert(seg("newest") == Seq("n", "e", "w", "e", "s", "t"))
    // a NEW word walks the same chain: "slower" -> s + low + er
    assert(seg("slower") == Seq("s", "low", "er"))
    // multi-word text concatenates per-word segmentations in order; extra
    // spaces contribute nothing
    assert(seg("lower  slow") == Seq("low", "er", "s", "low"))
    assert(seg("") == Seq())
    // greedy two-pass semantics through the apply path: with merge (a,a),
    // aaa -> [aa, a] (left-to-right, non-overlapping)
    val aa = Array(Array("a", "a"))
    assert(Seq("aaa").toDF("t").select(graft.functions.bpe_segment(org.apache.spark.sql.functions.col("t"), aa))
      .head().getSeq[String](0) == Seq("aa", "a"))
  }

  test("adaptiveTokenFloor: per-source exact quartile rank, tie-break by doc_id, keep is >= floor") {
    // source a: token counts 1,2,3,4,5 -> rank 1+(5-1)/4 = 2 -> floor 2
    // source b: counts 10,10 (tie -> doc_id order), rank 1+(2-1)/4 = 1 -> floor 10
    val docs = Seq(
      (1L, "a", "w"), (2L, "a", "w w"), (3L, "a", "w w w"),
      (4L, "a", "w w w w"), (5L, "a", "w w w w w"),
      (6L, "b", "x x x x x x x x x x"), (7L, "b", "y y y y y y y y y y"))
      .toDF("doc_id", "src", "text")
    val r = TextAnalysis.adaptiveTokenFloor(docs, "doc_id", "src", "text", quarter = 1)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getBoolean(4)))
    assert(r.toSeq == Seq(
      (1L, 1L, 2L, false), (2L, 2L, 2L, true), (3L, 3L, 2L, true),
      (4L, 4L, 2L, true), (5L, 5L, 2L, true),
      (6L, 10L, 10L, true), (7L, 10L, 10L, true)))
    // median variant: rank 1+(5-1)*2/4 = 3 -> floor 3 for source a
    val med = TextAnalysis.adaptiveTokenFloor(docs, "doc_id", "src", "text", quarter = 2)
      .where(org.apache.spark.sql.functions.col("source") === "a").orderBy("doc_id")
      .collect().map(_.getLong(3)).toSeq
    assert(med == Seq(3L, 3L, 3L, 3L, 3L))
  }

  test("tokenBudgetSelect: greedy by distinct-token score, strict prefix keep at the budget edge") {
    // scores (distinct toks): d1=4, d2=3, d3=3, d4=1; greedy order d1,d2,d3,d4
    // n_toks: 4, 4, 3, 5; cumsum: 4, 8, 11, 16 — budget 11 keeps exactly d1..d3
    val docs = Seq(
      (1L, "a b c d"), (2L, "a a b c"), (3L, "x y z"),
      (4L, "w w w w w")).toDF("doc_id", "text")
    val r = Sampling.tokenBudgetSelect(docs, "doc_id", "text", budget = 11L)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(3), x.getBoolean(4)))
    assert(r.toSeq == Seq((1L, 4L, true), (2L, 8L, true), (3L, 11L, true), (4L, 16L, false)))
    // budget 10: d3's inclusive sum 11 > 10 — strict rule drops it even
    // though 2 of its 3 tokens would fit
    val r10 = Sampling.tokenBudgetSelect(docs, "doc_id", "text", budget = 10L)
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getBoolean(4)))
    assert(r10.toSeq == Seq((1L, true), (2L, true), (3L, false), (4L, false)))
  }

  test("tokenBudgetSelect: no single-partition window (two-pass prefix sum plan shape)") {
    // VERDICT r16 #2: every Window in the physical plan must carry a
    // partition spec — the global running sum is bucket-partitioned, with
    // cross-bucket offsets as a literal plan expression, so no stage
    // funnels the whole triples frame through one task.
    val docs = (1L to 200L).map(i => (i, Seq.fill((i % 7 + 1).toInt)("t" + i % 13).mkString(" ")))
      .toDF("doc_id", "text")
    // AQE wraps the plan in AdaptiveSparkPlanExec (whose inner plan is not
    // a TreeNode child) — disable it for the whole test so WindowExec is
    // inspectable; plan construction and inspection are both lazy
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val r = Sampling.tokenBudgetSelect(docs, "doc_id", "text", budget = 300L)
      val windows = r.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, "expected the in-bucket running-sum WindowExec")
      windows.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"unpartitioned WindowExec in tokenBudgetSelect plan: $w")
      }
      // cross-bucket correctness at a bucket boundary: the cumulative sums
      // must equal the single-sequence reference on the same data
      val got = r.orderBy(org.apache.spark.sql.functions.col("score").desc, org.apache.spark.sql.functions.col("doc_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(3)))
      val ref = got.map(t => (t._1, t._2)).scanLeft(0L)(_ + _._2).tail
      assert(got.map(_._3).toSeq == ref.toSeq, "cum_toks diverges from the sequential reference")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("encodingDamageReport: FFFD and C0/DEL densities in exact ppm, tab/newline/CR exempt") {
    val mojibake = "bad \uFFFD\uFFFD decode"
    val controls = "ctl\u0001\u0002\u007F mix"
    val docs = Seq(
      (1L, "clean text here"),
      (2L, mojibake),
      (3L, controls),
      (4L, "tabs\tand\nnewlines\rok"), // exempt whitespace controls
      (5L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.encodingDamageReport(docs, "doc_id", "text", ppmThreshold = 100000)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getBoolean(6)))
    assert(r(0) == ((1L, 0L, 0L, 0L, 0L, false)))
    assert(r(1) == ((2L, 2L, 0L, 2L * 1000000L / mojibake.length, 0L, true)))
    assert(r(2) == ((3L, 0L, 3L, 0L, 3L * 1000000L / controls.length, true)))
    assert(r(3) == ((4L, 0L, 0L, 0L, 0L, false)), "tab/newline/CR must not count as damage")
    assert(r(4) == ((5L, 0L, 0L, 0L, 0L, false)), "empty doc: 0 ppm, undamaged")
  }

  test("scriptMixReport: exact class counts on mixed-script text, fixed-priority dominant") {
    val docs = Seq(
      (1L, "Hello 123 world"),       // latin 10, digit 3, space 2
      (2L, "こんにちは世界"),          // hiragana 5, kanji 2
      (3L, "カタカナとローマ字ab"),    // katakana incl. ー, hiragana と/字? (字 is kanji)
      (4L, ""),                       // empty
      (5L, "аб 間")).toDF("doc_id", "text") // cyrillic → other
    val r = TextAnalysis.scriptMixReport(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def row(i: Int) = r(i)
    assert(row(0).getLong(1) == 15 && row(0).getLong(2) == 10 &&
      row(0).getLong(3) == 3 && row(0).getLong(7) == 2 && row(0).getString(9) == "latin")
    assert(row(1).getLong(4) == 5 && row(1).getLong(6) == 2 &&
      row(1).getString(9) == "hiragana")
    assert(row(2).getLong(5) == 7, s"katakana count incl. ー: ${row(2)}") // カタカナ(4)+ローマ(3 incl ー)
    assert(row(3).getString(9) == "empty")
    assert(row(4).getLong(8) == 2 && row(4).getLong(6) == 1, s"cyrillic is other: ${row(4)}")
    // tie goes to the earlier class in the fixed order: 1 latin vs 1 kanji → latin
    val tie = TextAnalysis.scriptMixReport(Seq((9L, "a間")).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(tie.getString(9) == "latin")
    // whitespace-only doc: 'space', not a confident zero-count 'latin'
    // (round-17 review finding)
    val ws = TextAnalysis.scriptMixReport(Seq((10L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(ws.getString(9) == "space", s"whitespace-only must label space: $ws")
  }

  test("script_counts kernel equals the nine-regex composition (fusion is transparent)") {
    import org.apache.spark.sql.functions._
    // C0 controls built programmatically, not as raw source bytes
    val ctlRow = "ctl " + Seq(1, 7, 11, 31, 127).map(_.toChar).mkString + " ok"
    val texts = Seq("Hello 123 world", "こんにちは世界", "カタカナとローマ字ab",
      "", "аб 間", "mixed 漢字 and かな and カナ 42", "😀 emoji is other",
      // encoding-damage slots: U+FFFD runs, C0 controls (\t \n \r exempt), DEL
      "bad �� text", ctlRow, "tab\tand\nnl\rcr keep")
    val df = texts.toDF("text")
    def cnt(p: String) = (length(col("text")) - length(regexp_replace(col("text"), p, ""))).cast("long")
    val viaRegex = df.select(array(length(col("text")).cast("long"),
        cnt("[A-Za-z]"), cnt("[0-9]"), cnt("[\\x{3041}-\\x{3096}]"),
        cnt("[\\x{30A1}-\\x{30FA}\\x{30FC}]"), cnt("[\\x{4E00}-\\x{9FFF}]"), cnt(" "),
        cnt("�"), cnt("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")).as("a"))
      .collect().map(_.getSeq[Long](0)).toSeq
    val viaKernel = df.select(graft.functions.script_counts(col("text")).as("a"))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(viaKernel == viaRegex)
    assert(viaKernel.head == Seq(15L, 10L, 3L, 0L, 0L, 0L, 2L, 0L, 0L))
    assert(viaKernel(7) == Seq(11L, 7L, 0L, 0L, 0L, 0L, 2L, 2L, 0L))
    assert(viaKernel(8) == Seq(12L, 5L, 0L, 0L, 0L, 0L, 2L, 0L, 5L))
    assert(viaKernel(9) == Seq(18L, 14L, 0L, 0L, 0L, 0L, 1L, 0L, 0L)) // \t \n \r exempt
  }

  test("encodingDamageReport rides the single script_counts pass (no regex in the plan)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextAnalysis.encodingDamageReport(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("script_counts"), plan)
    assert(!plan.toLowerCase.contains("regexp_replace"),
      s"q197 must not regex-scan the corpus:\n$plan")
  }

  test("vocabularyGrowth: integer deciles, first-appearance attribution, cumulative curve") {
    // 10 docs; doc 1 brings {a,b}, doc 5 brings {c}, doc 10 brings {d};
    // every other doc repeats a → deciles: b1=2 new, b5=1, b10=1
    val docs = (1L to 10L).map {
      case 1L => (1L, "a b")
      case 5L => (5L, "a c")
      case 10L => (10L, "a d")
      case i => (i, "a")
    }.toDF("doc_id", "text")
    val r = TextAnalysis.vocabularyGrowth(docs, "doc_id", "text")
      .orderBy("bucket").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.length == 10)
    assert(r(0) == ((1L, 1L, 2L, 2L)))  // threshold m*1/10 = 1 → {a, b}
    assert(r(4) == ((5L, 5L, 1L, 3L)))  // c first appears in doc 5
    assert(r(8) == ((9L, 9L, 0L, 3L)))  // nothing new in 6..9
    assert(r(9) == ((10L, 10L, 1L, 4L)))
    // empty corpus → empty curve, no NPE
    assert(TextAnalysis.vocabularyGrowth(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text").count() == 0)
    // 0-based ids: doc 0's vocabulary must land in bucket 1, not a
    // nonexistent bucket 0 (round-17 review finding); all-same-id corpus
    // must not divide by zero
    val zero = (0L to 9L).map(i => (i, if (i == 0) "a b" else "a")).toDF("doc_id", "text")
    val rz = TextAnalysis.vocabularyGrowth(zero, "doc_id", "text")
      .orderBy("bucket").collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    assert(rz(0) == ((1L, 2L, 2L)), s"doc-0 vocab must be counted: ${rz.toSeq}")
    assert(rz(9)._3 == 2L, "total vocabulary must be complete")
    val same = Seq((7L, "x y"), (7L, "y z")).toDF("doc_id", "text")
    val rs = TextAnalysis.vocabularyGrowth(same, "doc_id", "text")
      .orderBy("bucket").collect().map(x => (x.getLong(0), x.getLong(3)))
    assert(rs(9) == ((10L, 3L)), s"single-id corpus: all vocab at the 100% point: ${rs.toSeq}")
  }

  test("vocabularyGrowthBySource: each source's curve over ITS OWN span; zero driver collects") {
    // source p: docs 1..10 (the global test's corpus); source q: docs
    // 101..105, doc 101 brings {k}, doc 105 brings {m} — q's deciles run
    // over span 5, so doc 105 is q's bucket 10, not the corpus's
    val docs = ((1L to 10L).map {
      case 1L => (1L, "p", "a b")
      case 5L => (5L, "p", "a c")
      case 10L => (10L, "p", "a d")
      case i => (i, "p", "a")
    } ++ (101L to 105L).map {
      case 101L => (101L, "q", "k")
      case 105L => (105L, "q", "k m")
      case i => (i, "q", "k")
    }).toDF("doc_id", "src", "text")
    val r = TextAnalysis.vocabularyGrowthBySource(docs, "src", "doc_id", "text")
      .orderBy("source", "bucket").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.length == 20)
    val p = r.filter(_._1 == "p").map(t => (t._2, t._3, t._4, t._5))
    assert(p(0) == ((1L, 1L, 2L, 2L)) && p(4) == ((5L, 5L, 1L, 3L)) &&
      p(9) == ((10L, 10L, 1L, 4L)), s"source p must reproduce the global curve: ${p.toSeq}")
    val q = r.filter(_._1 == "q").map(t => (t._2, t._3, t._4, t._5))
    // span 5: doc 101 → ceil-bucket (1*10+4)/5 = 2; doc 105 → 54/5 = 10;
    // thresholds 100 + 5*b/10 (duplicates are the q200 sub-decile semantics)
    assert(q(0) == ((1L, 100L, 0L, 0L)) && q(1) == ((2L, 101L, 1L, 1L)),
      s"k lands in q's bucket 2 over q's own span: ${q.toSeq}")
    assert(q(8) == ((9L, 104L, 0L, 1L)) && q(9) == ((10L, 105L, 1L, 2L)),
      s"m lands in q's bucket 10: ${q.toSeq}")
    // shape: the cumsum window is source-partitioned — an unpartitioned
    // window would plan an Exchange SinglePartition (the q193 scale-killer
    // class); there must be none anywhere in the plan
    val plan = TextAnalysis.vocabularyGrowthBySource(docs, "src", "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"no single-reducer stage allowed:\n$plan")
  }

  test("frequencySpectrum: exact ilog2 bins incl. the power-of-two edges") {
    // counts: a=1 (bin 0), b=2, c=3 (bin 1), d=4 (bin 2) — the b/c/d edges
    // are exactly where a float log2 could misbin
    val df = Seq((1L, "a b b c c c d d d d")).toDF("doc_id", "text")
    val r = TextAnalysis.frequencySpectrum(df, "text")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((0, 1L, 1L), (1, 2L, 5L), (2, 1L, 4L)), s"got $r")
  }

  test("tokenDrift: exact ppm rates, full-outer vocabulary, tie-broken top-k") {
    val a = Seq((1L, "x x x y")).toDF("doc_id", "text")   // T1=4: x 750000, y 250000
    val b = Seq((2L, "x y y z z")).toDF("doc_id", "text") // T2=5: x 200000, y 400000, z 400000
    val r = TextAnalysis.tokenDrift(a, b, "text", k = 10)
      .collect().map(x => (x.getString(0), x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      ("x", 750000L, 200000L, 550000L),   // biggest mover
      ("y", 250000L, 400000L, -150000L),  // |drift| ties with z? no: 150k vs 400k
      ("z", 0L, 400000L, -400000L)).sortBy(t => (-math.abs(t._4), t._1)), s"got ${r.toSeq}")
  }

  // ---- bigramFluency ----

  test("bigramFluency: seen bigrams score c12*S/c1; unseen back off to 0.4*unigram") {
    val ref = Seq((2L, "a b a b c")).toDF("doc_id", "text")
    // model: uni a:2 b:2 c:1 (T=5); bi (a,b):2 (b,a):1 (b,c):1
    val docs = Seq((1L, "a b x"), (2L, "a b a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramFluency(docs, ref, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: (a,b) seen -> 2*1e6/2 = 1_000_000; (b,x) unseen, x OOV ->
    // 2*0*1e6/(5*5) = 0
    assert(r(0).getLong(1) == 2 && r(0).getLong(2) == 1000000L)
    // doc 2: (a,b)=1e6 twice, (b,a)=1*1e6/2=500000, (b,c)=1*1e6/2=500000
    assert(r(1).getLong(1) == 4 && r(1).getLong(2) == 3000000L)
    assert(r(1).getDouble(3) == 750000.0)
  }

  test("bigramFluency: unseen bigram of in-vocab words uses the w2 unigram count") {
    val ref = Seq((2L, "a b c d")).toDF("doc_id", "text")
    // (c, a): unseen but c,a in vocab -> 2*C(a)*S/(5*T) = 2*1*1e6/20 = 100000
    val docs = Seq((1L, "c a")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramFluency(docs, ref, "doc_id", "text").collect()(0)
    assert(r.getLong(1) == 1 && r.getLong(2) == 100000L)
  }

  test("bigramFluency: sub-2-token docs keep zero counts and null mean") {
    val ref = Seq((9L, "a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a"), (2L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramFluency(docs, ref, "doc_id", "text")
      .orderBy("doc_id").collect()
    r.foreach { row =>
      assert(row.getLong(1) == 0 && row.getLong(2) == 0 && row.isNullAt(3))
    }
  }

  test("charDiversityReport: plan is a shuffle-free codegen projection") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextAnalysis.charDiversityReport(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gate must not shuffle:\n$plan")
    assert(plan.contains("char_stats"), s"expected the codegen kernel:\n$plan")
  }

  test("fertilityByScript: per-script sums and integer ppm rates") {
    // merge table: (a,b)->ab — 'a b' segments to 1 symbol, others 1/char
    val merges = Array(Array("a", "b"))
    val docs = Seq(
      (1L, "ab cd"), // latin: words 2, syms: 'ab' (merged) 1 + 'cd' 2 = 3
      (2L, "ひら がな"), // hiragana: words 2, syms 4 (no merges apply)
      (3L, "ab")) // latin: words 1, syms 1
      .toDF("doc_id", "text")
    val r = TextAnalysis.fertilityByScript(docs, "doc_id", "text", merges)
      .orderBy("dominant").collect()
    val byLabel = r.map(x => x.getString(0) -> x).toMap
    assert(byLabel.keySet == Set("latin", "hiragana"))
    val lat = byLabel("latin")
    assert(lat.getLong(lat.fieldIndex("n_docs")) == 2L)
    assert(lat.getLong(lat.fieldIndex("sum_words")) == 3L)
    assert(lat.getLong(lat.fieldIndex("sum_syms")) == 4L)
    // fertility = 4 syms / 3 words = 1_333_333 ppm (integer div)
    assert(lat.getLong(lat.fieldIndex("fertility_ppm")) == 1333333L)
    val hira = byLabel("hiragana")
    assert(hira.getLong(hira.fieldIndex("sum_words")) == 2L)
    assert(hira.getLong(hira.fieldIndex("sum_syms")) == 4L)
    assert(hira.getLong(hira.fieldIndex("fertility_ppm")) == 2000000L)
  }

  test("zipfSpectrumFit: hand-checked integer regression over a known spectrum") {
    // corpus engineered to a known spectrum:
    //   8 types seen once  (bin 0) -> y = ilog2(8) = 3
    //   4 types seen twice (bin 1) -> y = ilog2(4) = 2
    //   2 types seen 4x    (bin 2) -> y = ilog2(2) = 1
    //   1 type  seen 8x    (bin 3) -> y = ilog2(1) = 0
    // perfect Zipf doubling decay: slope exactly -1, intercept exactly 3
    val words =
      (1 to 8).map(i => s"once$i") ++
        (1 to 4).flatMap(i => Seq.fill(2)(s"twice$i")) ++
        (1 to 2).flatMap(i => Seq.fill(4)(s"four$i")) ++
        Seq.fill(8)("eight")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.zipfSpectrumFit(docs, "text").collect()(0)
    assert(r.getLong(r.fieldIndex("n_bins")) == 4L)
    assert(r.getLong(r.fieldIndex("slope_num")) == -20L) // 4*4 - 6*6
    assert(r.getLong(r.fieldIndex("slope_den")) == 20L) // 4*14 - 36
    assert(r.getDouble(r.fieldIndex("slope")) == -1.0)
    assert(r.getDouble(r.fieldIndex("intercept")) == 3.0)
  }

  test("zipfSpectrumFit: degenerate single-bin corpus yields null slope") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // all counts 1
    val r = TextAnalysis.zipfSpectrumFit(docs, "text").collect()(0)
    assert(r.getLong(r.fieldIndex("n_bins")) == 1L)
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.isNullAt(r.fieldIndex("intercept")))
  }

  test("fertilityByScript: one fused scan — no join, no pre-aggregate shuffle") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextAnalysis.fertilityByScript(corpus, "doc_id", "text",
        Array(Array("a", "b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"fused projection must not join:\n$plan")
    // exactly the one aggregate exchange (per-dominant hash agg)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("script_counts") && plan.contains("bpe_segment"), plan)
  }
}
