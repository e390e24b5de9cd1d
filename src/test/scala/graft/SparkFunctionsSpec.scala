package graft

import org.apache.spark.sql.{AnalysisException, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Spark call surface of tokenize_ja_neologd: SQL registration, const-arg
  * enforcement (reference initialize-time errors, TEST:39–190), null
  * propagation, zero-arg version form, UDTF shape via explode.
  */
class SparkFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SQL: defaults produce the G1 sequence") {
    val row = spark.sql(
      """SELECT tokenize_ja_neologd('10日放送の「中居正広のミになる図書館」（テレビ朝日系）で、SMAPの中居正広が、篠原信一の過去の勘違いを明かす一幕があった。') AS t"""
    ).head()
    assert(row.getSeq[String](0) == Seq("10日", "放送", "中居正広の身になる図書館", "テレビ朝日",
      "系", "smap", "中居正広", "篠原信一", "過去", "勘違い", "明かす", "一幕"))
  }

  test("SQL: zero-arg call returns 1-element version array (G6)") {
    val r = spark.sql("SELECT tokenize_ja_neologd() AS v").head().getSeq[String](0)
    assert(r == Seq(GraftVersion.value))
  }

  test("SQL: null line → null, not empty array (G7/A9)") {
    val r = spark.sql("SELECT tokenize_ja_neologd(CAST(NULL AS STRING)) AS t").head()
    assert(r.isNullAt(0))
  }

  test("SQL: empty line → empty array, distinct from null") {
    val r = spark.sql("SELECT tokenize_ja_neologd('') AS t").head()
    assert(!r.isNullAt(0) && r.getSeq[String](0).isEmpty)
  }

  test("SQL: 2–5 arg forms with null constants meaning defaults (arity matrix)") {
    val q = Seq(
      "SELECT tokenize_ja_neologd('テストです。', 'normal')",
      "SELECT tokenize_ja_neologd('テストです。', NULL)",
      "SELECT tokenize_ja_neologd('テストです。', 'search', NULL)",
      "SELECT tokenize_ja_neologd('テストです。', 'search', array('テスト'), NULL)",
      "SELECT tokenize_ja_neologd('テストです。', NULL, NULL, NULL, NULL)")
    q.foreach(sql => spark.sql(sql).collect())
    val filtered = spark.sql(
      "SELECT tokenize_ja_neologd('テストです。', 'normal', array('テスト'), NULL)")
      .head().getSeq[String](0)
    assert(filtered.isEmpty)
  }

  test("SQL: user dict as const array works in SQL (G3)") {
    val r = spark.sql(
      """SELECT tokenize_ja_neologd('日本経済新聞。', NULL, NULL, NULL,
        |  array('日本経済新聞,日本 経済 新聞,ニホン ケイザイ シンブン,カスタム名詞')) AS t""".stripMargin)
      .head().getSeq[String](0)
    assert(r == Seq("日本", "経済", "新聞"))
  }

  test("analysis error: >5 args (A2, UDF:87–91)") {
    val e = intercept[AnalysisException](
      spark.sql("SELECT tokenize_ja_neologd('a','b',NULL,NULL,NULL,'x')").collect())
    assert(e.getMessage.contains("at most 5"))
  }

  test("analysis error: invalid mode string (G8, UDF:188)") {
    val e = intercept[AnalysisException](
      spark.sql("SELECT tokenize_ja_neologd('a', 'unsupported mode')").collect())
    assert(e.getMessage.contains("NORMAL|SEARCH|EXTENDED|DEFAULT"))
  }

  test("analysis error: non-constant mode argument (G9, const-OI contract)") {
    val df = Seq(("こんにちは", "normal")).toDF("line", "m")
    val e = intercept[AnalysisException] {
      df.createOrReplaceTempView("g9")
      spark.sql("SELECT tokenize_ja_neologd(line, m) FROM g9").collect()
    }
    assert(e.getMessage.contains("constant"))
  }

  test("analysis error: wrong-typed user dict (G9, UDF:107–110)") {
    val e = intercept[AnalysisException](
      spark.sql("SELECT tokenize_ja_neologd('a', NULL, NULL, NULL, 42)").collect())
    assert(e.getMessage.toLowerCase.contains("user dictionary"))
  }

  test("Column API + explode (UDTF consumption shape, README:29)") {
    val df = Seq("テレビ朝日の放送", "サーバーのテスト").toDF("text")
    val toks = df.select(explode(graft.functions.tokenize_ja_neologd(col("text"))).as("tok"))
      .collect().map(_.getString(0)).toSeq
    assert(toks == Seq("テレビ朝日", "放送", "サーバ", "テスト"))
  }

  test("deterministic + constant-foldable: literal input folds at plan time") {
    val df = spark.sql("SELECT tokenize_ja_neologd('放送') AS t")
    val plan = df.queryExecution.optimizedPlan.toString
    // after constant folding the plan should carry the literal result
    assert(!plan.toLowerCase.contains("tokenize_ja_neologd") || df.head().getSeq[String](0) == Seq("放送"))
  }

  test("graft_hash64: matches the documented polynomial over code points") {
    def ref(s: String): Long = {
      var h = 0L
      s.codePoints().forEach(cp => h = (h * 131 + cp) % 1000000007L)
      h
    }
    val r = spark.sql("SELECT graft_hash64('spark join merge') AS h").head().getLong(0)
    assert(r == ref("spark join merge"))
    assert(spark.sql("SELECT graft_hash64('') AS h").head().getLong(0) == 0L)
  }

  test("cosine_sim: exact on known vectors; null on mismatch/zero") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(0.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(r) < 1e-15)
    val same = spark.sql(
      "SELECT cosine_sim(array(CAST(0.5 AS FLOAT), CAST(0.5 AS FLOAT)), array(CAST(0.5 AS FLOAT), CAST(0.5 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(same - 1.0) < 1e-12)
    val z = spark.sql(
      "SELECT cosine_sim(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS c").head()
    assert(z.isNullAt(0))
    // a null ELEMENT must yield null, not read as 0.0 (code-review finding)
    val ne = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c").head()
    assert(ne.isNullAt(0))
  }

  test("shingle_hashes equals hashing the string shingles (fusion is transparent)") {
    val df = Seq("a b c d e f g h", "short text", "", "x").toDF("text")
    val fused = df.select(graft.functions.shingle_hashes(col("text"), 6).as("h"))
      .collect().map(_.getSeq[Long](0)).toSeq
    val viaStrings = df.select(
      transform(
        when(size(split(col("text"), " ")) >= 6,
          sequence(lit(1), size(split(col("text"), " ")) - 5)).otherwise(array().cast("array<int>")),
        i => graft.functions.graft_hash64(
          concat_ws(" ", slice(split(col("text"), " "), i, lit(6))))).as("h"))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(fused == viaStrings)
    assert(fused(1).isEmpty && fused(2).isEmpty)
  }

  test("rolling_window_hashes: count/order contract, O(n) roll equals direct recompute, dup flags match the md5 form") {
    val texts = Seq("a b c d e f g h", "short text", "", "x",
      "a b c d u1 u2 u3 u4 u5 a b c d", // within-text repeat of "a b c d"
      "p q r c d e f g h w v u")
    val df = texts.toDF("text")
    val rolled = df.select(graft.functions.rolling_window_hashes(col("text"), 4).as("h"))
      .collect().map(_.getSeq[Array[Byte]](0).map(_.toSeq)).toSeq
    // count contract: n - win + 1 windows under split(" ", -1), empty when short
    val nToks = texts.map(_.split(" ", -1).length)
    assert(rolled.map(_.length) == nToks.map(n => math.max(0, n - 3)).zip(texts)
      .map { case (c, t) => if (t.split(" ", -1).length < 4) 0 else c })
    // equal windows get equal fingerprints, and only they do (test scale):
    // fingerprint-equality classes must exactly match window-string classes
    val fpToWin = for ((t, hs) <- texts.zip(rolled); (h, p) <- hs.zipWithIndex)
      yield (h, t.split(" ", -1).slice(p, p + 4).mkString(" "))
    assert(fpToWin.groupBy(_._1).forall(_._2.map(_._2).distinct.length == 1),
      "a fingerprint mapped to two different window strings (collision)")
    assert(fpToWin.groupBy(_._2).forall(_._2.map(_._1).distinct.length == 1),
      "one window string produced two fingerprints (roll drift)")
    // the O(1) rolling update agrees with a from-scratch recompute: windows
    // that only exist mid-text (reached via the roll) match their twins
    // reached at position 0 of another text ("c d e f" appears at pos 2 of
    // text 0 and pos 3 of text 5 — both mid-roll — plus the repeat pair)
    assert(rolled(0)(2) == rolled(5)(3))
    assert(rolled(4)(0) == rolled(4)(9))
  }

  test("rolling_window_hashes: leading-NUL tokens do not collide (nonzero seed)") {
    // ADVICE r16: with an h=0 seed, U+0000 contributed nothing to the
    // per-token polynomial, so NUL+'a' == 'a' and '' == NUL
    // deterministically — a raw-web-corpus hazard outside the 2^-128
    // birthday math. The seed-1 polynomial distinguishes all four.
    val texts = Seq("a b", "\u0000a b", "c ", "c \u0000")
    val heads = texts.toDF("text")
      .select(graft.functions.rolling_window_hashes(col("text"), 2).as("h"))
      .collect().map(_.getSeq[Array[Byte]](0).head.toSeq)
    assert(heads(0) != heads(1), "'a b' and '\\0a b' windows must differ")
    assert(heads(2) != heads(3), "trailing '' and trailing NUL windows must differ")
  }

  test("vector helpers: dot/l2_norm/l2_normalize built-ins match cosine_sim") {
    val df = Seq((Seq(3f, 4f), Seq(4f, 3f))).toDF("a", "b")
    val r = df.select(
      graft.functions.dot_product(col("a"), col("b")).as("dot"),
      graft.functions.l2_norm(col("a")).as("na"),
      graft.functions.cosine_sim(col("a"), col("b")).as("cos"),
      graft.functions.l2_norm(graft.functions.l2_normalize(col("a"))).as("unit")).head()
    assert(r.getDouble(0) == 24.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 24.0 / 25.0) < 1e-15)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
  }

  test("flagship entry() answers on sf0.001 (driver smoke)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0 && rows.forall(_.getLong(1) > 0))
  }

  test("SQL registry exposes simhash64 / shingle_hashes / l2_normalize") {
    Graft.register(spark)
    Seq((1L, "a b c d e f g")).toDF("id", "text").createOrReplaceTempView("fn_sql")
    val row = spark.sql(
      """SELECT simhash64(text, 30) AS sh,
        |       size(shingle_hashes(text, 6)) AS nsh,
        |       round(aggregate(l2_normalize(array(3.0D, 4.0D)),
        |                       0.0D, (a, x) -> a + x * x), 9) AS unit
        |FROM fn_sql""".stripMargin).head()
    val direct = Seq((1L, "a b c d e f g")).toDF("id", "text")
      .select(graft.functions.simhash64(org.apache.spark.sql.functions.col("text"), 30))
      .head().getLong(0)
    assert(row.getLong(0) == direct)
    assert(row.getInt(1) == 2) // 7 tokens -> two 6-shingles
    assert(row.getDouble(2) == 1.0) // unit norm after normalization
  }

  test("tokenize_ja_neologd generated code compiles under forced codegen (no fallback)") {
    // CODEGEN_ONLY makes a Janino compile failure of doGenCode's output an
    // error instead of a silent interpreted fallback (VERDICT r6 #5).
    // newSession(): isolated SQLConf over the shared context \u2014 suites run
    // in parallel against TestSpark.spark, so never mutate its conf.
    val s = spark.newSession()
    graft.Graft.register(s)
    s.conf.set("spark.sql.codegen.wholeStage", "true")
    s.conf.set("spark.sql.codegen.fallback", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    import s.implicits._
    val out = Seq("\u4eca\u65e5\u306f\u3044\u3044\u5929\u6c17\u3060", "", null.asInstanceOf[String])
      .toDF("line")
      .select(graft.functions.tokenize_ja_neologd($"line").as("toks"))
      .collect()
    assert(out.length == 3)
    assert(out(0).getSeq[String](0).nonEmpty)
    assert(out(1).getSeq[String](0).isEmpty)
    assert(out(2).isNullAt(0))
    val version = s.sql("SELECT tokenize_ja_neologd() AS v").head().getSeq[String](0)
    assert(version.head == graft.GraftVersion.value)
  }
}
