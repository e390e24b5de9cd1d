package graft.ja

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator property tests (SURVEY.md §5): determinism,
  * null/empty laws, filter monotonicity, normalization idempotence — over
  * generated mixed Japanese/ASCII text. (Plain Gen sampling with a fixed
  * seed: scalatestplus is not on the offline classpath.)
  */
class TokenizerPropertiesSpec extends AnyFunSuite {

  private val jaChunk = Gen.oneOf(
    "放送", "テスト", "の", "です", "図書館", "サーバー", "きゃりー", "第二",
    "使った", "10日", "ＳＭＡＰ", "。", "、", "ー", "hello", "Spark3", " ",
    "魑魅", "ｻｰﾋﾞｽ", "テレビ朝日", "過去の", "spark")
  private val textGen: Gen[String] = Gen.listOf(jaChunk).map(_.mkString)

  /** 300 deterministic samples per property. */
  private def forAllTexts(f: String => Unit): Unit = {
    var seed = Seed(42L)
    (1 to 300).foreach { i =>
      val s = textGen.pureApply(Gen.Parameters.default.withSize(i % 40), seed)
      seed = seed.next
      f(s)
    }
  }

  private val default = new JaTokenizer()
  private val noFilters = new JaTokenizer(JaMode.Normal, Set.empty, Set.empty)

  test("property: tokenization is deterministic") {
    forAllTexts { s =>
      assert(default.tokenize(s).toSeq == default.tokenize(s).toSeq)
    }
  }

  test("property: filtered output is a sub-multiset of unfiltered output") {
    forAllTexts { s =>
      val filtered = default.tokenize(s).toSeq
      val unfiltered = noFilters.tokenize(s).toSeq
      val counts = unfiltered.groupBy(identity).view.mapValues(_.size).toMap
      val fCounts = filtered.groupBy(identity).view.mapValues(_.size).toMap
      fCounts.foreach { case (tok, n) =>
        assert(counts.getOrElse(tok, 0) >= n, s"token '$tok' of input '$s'")
      }
    }
  }

  test("property: no token is empty, whitespace, or punctuation-only") {
    forAllTexts { s =>
      default.tokenize(s).foreach { tok =>
        assert(tok.nonEmpty && !tok.forall(CharClasses.isPunct), s"input '$s'")
      }
    }
  }

  test("property: output is lowercase and width-folded (T4+T7 idempotent)") {
    forAllTexts { s =>
      default.tokenize(s).foreach { tok =>
        assert(tok == tok.toLowerCase, s"input '$s'")
        assert(tok == CharClasses.foldWidth(tok), s"input '$s'")
      }
    }
  }

  test("property: tokenize(a ++ '。' ++ b) == tokenize(a) ++ tokenize(b)") {
    forAllTexts { s =>
      val half = s.length / 2
      val (a, b) = (s.substring(0, half), s.substring(half))
      // only valid when the split doesn't cut a surrogate pair / token run;
      // punctuation is a hard segmentation boundary, so compare via the
      // joined form against itself re-tokenized
      val joined = default.tokenize(a + "。" + b).toSeq
      val parts = default.tokenize(a).toSeq ++ default.tokenize(b).toSeq
      // boundary effects can merge runs across the cut in `parts`; assert
      // the stronger law only on chunk-aligned inputs
      if (a.isEmpty || b.isEmpty || CharClasses.isPunct(a.last) || CharClasses.isPunct(b.head)
        || CharClasses.classOf(a.last) != CharClasses.classOf(b.head))
        assert(joined == parts, s"a='$a' b='$b'")
    }
  }

  test("property: EXTENDED output token count >= NORMAL count") {
    val ext = new JaTokenizer(JaMode.Extended)
    forAllTexts { s =>
      assert(ext.tokenize(s).length >= default.tokenize(s).length, s"input '$s'")
    }
  }

  test("property: stopword sets only remove, never add") {
    val custom = new JaTokenizer(JaMode.Normal, Set("テスト", "spark"), null)
    val base = new JaTokenizer(JaMode.Normal, Set.empty, null)
    forAllTexts { s =>
      val c = custom.tokenize(s).toSeq
      val b = base.tokenize(s).toSeq
      assert(c.size <= b.size, s"input '$s'")
      assert(!c.contains("テスト") && !c.contains("spark"), s"input '$s'")
    }
  }

  test("property: every godan e-row stem + ます lemmatizes to the potential verb") {
    // 話せます → 話せる, 書けます → 書ける, … for EVERY godan lexeme: the
    // e-row surface is a (仮定形, potential-連用) homograph and the lattice
    // must pick the potential before an auxiliary (the dedupe-shadowing
    // regression class fixed in round 6). Run with empty stop sets so ます
    // itself can't mask a failure.
    val tok = new JaTokenizer(stopWords = Set.empty, stopTags = Set.empty)
    val eRow = Map('k' -> 'け', 'g' -> 'げ', 's' -> 'せ', 't' -> 'て',
      'n' -> 'ね', 'b' -> 'べ', 'm' -> 'め', 'r' -> 'れ', 'w' -> 'え')
    val verbs = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/ja/lexemes/verbs.tsv"), "UTF-8")
      .getLines().map(_.replaceAll("#.*$", "").trim).filter(_.nonEmpty)
      .map(_.split("\t")).collect { case Array(base, cls) if cls != "i" =>
        (base.trim, cls.trim.charAt(0))
      }.toSeq
    val failures = verbs.flatMap { case (base, cls) =>
      val potential = base.dropRight(1) + eRow(cls) + "る"
      val toks = tok.tokenize(base.dropRight(1) + eRow(cls) + "ます")
      // the potential lemma must be the FIRST token; a compound verb's
      // internal boundary re-parse would surface here as a different head
      if (toks.headOption.contains(potential)) None
      else Some(s"$base($cls): got ${toks.mkString("|")}, want $potential")
    }
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
  }
}
