package graft.ja

/** Offline inflection-paradigm expansion for the embedded dictionary: each
  * verb/adjective lexeme in the seed resources expands into its conjugated
  * surface forms, every non-terminal form carrying the base form so T2
  * base-form mapping works off-corpus (the reference gets this from
  * mecab-ipadic-NEologd's per-form entries; we generate the paradigms).
  *
  * Verb classes follow school-grammar godan rows plus ichidan:
  *   k/g/s/t/n/b/m/r/w — godan, keyed by the final-syllable row
  *   i               — ichidan (る-dropping)
  * Generated forms: 終止/連体 (the base itself), 未然 (stem+a-row),
  * 連用 (stem+i-row), 仮定/命令 (stem+e-row), 意向 (stem+o-row), and the
  * 音便 (euphonic) 連用タ接続 stem (書い/使っ/読ん) that precedes た/て.
  */
object JaInflection {

  // class -> (未然, 連用, 仮定, 意向, 音便)
  private val godan: Map[Char, (Char, Char, Char, Char, String)] = Map(
    'k' -> ('か', 'き', 'け', 'こ', "い"),
    'g' -> ('が', 'ぎ', 'げ', 'ご', "い"),
    's' -> ('さ', 'し', 'せ', 'そ', ""), // 音便 = 連用 (話し+た)
    't' -> ('た', 'ち', 'て', 'と', "っ"),
    'n' -> ('な', 'に', 'ね', 'の', "ん"),
    'b' -> ('ば', 'び', 'べ', 'ぼ', "ん"),
    'm' -> ('ま', 'み', 'め', 'も', "ん"),
    'r' -> ('ら', 'り', 'れ', 'ろ', "っ"),
    'w' -> ('わ', 'い', 'え', 'お', "っ"))

  /** The godan 仮定/命令 form (stem+e-row) carries a distinguishable POS
    * (`-仮定` suffix → its own lattice connection class). Without it, the
    * e-row surface collides with a sibling ichidan verb's 未然/連用 stem
    * under the loader's (surface, pos) dedupe — 届け(→届く 仮定) silently
    * shadowed 届け(→届ける 連用), so 届けた lemmatized to 届く. With the
    * distinct POS both readings coexist and the connection matrix decides:
    * 仮定+ば is cheap, 仮定+た is penalized (ungrammatical 命令+た), so the
    * ichidan reading wins before た/て and the godan one before ば.
    */
  final val CondPos = "動詞-自立-仮定"

  def expandVerb(base: String, cls: Char, pos: String = "動詞-自立"): Seq[DictEntry] =
    if (cls == 'i') {
      val stem = base.dropRight(1)
      Seq(
        DictEntry(base, pos, "", Array.empty),
        DictEntry(stem, pos, base, Array.empty), // 未然/連用: 食べ(ない/ます/た)
        DictEntry(stem + "れ", CondPos, base, Array.empty), // 仮定: 食べれ(ば)
        DictEntry(stem + "よ", pos, base, Array.empty)) // 意向: 食べよ(う)
    } else {
      val (a, i, e, o, onbin) = godan(cls)
      val stem = base.dropRight(1)
      val condForm = e.toString
      val forms = (Seq(a.toString, i.toString, o.toString) ++
        (if (onbin.nonEmpty) Seq(onbin) else Nil)).distinct.filterNot(_ == condForm)
      // Potential verb (話す→話せる) as its own dictionary-form lexeme with
      // itself as lemma — ipadic lexicalizes potentials as independent
      // 一段 verbs, and without the entry 話せる degrades to 話+せ+る
      // (noun + filtered auxiliaries). Its inflected stem (話せ) already
      // exists as the 仮定 form mapped to the godan base — a same-class
      // homograph the compact cost model cannot split (documented
      // divergence); the dictionary form is the high-frequency win.
      (DictEntry(base, pos, "", Array.empty) +:
        (DictEntry(stem + condForm, CondPos, base, Array.empty) +:
          forms.map(f => DictEntry(stem + f, pos, base, Array.empty)))) ++
        Seq(
          // potential verb as its own 一段 lexeme (話せる) …
          DictEntry(stem + e + "る", pos, "", Array.empty),
          // … and its 未然/連用 stem (話せ+ます/ない/た → 話せる). The
          // surface equals the 仮定 form above but the POS differs, so both
          // readings survive the loader dedupe and the connection matrix
          // disambiguates (仮定+ば vs 連用+Aux). For a godan with a true
          // ichidan sibling (届く/届ける) this entry IS the sibling's 連用
          // stem — same (surface, pos, base) — so the dedupe keeps one.
          DictEntry(stem + e, pos, stem + e + "る", Array.empty))
    }

  /** い-adjective: 終止/連体 (base), 連用 (〜く), 連用タ接続 (〜かっ),
    * 仮定 (〜けれ), and the 〜さ degree nominalization (明るさ, 高さ) as a
    * noun lexeme — without it the stem is an unknown run and the さ
    * nominalizer tears (明|るさ).
    */
  def expandAdj(base: String): Seq[DictEntry] = {
    val stem = base.dropRight(1)
    Seq(
      DictEntry(base, "形容詞-自立", "", Array.empty),
      DictEntry(stem + "く", "形容詞-自立", base, Array.empty),
      DictEntry(stem + "かっ", "形容詞-自立", base, Array.empty),
      DictEntry(stem + "けれ", "形容詞-自立", base, Array.empty),
      DictEntry(stem + "さ", "名詞-一般", "", Array.empty))
  }
}
