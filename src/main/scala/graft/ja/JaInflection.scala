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

  def expandVerb(base: String, cls: Char, pos: String = "動詞-自立"): Seq[DictEntry] =
    if (cls == 'i') {
      val stem = base.dropRight(1)
      Seq(
        DictEntry(base, pos, "", Array.empty),
        DictEntry(stem, pos, base, Array.empty), // 未然/連用: 食べ(ない/ます/た)
        DictEntry(stem + "れ", pos, base, Array.empty), // 仮定: 食べれ(ば)
        DictEntry(stem + "よ", pos, base, Array.empty)) // 意向: 食べよ(う)
    } else {
      val (a, i, e, o, onbin) = godan(cls)
      val stem = base.dropRight(1)
      val forms = (Seq(a.toString, i.toString, e.toString, o.toString) ++
        (if (onbin.nonEmpty) Seq(onbin) else Nil)).distinct
      // Potential verb (話す→話せる) as its own dictionary-form lexeme with
      // itself as lemma — ipadic lexicalizes potentials as independent
      // 一段 verbs, and without the entry 話せる degrades to 話+せ+る
      // (noun + filtered auxiliaries). Its inflected stem (話せ) already
      // exists as the 仮定 form mapped to the godan base — a same-class
      // homograph the compact cost model cannot split (documented
      // divergence); the dictionary form is the high-frequency win.
      (DictEntry(base, pos, "", Array.empty) +:
        forms.map(f => DictEntry(stem + f, pos, base, Array.empty))) :+
        DictEntry(stem + e + "る", pos, "", Array.empty)
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
