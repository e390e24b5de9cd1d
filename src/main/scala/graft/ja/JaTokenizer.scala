package graft.ja

import scala.collection.mutable.ArrayBuffer

/** Tokenization mode (reference A3, KuromojiNEologdUDF.java:171–192):
  * NORMAL | SEARCH | EXTENDED | DEFAULT, case-insensitive; null → NORMAL;
  * DEFAULT ≡ SEARCH (Lucene JapaneseTokenizer.DEFAULT_MODE, UDF:186).
  */
sealed trait JaMode
object JaMode {
  case object Normal extends JaMode
  case object Search extends JaMode
  case object Extended extends JaMode

  def parse(s: String): JaMode =
    if (s == null) Normal
    else s.toUpperCase match {
      case "NORMAL" => Normal
      case "SEARCH" => Search
      case "EXTENDED" => Extended
      case "DEFAULT" => Search
      case other => throw new IllegalArgumentException(
        s"Expected NORMAL|SEARCH|EXTENDED|DEFAULT but got an unexpected tokenization mode: $other")
    }
}

/** Japanese morphological tokenizer with the observable semantics of the
  * reference's `tokenize_ja_neologd` analyzer chain (SURVEY.md §2-A,
  * KuromojiNEologdUDF.java:131–163 building Lucene's JapaneseAnalyzer over
  * the NEologd dictionary).
  *
  * Segmentation is dictionary-first longest-match over (user dict ≻ embedded
  * dict) with character-class fallback runs for unknown text — the
  * documented divergence from Kuromoji's Viterbi lattice (SURVEY.md §7.4);
  * all golden sequences from the reference's tests/docs are covered by
  * explicit dictionary entries. Filter chain, in reference order:
  *
  *   T1 segmentation + punctuation discard (discardPunctuation=true)
  *   T2 base-form mapping (使った→使う; NEologd normalization T8)
  *   T3 part-of-speech stop filter (hierarchical tag match)
  *   T4 CJK width folding (ＳＭＡＰ→SMAP, half-width katakana→full)
  *   T5 stop-word filter (case-insensitive)
  *   T6 katakana prolonged-mark stemming (サーバー→サーバ, len≥4)
  *   T7 ASCII lowercase
  *
  * Thread-safe and immutable after construction; build once per executor
  * (@transient lazy, reference A8).
  *
  * @param stopWords null → default set; empty → no stop-word filtering
  *                  (reference A4, UDF:194–204)
  * @param stopTags  null → default set; empty → no POS filtering
  *                  (reference A5, UDF:206–228)
  */
final class JaTokenizer(
    mode: JaMode = JaMode.Normal,
    stopWords: Set[String] = null,
    stopTags: Set[String] = null,
    userDict: Seq[DictEntry] = Nil) extends Serializable {

  private val stopW: Set[String] =
    if (stopWords == null) JaDictionary.defaultStopWords else stopWords.map(_.toLowerCase)
  private val stopT: Set[String] =
    if (stopTags == null) JaDictionary.defaultStopTags else stopTags.filter(_ != null)
  private val userTrie: DictTrie = if (userDict.isEmpty) null else DictTrie(userDict)
  private val dict: DictTrie = JaDictionary.embedded

  /** Tokenize one line. Null handling (null→null) lives in the caller
    * (reference A9); empty string → empty array.
    */
  def tokenize(line: String): Array[String] = {
    val out = new ArrayBuffer[String](32) // reference preallocates 32, UDF:150
    var i = 0
    val n = line.length
    while (i < n) {
      val cp = line.codePointAt(i) // code-point-wise: surrogate pairs intact
      if (CharClasses.classOfCp(cp) == CharClasses.Punct) i += Character.charCount(cp) // T1
      else {
        val userHit = if (userTrie == null) null else userTrie.longestMatch(line, i)
        val dictHit0 = dict.longestMatch(line, i)
        val dictHit = if (allowHit(line, i, dictHit0)) dictHit0 else null
        // user dict wins ties; otherwise longest match wins
        val useUser = userHit != null &&
          (dictHit == null || userHit.surface.length >= dictHit.surface.length)
        val hit = if (useUser) userHit else dictHit
        if (hit != null) {
          emitEntry(hit, useUser, out)
          i += hit.surface.length
        } else {
          val end = unknownRunEnd(line, i)
          emitUnknown(line.substring(i, end), out)
          i = end
        }
      }
    }
    out.toArray
  }

  /** Guard against greedy single-kanji matches tearing apart unknown kanji
    * compounds (意見 → 意|見る, 今回 → 今|回): a 1-char kanji entry only
    * matches when the next char does NOT continue a kanji run. Number
    * prefixes (接頭詞) and numerals (名詞-数) are exempt — 第|二|引数 is the
    * correct segmentation (golden G5). User-dict hits always apply (the
    * user declared them). This replaces the cost-based disambiguation of
    * the reference's Viterbi lattice (documented divergence, SURVEY §7.4).
    */
  private def allowHit(line: String, i: Int, hit: DictEntry): Boolean = {
    if (hit == null) return false
    if (hit.surface.length > 1) return true
    if (CharClasses.classOf(line.charAt(i)) != CharClasses.Kanji) return true
    if (hit.pos.startsWith("接頭詞") || hit.pos == "名詞-数") return true
    i + 1 >= line.length ||
      CharClasses.classOfCp(line.codePointAt(i + 1)) != CharClasses.Kanji
  }

  /** End of the maximal same-class run starting at `from` (Kuromoji-style
    * unknown-word grouping by character class); advances by code points so
    * supplementary-plane kanji stay whole.
    */
  private def unknownRunEnd(line: String, from: Int): Int = {
    val cls = CharClasses.classOfCp(line.codePointAt(from))
    var i = from + Character.charCount(line.codePointAt(from))
    while (i < line.length && CharClasses.classOfCp(line.codePointAt(i)) == cls
      && !allowHit(line, i, dict.longestMatch(line, i))
      && (userTrie == null || userTrie.longestMatch(line, i) == null))
      i += Character.charCount(line.codePointAt(i))
    i
  }

  /** User-dictionary segmentation applies in every mode (G3: NORMAL mode
    * still yields 日本|経済|新聞); embedded compound entries decompose only
    * in SEARCH/EXTENDED (Kuromoji compound-decomposition penalty).
    */
  private def emitEntry(e: DictEntry, isUser: Boolean, out: ArrayBuffer[String]): Unit = {
    val decompose = e.segments.nonEmpty && (isUser || mode != JaMode.Normal)
    if (decompose) e.segments.foreach(seg => emitToken(seg.output, seg.pos, out))
    else emitToken(e.output, e.pos, out)
  }

  private def emitUnknown(run: String, out: ArrayBuffer[String]): Unit = {
    if (mode == JaMode.Extended && isCjk(run)) {
      // EXTENDED: unknown CJK runs are emitted as code-point unigrams
      // (Kuromoji JapaneseTokenizer EXTENDED mode).
      var i = 0
      while (i < run.length) {
        val cp = run.codePointAt(i)
        emitToken(new String(Character.toChars(cp)), unknownPos(run), out)
        i += Character.charCount(cp)
      }
    } else emitToken(run, unknownPos(run), out)
  }

  private def isCjk(run: String): Boolean = CharClasses.classOfCp(run.codePointAt(0)) match {
    case CharClasses.Kanji | CharClasses.Katakana | CharClasses.Hiragana => true
    case _ => false
  }

  private def unknownPos(run: String): String = CharClasses.classOfCp(run.codePointAt(0)) match {
    case CharClasses.Digit => "名詞-数"
    case _ => "名詞-一般"
  }

  /** Filters T2–T7 for a single candidate token; appends if it survives. */
  private def emitToken(term0: String, pos: String, out: ArrayBuffer[String]): Unit = {
    if (stopT.nonEmpty && stoppedPos(pos)) return // T3
    var term = CharClasses.foldWidth(term0) // T4
    if (stopW.nonEmpty && stopW.contains(term.toLowerCase)) return // T5
    term = CharClasses.stemKatakana(term) // T6
    term = term.toLowerCase // T7
    if (term.nonEmpty) out += term
  }

  private def stoppedPos(pos: String): Boolean = {
    if (stopT.contains(pos)) return true
    // hierarchical: a stop tag stops any finer-grained tag beneath it
    var i = pos.indexOf('-')
    while (i > 0) {
      if (stopT.contains(pos.substring(0, i))) return true
      i = pos.indexOf('-', i + 1)
    }
    false
  }
}
