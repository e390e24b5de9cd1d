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
  * Segmentation is a cost-based Viterbi lattice (the Kuromoji/MeCab
  * algorithm): at every position all dictionary prefixes (user dict and
  * embedded dict) plus unknown same-class character runs enter the lattice
  * as edges, and dynamic programming over (position, connection class)
  * picks the globally cheapest path under JaCosts' class-transition matrix.
  * User-dictionary edges carry strongly negative costs, so they win their
  * span in every mode (the Kuromoji user-dict contract); SEARCH/EXTENDED
  * add the Kuromoji long-token penalty so lexicalized compounds decompose
  * into known sub-words. Connection costs are a compact class-transition
  * matrix rather than mecab-ipadic's corpus-trained id matrices — the
  * remaining documented divergence from the reference (SURVEY.md §7.4).
  * Filter chain, in reference order:
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
        // maximal punctuation-free region: the lattice unit (tokens never
        // span punctuation; discardPunctuation=true per the reference)
        var end = i + Character.charCount(cp)
        while (end < n && CharClasses.classOfCp(line.codePointAt(end)) != CharClasses.Punct)
          end += Character.charCount(line.codePointAt(end))
        segmentRegion(line, i, end, out)
        i = end
      }
    }
    out.toArray
  }

  private final val Inf = Int.MaxValue / 4
  private final val MaxUnknownCp = 24 // unknown-edge prefix lengths generated per position

  private val searchMode = mode != JaMode.Normal

  /** Viterbi over one punctuation-free region [from, end): states are
    * (position, connection class); edges are dictionary matches (all prefix
    * lengths), user-dictionary matches, and unknown same-class run
    * prefixes. The cheapest path under JaCosts is backtracked and emitted
    * through the T2–T7 filter chain.
    */
  private def segmentRegion(line: String, from: Int, end: Int,
      out: ArrayBuffer[String]): Unit = {
    val L = end - from
    val C = JaCosts.NumClasses
    val size = (L + 1) * C
    val cost = new Array[Int](size)
    java.util.Arrays.fill(cost, Inf)
    val bpStart = new Array[Int](size) // region-relative start of best edge into state
    val bpEntry = new Array[DictEntry](size) // null = unknown edge
    val bpUser = new Array[Boolean](size)
    val bpSrc = new Array[Int](size) // predecessor class
    cost(JaCosts.BOS) = 0

    // relax one edge [pos, pos+len) of class `ecls` with word cost `w`
    def relax(pos: Int, len: Int, ecls: Int, w: Int, e: DictEntry, user: Boolean): Unit = {
      if (pos + len > L) return // user surfaces may contain punct; never cross the region
      val rowBase = pos * C
      val idx = (pos + len) * C + ecls
      var src = 0
      while (src < C) {
        val sc = cost(rowBase + src)
        if (sc < Inf) {
          val t = sc + JaCosts.conn(src)(ecls) + w
          if (t < cost(idx)) {
            cost(idx) = t
            bpStart(idx) = pos
            bpEntry(idx) = e
            bpUser(idx) = user
            bpSrc(idx) = src
          }
        }
        src += 1
      }
    }

    var pos = 0
    while (pos < L) {
      // skip dead positions (incl. trailing-surrogate offsets)
      var alive = false
      var c = 0
      while (c < C && !alive) { if (cost(pos * C + c) < Inf) alive = true; c += 1 }
      if (alive) {
        val abs = from + pos
        if (userTrie != null) userTrie.matchesAt(line, abs, { e =>
          val cpLen = e.surface.codePointCount(0, e.surface.length)
          relax(pos, e.surface.length, JaCosts.classOf(e), JaCosts.userCost(cpLen), e, true)
        })
        dict.matchesAt(line, abs, { e =>
          val cpLen = e.surface.codePointCount(0, e.surface.length)
          var w = JaCosts.dictCost(e, cpLen)
          if (searchMode) w += JaCosts.searchPenalty(allKanji(e.surface), cpLen)
          relax(pos, e.surface.length, JaCosts.classOf(e), w, e, false)
        })
        // unknown edges: every code-point prefix of the same-class run
        // (capped), plus the full run so long runs can stay whole
        val cls = CharClasses.classOfCp(line.codePointAt(abs))
        val ecls = if (cls == CharClasses.Digit) JaCosts.Num else JaCosts.Unknown
        val kanji = cls == CharClasses.Kanji
        var j = abs + Character.charCount(line.codePointAt(abs))
        var cpLen = 1
        var emit = true
        while (emit) {
          var w = JaCosts.unknownCost(cls, cpLen)
          if (searchMode) w += JaCosts.searchPenalty(kanji, cpLen)
          relax(pos, j - abs, ecls, w, null, false)
          if (j < end && CharClasses.classOfCp(line.codePointAt(j)) == cls) {
            if (cpLen < MaxUnknownCp) {
              j += Character.charCount(line.codePointAt(j))
              cpLen += 1
            } else {
              // jump to the run end and emit one final whole-run edge
              while (j < end && CharClasses.classOfCp(line.codePointAt(j)) == cls) {
                j += Character.charCount(line.codePointAt(j))
                cpLen += 1
              }
            }
          } else emit = false
        }
      }
      pos += 1
    }

    // best terminal state
    var bestCls = -1
    var best = Inf
    var c = 0
    while (c < C) {
      val t = cost(L * C + c)
      if (t < Inf && t + JaCosts.eos(c) < best) { best = t + JaCosts.eos(c); bestCls = c }
      c += 1
    }
    if (bestCls < 0) return // unreachable: length-1 unknown edges connect everything

    // backtrack, then emit forward
    val path = new ArrayBuffer[Int](8) // state indices, reverse order
    var p = L
    var cl = bestCls
    while (p > 0) {
      val idx = p * C + cl
      path += idx
      val np = bpStart(idx)
      cl = bpSrc(idx)
      p = np
    }
    var k = path.length - 1
    while (k >= 0) {
      val idx = path(k)
      val e = bpEntry(idx)
      if (e != null) emitEntry(e, bpUser(idx), out)
      else {
        val tokenEnd = from + idx / C
        emitUnknown(line.substring(from + bpStart(idx), tokenEnd), out)
      }
      k -= 1
    }
  }

  private def allKanji(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (CharClasses.classOfCp(cp) != CharClasses.Kanji) return false
      i += Character.charCount(cp)
    }
    s.nonEmpty
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
