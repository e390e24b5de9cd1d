package graft.ja

import scala.collection.mutable
import scala.io.Source

/** One dictionary morpheme.
  *
  * @param surface  the matched text
  * @param pos      hierarchical part-of-speech tag, '-'-separated
  * @param base     output form (inflection base form / NEologd normalized
  *                 form, reference T2/T8); defaults to surface
  * @param segments decomposition emitted in SEARCH/EXTENDED modes (Kuromoji
  *                 compound decomposition) — empty for atomic entries.
  *                 User-dictionary segments apply in every mode (that is the
  *                 Kuromoji user-dict contract, KuromojiNEologdUDFTest G3:
  *                 NORMAL mode still yields 日本|経済|新聞).
  */
final case class DictEntry(
    surface: String,
    pos: String,
    base: String,
    segments: Array[DictEntry]) {
  def output: String = if (base.nonEmpty) base else surface
}

/** Immutable char-trie over dictionary surfaces — prefix enumeration without
  * substring allocation. A surface may carry SEVERAL entries (人 as noun vs
  * counter, で as particle vs auxiliary): the Viterbi lattice disambiguates
  * by context, so the trie hands back the full homograph set. Built once per
  * executor JVM (@transient lazy in the Spark expression, reference A8
  * semantics).
  */
final class DictTrie private (root: DictTrie.Node) {

  /** Invoke `f` for EVERY entry matching `s` at `from` (all prefix lengths,
    * shortest first; all homographs per length) — the lattice needs the full
    * candidate set, not just the longest match.
    */
  def matchesAt(s: CharSequence, from: Int, f: DictEntry => Unit): Unit = {
    var node = root
    var i = from
    while (i < s.length) {
      val child = node.children.getOrElse(s.charAt(i), null)
      if (child == null) return
      var es = child.entries
      while (es.nonEmpty) { f(es.head); es = es.tail }
      node = child
      i += 1
    }
  }
}

object DictTrie {
  private[ja] final class Node {
    val children = new mutable.HashMap[Char, Node]
    var entries: List[DictEntry] = Nil
  }

  def apply(entries: Iterable[DictEntry]): DictTrie = {
    val root = new Node
    entries.foreach { e =>
      var node = root
      e.surface.foreach { c =>
        node = node.children.getOrElseUpdate(c, new Node)
      }
      node.entries = node.entries :+ e
    }
    new DictTrie(root)
  }
}

/** Loaders for the embedded TSV dictionary and the default stop sets. */
object JaDictionary {

  private def resource(name: String): Iterator[String] = {
    val in = getClass.getResourceAsStream(s"/graft/ja/$name")
    require(in != null, s"missing resource graft/ja/$name")
    Source.fromInputStream(in, "UTF-8").getLines()
  }

  private def parseTsv(lines: Iterator[String]): Seq[DictEntry] =
    lines.map(_.replaceAll("#.*$", "").trim)
      .filter(_.nonEmpty)
      .map { line =>
        val f = line.split("\t", -1)
        val surface = f(0)
        val pos = if (f.length > 1) f(1) else "名詞-一般"
        val base = if (f.length > 2) f(2).trim else ""
        val segs =
          if (f.length > 3 && f(3).trim.nonEmpty)
            f(3).trim.split("\\s+").map(seg => DictEntry(seg, pos, "", Array.empty))
          else Array.empty[DictEntry]
        DictEntry(surface, pos, base, segs)
      }.toSeq

  /** Noun-lexeme marker → POS tag (lexemes/nouns.tsv, lexemes/katakana.txt). */
  private val nounPos = Map(
    "" -> "名詞-一般", "sv" -> "名詞-サ変接続", "adv" -> "名詞-副詞可能",
    "na" -> "名詞-形容動詞語幹", "pron" -> "名詞-代名詞",
    "place" -> "名詞-固有名詞-地域", "person" -> "名詞-固有名詞-人名",
    "org" -> "名詞-固有名詞-組織", "prop" -> "名詞-固有名詞-一般")

  private def parseNouns(name: String): Seq[DictEntry] =
    resource(name).map(_.replaceAll("#.*$", "").trim).filter(_.nonEmpty).map { line =>
      val f = line.split("\t", -1)
      val marker = if (f.length > 1) f(1).trim else ""
      DictEntry(f(0).trim, nounPos.getOrElse(marker,
        sys.error(s"$name: unknown noun marker '$marker' on '$line'")), "", Array.empty)
    }.toSeq

  private def parseVerbs(name: String): Seq[DictEntry] =
    resource(name).map(_.replaceAll("#.*$", "").trim).filter(_.nonEmpty).flatMap { line =>
      val f = line.split("\t", -1)
      require(f.length >= 2 && f(1).trim.length == 1, s"$name: bad verb line '$line'")
      JaInflection.expandVerb(f(0).trim, f(1).trim.charAt(0))
    }.toSeq

  private def parseAdjs(name: String): Seq[DictEntry] =
    resource(name).map(_.replaceAll("#.*$", "").trim).filter(_.nonEmpty)
      .flatMap(base => JaInflection.expandAdj(base)).toSeq

  /** Full embedded dictionary: engineered core (goldens + highest-priority
    * senses) first, then the generated lexeme expansion (SURVEY.md §7.4 /
    * VERDICT r1 #1: O(10k) morphemes so off-corpus Japanese segments through
    * the lattice instead of degrading to char-class runs). Deduped by
    * (surface, pos) — first occurrence wins, so core.tsv can pin a sense;
    * distinct POS homographs coexist and the lattice disambiguates.
    */
  lazy val embeddedEntries: Seq[DictEntry] = {
    val all = parseTsv(resource("core.tsv")) ++
      parseTsv(resource("lexemes/misc.tsv")) ++
      parseVerbs("lexemes/verbs.tsv") ++
      parseAdjs("lexemes/adjectives.txt") ++
      parseNouns("lexemes/nouns.tsv") ++
      parseNouns("lexemes/katakana.txt")
    val seen = mutable.HashSet.empty[(String, String)]
    all.filter(e => seen.add((e.surface, e.pos)))
  }
  lazy val embedded: DictTrie = DictTrie(embeddedEntries)

  /** Default stop words (lower-cased; matching is case-insensitive,
    * reference UDF:203).
    */
  lazy val defaultStopWords: Set[String] =
    resource("stopwords.txt").map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.toLowerCase).toSet

  /** Default stop POS tags (hierarchical prefixes). */
  lazy val defaultStopTags: Set[String] =
    resource("stoptags.txt").map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSet
}
