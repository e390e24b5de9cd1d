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

/** Immutable char-trie over dictionary surfaces — longest-match lookup
  * without substring allocation. Built once per executor JVM
  * (@transient lazy in the Spark expression, reference A8 semantics).
  */
final class DictTrie private (root: DictTrie.Node) {

  /** Longest entry matching `s` starting at `from`, or null. */
  def longestMatch(s: CharSequence, from: Int): DictEntry = {
    var node = root
    var best: DictEntry = null
    var i = from
    while (i < s.length) {
      val child = node.children.getOrElse(s.charAt(i), null)
      if (child == null) return best
      if (child.entry != null) best = child.entry
      node = child
      i += 1
    }
    best
  }
}

object DictTrie {
  private[ja] final class Node {
    val children = new mutable.HashMap[Char, Node]
    var entry: DictEntry = _
  }

  def apply(entries: Iterable[DictEntry]): DictTrie = {
    val root = new Node
    entries.foreach { e =>
      var node = root
      e.surface.foreach { c =>
        node = node.children.getOrElseUpdate(c, new Node)
      }
      node.entry = e
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

  lazy val embeddedEntries: Seq[DictEntry] = parseTsv(resource("core.tsv"))
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
