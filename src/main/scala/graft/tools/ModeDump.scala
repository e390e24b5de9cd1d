package graft.tools

import graft.ja.{JaGolden, JaMode, JaTokenizer}

/** One-off helper for corpus review: prints NORMAL/SEARCH/EXTENDED outputs
  * for every golden sentence so mode-variant expectations can be reviewed
  * and pinned into the corpus TSV (VERDICT r2 "Next round" #4).
  */
object ModeDump {
  def main(args: Array[String]): Unit = {
    val outPath = if (args.nonEmpty) args(0) else "/tmp/modedump.tsv"
    val w = new java.io.PrintWriter(OutPath.checked(outPath), "UTF-8")
    val normal = new JaTokenizer()
    val search = new JaTokenizer(mode = JaMode.Search)
    val ext = new JaTokenizer(mode = JaMode.Extended)
    def dump(sid: String, sentence: String, divergentOnly: Boolean): Unit = {
      val n = normal.tokenize(sentence).mkString("|")
      val s = search.tokenize(sentence).mkString("|")
      val e = ext.tokenize(sentence).mkString("|")
      if (!divergentOnly || s != n || e != n)
        w.println(s"$sid\t$sentence\tN=$n\tS=$s\tE=$e")
    }
    if (args.length > 1) {
      // candidate sentences (one per line) — dump ALL, not just divergent
      scala.io.Source.fromFile(args(1), "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).zipWithIndex
        .foreach { case (l, i) => dump(s"c${i + 1}", l, divergentOnly = false) }
    } else {
      JaGolden.corpus.foreach(g => dump(g.sid.toString, g.sentence, divergentOnly = true))
    }
    w.close()
  }
}
