package graft.tools

/** Katakana-compound fragility audit (the round-12 フォークリフト lesson):
  * a pinned corpus sentence whose katakana run currently parses as ONE
  * token via an unknown-run merge silently re-segments the moment any
  * fragment of it enters the dictionary. For each run from the pinned
  * corpora (args(1), one per line), report whether it is (a) a dictionary
  * surface, (b) an atomic UNK merge — the fragile class to lexicalize —
  * or (c) a multi-token split (pinned compositional — must NOT be added).
  * Usage: runMain graft.tools.KatAudit <out> <runs-file>
  */
object KatAudit {
  def main(args: Array[String]): Unit = {
    val tok = new graft.ja.JaTokenizer()
    val surfaces = graft.ja.JaDictionary.embeddedEntries.map(_.surface).toSet
    val w = new java.io.PrintWriter(OutPath.checked(args(0)), "UTF-8")
    scala.io.Source.fromFile(args(1), "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).foreach { run =>
        val kind =
          if (surfaces.contains(run)) "DICT"
          else {
            val toks = tok.tokenize(run).toSeq
            if (toks.length == 1) "FRAGILE" else s"SPLIT:${toks.mkString("|")}"
          }
        w.println(s"$kind\t$run")
      }
    w.close()
  }
}
