package graft.tools

import graft.ja.{JaMode, JaTokenizer}

/** Regenerates the SEARCH/EXTENDED columns of golden_corpus.tsv rows whose
  * current mode pins no longer match (for mechanical unknown→dictionary
  * transitions after a lexeme batch). Writes a UTF-8 review file with
  * old→new diffs and a patched corpus copy; the caller inspects the diff
  * and replaces the resource only if every change is the expected class.
  * Usage: runMain graft.tools.ModeRegen <corpus.tsv> <outDiff> <outTsv>
  */
object ModeRegen {
  def main(args: Array[String]): Unit = {
    val search = new JaTokenizer(JaMode.Search)
    val ext = new JaTokenizer(JaMode.Extended)
    val diff = new java.io.PrintWriter(OutPath.checked(args(1)), "UTF-8")
    val out = new java.io.PrintWriter(OutPath.checked(args(2)), "UTF-8")
    var changed = 0
    scala.io.Source.fromFile(args(0), "UTF-8").getLines().foreach { line =>
      if (line.startsWith("#") || line.trim.isEmpty || line.split("\t").length != 4)
        out.println(line)
      else {
        val f = line.split("\t", -1)
        val (sent, norm) = (f(0), f(1))
        val ns = search.tokenize(sent).mkString("|")
        val ne = ext.tokenize(sent).mkString("|")
        if (ns != f(2) || ne != f(3)) {
          changed += 1
          diff.println(s"$sent")
          if (ns != f(2)) diff.println(s"  SEARCH   ${f(2)}  ->  $ns")
          if (ne != f(3)) diff.println(s"  EXTENDED ${f(3)}  ->  $ne")
        }
        out.println(Seq(sent, norm, ns, ne).mkString("\t"))
      }
    }
    diff.close(); out.close()
    println(s"[moderegen] $changed rows regenerated")
  }
}
