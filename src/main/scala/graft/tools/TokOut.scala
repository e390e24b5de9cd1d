package graft.tools

/** Plain NORMAL-mode tokenization dump: `runMain graft.tools.TokOut
  * <sentences-file> [<out-file>]` — one `sentence<TAB>tok|tok|…` line per
  * input. Console encodings vary on this host, so the UTF-8 out-file is
  * the analysis artifact (the HeldoutEval convention).
  */
object TokOut {
  def main(args: Array[String]): Unit = {
    val tok = new graft.ja.JaTokenizer()
    val out = new java.io.PrintWriter(
      OutPath.checked(args.lift(1).getOrElse("target/tokout.txt")), "UTF-8")
    scala.io.Source.fromFile(args(0), "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).foreach { s =>
        out.println(s + "\t" + tok.tokenize(s).mkString("|"))
      }
    out.close()
  }
}
