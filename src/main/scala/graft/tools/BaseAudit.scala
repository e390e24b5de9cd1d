package graft.tools

/** Basic-inventory audit (the 低い lesson): checks a whitespace-separated
  * word list against the dictionary base forms + surfaces and reports
  * absentees. Usage: runMain graft.tools.BaseAudit <out> <words-file>
  */
object BaseAudit {
  def main(args: Array[String]): Unit = {
    val known = graft.ja.JaDictionary.embeddedEntries
      .flatMap(e => Seq(e.surface, e.base).filter(_.nonEmpty)).toSet
    val w = new java.io.PrintWriter(OutPath.checked(args(0)), "UTF-8")
    scala.io.Source.fromFile(args(1), "UTF-8").getLines()
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .filterNot(known.contains).foreach(w.println)
    w.close()
  }
}
