package graft.tools
import graft.ja._
object NsDump {
  def main(a: Array[String]): Unit = {
    val tok = new JaTokenizer(stopWords = Set.empty, stopTags = Set.empty)
    val w = new java.io.PrintWriter("/tmp/nsdump.txt", "UTF-8")
    scala.io.Source.fromFile(a(0), "UTF-8").getLines().filter(_.nonEmpty)
      .foreach(s => w.println(s + " => " + tok.tokenize(s).mkString("|")))
    w.close()
  }
}
