package graft.tools

import graft.ja.{JaTokenizer, JaMode}
import scala.collection.mutable.ArrayBuffer

/** Dumps the raw winning Viterbi path (surface / POS / connection class) for
  * each input sentence — the lattice-debugging companion to ModeDump. Usage:
  * runMain graft.tools.PathDump <out> <sentences-file>
  */
object PathDump {
  def main(args: Array[String]): Unit = {
    val w = new java.io.PrintWriter(OutPath.checked(args(0)), "UTF-8")
    val tok = new JaTokenizer(JaMode.Normal)
    scala.io.Source.fromFile(args(1), "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).foreach { sent =>
        val sink = new ArrayBuffer[(String, graft.ja.DictEntry, Int)]
        tok.pathSink = sink
        tok.tokenize(sent)
        tok.pathSink = null
        val cells = sink.map { case (surf, e, cls) =>
          val pos = if (e == null) "UNK" else e.pos
          s"$surf[$pos/c$cls]"
        }
        w.println(s"$sent\t${cells.mkString(" ")}")
      }
    w.close()
  }
}
