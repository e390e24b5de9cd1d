package graft.tools

import graft.ja.{JaMode, JaTokenizer}
import scala.io.Source

/** Held-out tokenizer evaluation (VERDICT r6 "Next round" #2).
  *
  * Runs the default-config NORMAL tokenizer over the blind-authored
  * held-out corpus (resources/graft/ja/heldout_corpus.tsv — 98 sentences
  * authored from a topic list WITHOUT consulting the dictionary or tokenizer; see the file
  * header for the protocol) and reports the sentence-level full-sequence
  * match rate plus every diff. The FIRST run of this tool is the honest
  * out-of-sample conformance number recorded in SURVEY.md; later runs track
  * improvement from dictionary/lattice fixes.
  *
  * Mirrors the reference's robustness intent: KuromojiNEologdUDFTest.java
  * :202–259 tokenizes arbitrary news text the dictionary was not tuned on.
  */
object HeldoutEval {

  final case class Case(sid: Int, sentence: String, expected: Seq[String])

  def load(resource: String = "/graft/ja/heldout_corpus.tsv"): Seq[Case] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing resource $resource")
    val src = Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().filterNot(l => l.startsWith("#") || l.trim.isEmpty).zipWithIndex.map {
        case (line, idx) =>
          val parts = line.split('\t')
          require(parts.length == 2, s"heldout line ${idx + 1}: expected 2 columns, got ${parts.length}")
          Case(idx + 1, parts(0), parts(1).split('|').toSeq)
      }.toVector
    } finally src.close()
  }

  def evaluate(resource: String = "/graft/ja/heldout_corpus.tsv"): (Int, Int, Seq[(Case, Seq[String])]) = {
    val tok = new JaTokenizer(JaMode.Normal)
    val cases = load(resource)
    val diffs = cases.flatMap { c =>
      val got = tok.tokenize(c.sentence).toSeq
      if (got == c.expected) None else Some((c, got))
    }
    (cases.size - diffs.size, cases.size, diffs)
  }

  def main(args: Array[String]): Unit = {
    val res = args.headOption.getOrElse("/graft/ja/heldout_corpus.tsv")
    val (ok, total, diffs) = evaluate(res)
    val report = new StringBuilder
    report ++= f"heldout full-sequence match: $ok/$total (${100.0 * ok / total}%.1f%%)%n"
    diffs.foreach { case (c, got) =>
      report ++= s"sid=${c.sid}  ${c.sentence}\n"
      report ++= s"  expected: ${c.expected.mkString("|")}\n"
      report ++= s"  got:      ${got.mkString("|")}\n"
    }
    print(report)
    // console encodings vary; the UTF-8 file is the analysis artifact
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/heldout_diffs.txt"),
      report.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
