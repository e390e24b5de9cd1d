package graft.ja

/** Loader for the engine-owned golden corpus
  * (resources/graft/ja/golden_corpus.tsv): 122 hand-reviewed sentences with
  * their expected token sequences. Shipped in the main jar because the
  * corpus is both a spec fixture (JaCorpusSpec full-sequence assertions) and
  * the input to the oracle-checked query q55 — the Japanese-text analogue of
  * the reference's golden tests, pinned inside the driver's correctness gate
  * (VERDICT r1 "Next round" #1).
  */
object JaGolden {

  /** (1-based sentence id, raw sentence, expected tokens). */
  final case class Golden(sid: Int, sentence: String, expected: Seq[String])

  lazy val corpus: Seq[Golden] = {
    val in = getClass.getResourceAsStream("/graft/ja/golden_corpus.tsv")
    require(in != null, "missing resource graft/ja/golden_corpus.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    lines.zipWithIndex.map { case (l, i) =>
      val Array(sentence, toks) = l.split("\t", 2)
      require(!sentence.contains("'") && !toks.contains("'"),
        s"corpus line ${i + 1} contains a quote — would break the SQL oracle literal")
      Golden(i + 1, sentence, toks.split("\\|").toSeq)
    }
  }

  /** DuckDB VALUES literal of the expected outputs — the q55 oracle. The
    * expectations are data (human-reviewed), not computation, so the oracle
    * is a literal table: Spark recomputes the tokens through the real
    * analyzer chain and the driver hash-compares against these rows.
    */
  def oracleSql: String = {
    val rows = corpus.map { g =>
      s"(${g.sid}, ${g.expected.size}, '${g.expected.mkString("|")}')"
    }
    s"""SELECT * FROM (VALUES ${rows.mkString(",\n  ")}) AS t(sid, n_toks, tokens)
       |ORDER BY sid""".stripMargin
  }
}
