package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Decontaminate.auditBySource — the four-protocol contamination dashboard.
  * sf-scale behavior is oracle-checked via q219; these specs pin that each
  * protocol fires on its OWN leak class (the reason the audit exists) and
  * that the rollup counts and clean_ppm are exact.
  */
class DecontamAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  // bench doc: 13 tokens -> exactly one 13-gram window, 8 six-shingles
  private val benchText = words("b", 13)

  private def bench = Seq((1000L, benchText, "bench")).toDF("doc_id", "text", "source")

  // A: verbatim copy           -> exact + contain + window + fuzzy
  // B: 13-gram quote inside unrelated text
  //                            -> window only (8 of 18 shingles < 1/2)
  // C: one mid-token edit      -> contain only (9/15 shingles shared,
  //                               every 13-window crosses the edit,
  //                               jaccard 9/21 < 0.5)
  // D: unrelated               -> clean
  private def corpus = {
    val cTokens = (1 to 20).map(i => if (i == 10) "EDIT" else s"c$i")
    val cBench = (1 to 20).map(i => s"c$i").mkString(" ")
    Seq(
      (1L, benchText, "s1"),
      (2L, words("x", 5) + " " + benchText + " " + words("y", 5), "s1"),
      (3L, cTokens.mkString(" "), "s2"),
      (4L, words("z", 20), "s2"))
      .toDF("doc_id", "text", "source") -> cBench
  }

  test("each protocol fires on its own leak class; rollup counts exact") {
    val (corp, cBench) = corpus
    val b2 = bench.union(Seq((1001L, cBench, "bench")).toDF("doc_id", "text", "source"))
    val rows = Decontaminate.auditBySource(corp, b2,
        "doc_id", "text", "source", fuzzyThreshold = 0.5)
      .orderBy("source").collect()
    val byS = rows.map(r => r.getString(0) -> r).toMap
    val s1 = byS("s1")
    def g(r: org.apache.spark.sql.Row, c: String) = r.getLong(r.fieldIndex(c))
    assert(g(s1, "n_docs") == 2L)
    assert(g(s1, "n_exact") == 1L, s1.toString) // A only
    assert(g(s1, "n_window") == 2L, s1.toString) // A and B
    assert(g(s1, "n_contain") == 1L, s1.toString) // A only (B below 1/2)
    assert(g(s1, "n_fuzzy") == 1L, s1.toString) // A only
    assert(g(s1, "n_any") == 2L)
    assert(g(s1, "clean_ppm") == 0L)
    val s2 = byS("s2")
    assert(g(s2, "n_docs") == 2L)
    assert(g(s2, "n_exact") == 0L)
    assert(g(s2, "n_window") == 0L, s2.toString) // every window crosses EDIT
    assert(g(s2, "n_contain") == 1L, s2.toString) // C: 9/15 >= 1/2
    assert(g(s2, "n_fuzzy") == 0L, s2.toString) // 9/21 < 0.5
    assert(g(s2, "n_any") == 1L)
    assert(g(s2, "clean_ppm") == 500000L)
  }

  test("short docs (no shingles) are clean under containment, not dropped") {
    val corp = Seq((1L, "tiny doc", "s")).toDF("doc_id", "text", "source")
    val r = Decontaminate.auditBySource(corp, bench,
      "doc_id", "text", "source").collect()(0)
    assert(r.getLong(r.fieldIndex("n_docs")) == 1L)
    assert(r.getLong(r.fieldIndex("n_any")) == 0L)
    assert(r.getLong(r.fieldIndex("clean_ppm")) == 1000000L)
  }
}
