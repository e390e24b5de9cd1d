package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TextAnalysis.curationFunnelBySource: the funnel booleans must equal
  * the three standalone gates joined per doc (the formula-lockstep
  * contract its scaladoc promises), the stage counts must be monotone,
  * and the whole query must stay one kernel projection + one aggregate.
  */
class CurationFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // one doc per failure mode plus clean ones, across two sources; the
  // clean docs must be LONG varied text — the top-n-gram coverage gates
  // legitimately reject short docs (one 4-gram of a 15-word doc covers
  // >16% of its characters), the published Gopher long-doc caveat
  private val clean1 = "many travelers enjoy visiting small coastal villages " +
    "during early autumn because local markets offer fresh produce while " +
    "gentle breezes drift across quiet harbors and fishermen repair their " +
    "colorful boats near wooden piers as children gather shells along sandy " +
    "beaches watching distant sails catch golden evening light before supper"
  private val clean2 = "researchers carefully measured rainfall patterns " +
    "throughout several mountain regions last winter and compared the " +
    "resulting figures against historical records which revealed gradual " +
    "shifts in seasonal timing that scientists attribute partly to changing " +
    "ocean currents affecting weather systems far beyond any single continent"
  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "s1", clean1),
      (2L, "s1", "damaged ���� text"), // encoding: ~4/18 repl chars
      (3L, "s1", "aaaaaaaaaaaaaaaaaaaaaaaa"),               // diversity: 1 distinct char
      // repetition: a character-diverse sentence repeated 10× — passes the
      // diversity gate (natural letter mix) but every 5-gram duplicates
      (4L, "s2", Seq.fill(10)("wild black herons quickly glide over frozen marshes at dawn").mkString(" ")),
      (5L, "s2", clean2)
    ).toDF("doc_id", "source", "text")
  }

  test("funnel booleans match the three standalone reports joined per doc") {
    val enc = TextAnalysis.encodingDamageReport(docs, "doc_id", "text")
      .select(col("doc_id"), col("damaged"))
    val div = TextAnalysis.charDiversityReport(docs, "doc_id", "text")
      .select(col("doc_id"), col("is_gibberish"))
    val rep = TextAnalysis.gopherRepetition(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep"))
    val expected = docs.select(col("doc_id"), col("source"))
      .join(enc, "doc_id").join(div, "doc_id").join(rep, "doc_id")
      .select(col("source"),
        (!col("damaged")).as("p1"),
        (!col("damaged") && !col("is_gibberish")).as("p2"),
        (!col("damaged") && !col("is_gibberish") && col("keep")).as("p3"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("p1"), 1L).otherwise(0L)).as("n_pass_encoding"),
        sum(when(col("p2"), 1L).otherwise(0L)).as("n_pass_diversity"),
        sum(when(col("p3"), 1L).otherwise(0L)).as("n_pass_repetition"))
      .orderBy("source").collect()
    val got = TextAnalysis.curationFunnelBySource(docs, "source", "text")
      .select("source", "n_docs", "n_pass_encoding", "n_pass_diversity",
        "n_pass_repetition")
      .orderBy("source").collect()
    assert(got.toSeq == expected.toSeq)
  }

  test("each failure mode drops its doc at its own stage; counts are monotone") {
    // localize failures: the clean docs must pass every standalone gate
    val enc = TextAnalysis.encodingDamageReport(docs, "doc_id", "text")
      .where(col("doc_id").isin(1L, 5L)).select("damaged").collect()
    assert(enc.forall(!_.getBoolean(0)))
    val div = TextAnalysis.charDiversityReport(docs, "doc_id", "text")
      .where(col("doc_id").isin(1L, 5L)).select("is_gibberish").collect()
    assert(div.forall(!_.getBoolean(0)))
    val rep = TextAnalysis.gopherRepetition(docs, "doc_id", "text")
      .where(col("doc_id").isin(1L, 5L)).select("keep").collect()
    assert(rep.forall(_.getBoolean(0)))
    val out = TextAnalysis.curationFunnelBySource(docs, "source", "text")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // s1: 3 docs — doc 2 falls at encoding, doc 3 at diversity
    assert(out(0) == (("s1", 3L, 2L, 1L, 1L, 333333L)), s"${out(0)}")
    // s2: 2 docs — doc 4 falls at repetition
    assert(out(1) == (("s2", 2L, 2L, 2L, 1L, 500000L)), s"${out(1)}")
    out.foreach { case (_, n, p1, p2, p3, _) =>
      assert(n >= p1 && p1 >= p2 && p2 >= p3)
    }
  }

  test("plan: one kernel projection + one aggregate — no join, no Generate") {
    val p = TextAnalysis.curationFunnelBySource(docs, "source", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(!p.contains("Generate"), p)
  }
}
