package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Decontaminate.fuzzyContamination — cross-corpus MinHash-LSH candidate
  * generation + exact shingle-Jaccard verification (the near-duplicate
  * MATCH decontamination rung). sf-scale behavior is oracle-checked via
  * q206; these specs pin the semantics on hand-built corpora and the
  * broadcast-only plan shape.
  */
class FuzzyContaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private def run(corpus: Seq[(Long, String)], bench: Seq[(Long, String)],
      threshold: Double = 0.8) =
    Decontaminate.fuzzyContamination(
      corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
      "doc_id", "text", threshold = threshold)
      .orderBy("id").collect()

  test("verbatim benchmark copy: jaccard 1.0, contaminated") {
    val text = words("tok", 30)
    val rows = run(Seq((1L, text)), Seq((100L, text)))
    val r = rows(0)
    assert(r.getLong(r.fieldIndex("n_shingles")) == 25L)
    assert(r.getDouble(r.fieldIndex("best_jaccard")) == 1.0)
    assert(r.getBoolean(r.fieldIndex("contaminated")))
  }

  test("appended-token near-dup verifies above threshold") {
    val base = words("tok", 30)
    val rows = run(Seq((1L, base + " extra")), Seq((100L, base)))
    val r = rows(0)
    // 26 vs 25 shingles, 25 shared: jaccard 25/26
    assert(r.getDouble(r.fieldIndex("best_jaccard")) == 25.0 / 26)
    assert(r.getBoolean(r.fieldIndex("contaminated")), r.toString)
  }

  test("unrelated doc: zero candidates, not contaminated") {
    val rows = run(Seq((1L, words("aaa", 30))), Seq((100L, words("zzz", 30))))
    val r = rows(0)
    assert(r.getLong(r.fieldIndex("n_candidates")) == 0L)
    assert(r.getDouble(r.fieldIndex("best_jaccard")) == 0.0)
    assert(!r.getBoolean(r.fieldIndex("contaminated")))
  }

  test("doc too short to shingle stays in the output, uncontaminated") {
    val rows = run(Seq((1L, "just five little tokens here")),
      Seq((100L, words("tok", 30))))
    val r = rows(0)
    assert(r.getLong(r.fieldIndex("n_shingles")) == 0L)
    assert(!r.getBoolean(r.fieldIndex("contaminated")))
  }

  test("pair semantics: similarity must be to ONE benchmark doc, not the union") {
    // corpus doc = X ++ Y; each half matches a DIFFERENT benchmark doc.
    // flagNearNgram's union rule would see high containment; the fuzzy
    // MATCH rule must not flag at threshold 0.8 (per-pair jaccard ~ 1/3).
    val x = words("x", 12); val y = words("y", 12); val z = words("z", 12)
    val rows = run(Seq((1L, s"$x $y")), Seq((100L, s"$x $z"), (101L, s"$z $y")))
    val r = rows(0)
    assert(!r.getBoolean(r.fieldIndex("contaminated")), r.toString)
  }

  test("plan: all benchmark-side joins broadcast, no sort-merge join") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") % 89 =!= 0)
    val bench = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") % 89 === 0)
    val plan = Decontaminate.fuzzyContamination(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus must never shuffle for a join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
