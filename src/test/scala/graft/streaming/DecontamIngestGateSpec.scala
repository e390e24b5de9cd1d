package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Decontaminate

/** Decontaminate.ingestGate — the streaming-native ingest-time
  * decontamination gate (VERDICT r18 stretch #8): every protocol rung is a
  * stateless projection or a stream-static join, so a live corpus stream
  * is flagged per micro-batch in APPEND mode with zero state. The fixture
  * is the DecontamAuditSpec leak ladder: a verbatim copy, a 13-gram quote
  * inside unrelated text, a mid-token edit that defeats every window but
  * keeps over half the shingles, and a clean doc.
  */
class DecontamIngestGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private val benchText = words("b", 13)
  private val cBench = (1 to 20).map(i => s"c$i").mkString(" ")
  private def bench = Seq((1000L, benchText), (1001L, cBench)).toDF("doc_id", "text")

  private val docA = benchText // verbatim
  private val docB = words("x", 5) + " " + benchText + " " + words("y", 5) // 13-gram quote
  private val docC = (1 to 20).map(i => if (i == 10) "EDIT" else s"c$i").mkString(" ")
  private val docD = words("z", 20) // clean

  test("streaming gate flags each leak class at ingest, append mode, zero state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Decontaminate.ingestGate(mem.toDS().toDF("doc_id", "text"), bench,
        "doc_id", "text")
      .writeStream.format("memory").queryName("ingest_gate")
      .outputMode("append").start()
    try {
      mem.addData((1L, docA), (2L, docB))
      q.processAllAvailable()
      mem.addData((3L, docC), (4L, docD)) // a second micro-batch — no carryover
      q.processAllAvailable()
      val rows = spark.table("ingest_gate").collect().map { r =>
        r.getLong(r.fieldIndex("doc_id")) ->
          ((r.getBoolean(r.fieldIndex("exact_hit")),
            r.getBoolean(r.fieldIndex("contain_hit")),
            r.getBoolean(r.fieldIndex("window_hit")),
            r.getBoolean(r.fieldIndex("fuzzy_candidate")),
            r.getBoolean(r.fieldIndex("any_hit"))))
      }.toMap
      assert(rows(1L) == ((true, true, true, true, true)), s"verbatim: ${rows(1L)}")
      // quote: window fires; 8 of 18 shingles < 1/2 so contain stays false
      assert(rows(2L)._1 == false && rows(2L)._3 == true && rows(2L)._2 == false,
        s"quote: ${rows(2L)}")
      // edit: every 13-window crosses EDIT; 9/15 shingles >= 1/2
      assert(rows(3L)._2 == true && rows(3L)._3 == false, s"edit: ${rows(3L)}")
      assert(rows(4L) == ((false, false, false, false, false)), s"clean: ${rows(4L)}")
    } finally q.stop()
  }

  test("null-text rows classify as uniformly clean, never NULL (round-19 review)") {
    // a NULL any_hit would vanish from both sides of a quarantine filter;
    // every flag must coalesce to false
    val corp = Seq((1L, null.asInstanceOf[String]), (2L, docA))
      .toDF("doc_id", "text")
    val rows = Decontaminate.ingestGate(corp, bench, "doc_id", "text")
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    val nullRow = rows(1L)
    Seq("exact_hit", "contain_hit", "window_hit", "fuzzy_candidate", "any_hit")
      .foreach { c =>
        assert(!nullRow.isNullAt(nullRow.fieldIndex(c)), s"$c must not be NULL")
        assert(!nullRow.getBoolean(nullRow.fieldIndex(c)), s"$c must be false")
      }
    assert(rows(2L).getBoolean(rows(2L).fieldIndex("any_hit")))
  }

  test("plan shape: corpus never enters a corpus-keyed exchange; benchmark side broadcasts") {
    // the gate is one corpus scan + one broadcast (stream-static-shaped)
    // join + pure projections. The ONLY shuffle in the plan is the
    // BENCHMARK fingerprint distinct, and it sits inside the broadcast
    // build subtree — the corpus side shuffles nothing and aggregates
    // nothing (the append-mode contract the MemoryStream test exercises).
    val corp = Seq((1L, docA), (2L, docD)).toDF("doc_id", "text")
    val plan = Decontaminate.ingestGate(corp, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected only the benchmark-distinct shuffle, got $shuffles\n$plan")
    // that one shuffle is keyed on the benchmark fingerprint column, not
    // on any corpus column
    val at = plan.indexOf("Exchange hashpartitioning")
    assert(plan.substring(at, at + 60).contains("__fp"), plan.substring(at, at + 120))
  }

  test("batch parity: gate flags equal the per-protocol batch operators; fuzzy screen covers fuzzy hits") {
    val corp = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD))
      .toDF("doc_id", "text")
    val gate = Decontaminate.ingestGate(corp, bench, "doc_id", "text")
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        ((r.getBoolean(r.fieldIndex("exact_hit")),
          r.getBoolean(r.fieldIndex("contain_hit")),
          r.getBoolean(r.fieldIndex("window_hit")),
          r.getBoolean(r.fieldIndex("fuzzy_candidate"))))).toMap
    val exact = Decontaminate.flagExact(corp, bench, "text")
      .collect().map(_.getLong(0)).toSet
    val contain = Decontaminate.flagNearNgram(corp, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        r.getBoolean(r.fieldIndex("contaminated"))).toMap
    val window = Decontaminate.flagNgramCollision(corp, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        r.getBoolean(r.fieldIndex("contaminated"))).toMap
    val fuzzy = Decontaminate.fuzzyContamination(corp, bench, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        r.getBoolean(r.fieldIndex("contaminated"))).toMap
    (1L to 4L).foreach { id =>
      assert(gate(id)._1 == exact.contains(id), s"exact parity doc $id")
      // flagNearNgram omits shingle-less docs; all fixture docs have shingles
      assert(gate(id)._2 == contain(id), s"contain parity doc $id")
      assert(gate(id)._3 == window(id), s"window parity doc $id")
      // the band screen is a superset of confirmed fuzzy hits, never a miss
      if (fuzzy(id)) assert(gate(id)._4, s"fuzzy screen missed a confirmed hit, doc $id")
    }
  }
}
