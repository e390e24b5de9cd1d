package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Retrieval.bm25HardNegatives — the DPR doc-as-query hard-negative miner.
  * sf-scale behavior is oracle-checked via q214; these specs pin the
  * semantics on a hand-built corpus: self-exclusion, per-query ranking,
  * the embedding left-join (missing vectors keep cos null / is_hard
  * false), and the hard flag's threshold edge.
  */
class HardNegativesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // doc 0 is the query; docs 1/2 share its vocabulary, doc 3 does not
  private def docs = Seq(
    0L -> "apple banana cherry",
    1L -> "apple banana cherry date",
    2L -> "apple fig",
    3L -> "kiwi lime mango").toDF("doc_id", "text")

  // doc 1 is semantically CLOSE to the query, doc 2 semantically far;
  // doc 3 has no vector at all
  private def emb = Seq(
    0L -> Seq(1f, 0f),
    1L -> Seq(0.99f, 0.1f),
    2L -> Seq(0f, 1f)).toDF("vec_id", "embedding")

  private def run(topM: Int = 5, thr: Double = 0.5) =
    Retrieval.bm25HardNegatives(docs, "doc_id", "text",
      queryPred = col("doc_id") === 0, emb = emb,
      topM = topM, cosThreshold = thr)
      .orderBy("qid", "rn").collect()

  test("query doc itself is excluded; lexical overlap ranks the candidates") {
    val rows = run()
    assert(!rows.exists(r => r.getLong(r.fieldIndex("doc_id")) == 0L))
    // doc 1 matches all 3 query terms, doc 2 one, doc 3 zero (absent)
    assert(rows.map(r => r.getLong(r.fieldIndex("doc_id"))).toSeq == Seq(1L, 2L))
    assert(rows.map(r => r.getInt(r.fieldIndex("n_terms"))).toSeq == Seq(3, 1))
    assert(rows.map(r => r.getInt(r.fieldIndex("rn"))).toSeq == Seq(1, 2))
  }

  test("semantically-far lexical match is hard; close match is not") {
    val rows = run()
    val byId = rows.map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    assert(!byId(1L).getBoolean(byId(1L).fieldIndex("is_hard")),
      "cos(query, doc1) ~ 1.0 is above the threshold")
    assert(byId(2L).getBoolean(byId(2L).fieldIndex("is_hard")),
      "cos(query, doc2) = 0 is below the threshold")
  }

  test("candidate without an embedding keeps cos null and is_hard false") {
    // make doc 3 lexically reachable by giving the query its term
    val d = Seq(
      0L -> "apple kiwi",
      1L -> "apple",
      3L -> "kiwi").toDF("doc_id", "text")
    val rows = Retrieval.bm25HardNegatives(d, "doc_id", "text",
        queryPred = col("doc_id") === 0, emb = emb,
        topM = 5, cosThreshold = 0.5)
      .where(col("doc_id") === 3).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.isNullAt(r.fieldIndex("cos")))
    assert(!r.getBoolean(r.fieldIndex("is_hard")))
  }

  test("topM truncates per query") {
    val rows = run(topM = 1)
    assert(rows.length == 1)
    assert(rows(0).getLong(rows(0).fieldIndex("doc_id")) == 1L)
  }

  test("maxQueryTerms keeps only the rarest-df terms (MoreLikeThis cap)") {
    // query doc 0: terms {common, rare}; df(common)=3, df(rare)=2.
    // capped at 1 term, only 'rare' scores -> doc 2 (common-only) is
    // unreachable; uncapped, doc 2 is a candidate via 'common'.
    val d = Seq(
      0L -> "common rare",
      1L -> "common rare",
      2L -> "common").toDF("doc_id", "text")
    def ids(cap: Int) = Retrieval.bm25HardNegatives(d, "doc_id", "text",
        queryPred = col("doc_id") === 0, emb = emb,
        topM = 5, cosThreshold = 0.5, maxQueryTerms = cap)
      .collect().map(r => r.getLong(r.fieldIndex("doc_id"))).toSet
    assert(ids(1) == Set(1L))
    assert(ids(16) == Set(1L, 2L))
  }

  test("plan shape: equi-joins only — no Cartesian product at any size") {
    val df = Retrieval.bm25HardNegatives(docs, "doc_id", "text",
      queryPred = col("doc_id") === 0, emb = emb, topM = 5, cosThreshold = 0.5)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the one-row stats broadcast (house pattern);
    // the embedding annotation must build BROADCAST hash joins on the
    // reduced candidate-id frames, never shuffle the embedding side twice
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("score matches the bm25TopK single-query form") {
    // with ONE query, per-query BM25 must equal bm25TopK run with that
    // query's distinct terms (identical formula, fold, and tie-breaks)
    val expected = Retrieval.bm25TopK(docs.where(col("doc_id") =!= 0),
        "doc_id", "text", terms = Seq("apple", "banana", "cherry"),
        topK = 5, logIdf = false)
      .orderBy("rn")
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // NOTE: bm25TopK's corpus excludes the query doc, so n_docs/avgdl
    // differ from bm25HardNegatives (which scores over the FULL corpus
    // with self-exclusion applied after). Compare only the ranking here.
    val got = run().map(r => r.getLong(r.fieldIndex("doc_id")))
    assert(got.toSeq == expected.map(_._1).toSeq)
  }
}
