package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb = graft.queries.Tables
    .t(spark, "/root/testdata/sf0.001", "embeddings")

  test("fit is deterministic and returns nlist centroids of the right dim") {
    val m1 = IvfIndex.fit(emb, nlist = 8, iters = 2)
    val m2 = IvfIndex.fit(emb, nlist = 8, iters = 2)
    assert(m1.centroids.length == 8)
    assert(m1.centroids.forall(_._2.length == 64))
    assert(m1.centroids.map(_._2.toSeq).toSeq == m2.centroids.map(_._2.toSeq).toSeq)
  }

  test("assign covers every vector exactly once, with no join or exchange in the plan") {
    val m = IvfIndex.fit(emb, nlist = 8, iters = 1)
    val assigned = IvfIndex.assign(emb, m)
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assign must be a pure projection:\n$plan")
    assert(!plan.contains("Exchange"), s"assign must be shuffle-free:\n$plan")
  }

  test("probe search recall vs brute force is high at nprobe=4/8") {
    val queries = emb.where(col("vec_id") % 100 === 0)
    val m = IvfIndex.fit(emb, nlist = 8, iters = 2)
    val exact = Similarity.cosineTopK(emb, queries, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfIndex.search(emb, queries, m, k = 5, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"IVF recall@5 (nlist=8, nprobe=4): $recall%.2f")
    assert(recall >= 0.5, f"recall $recall%.2f too low")
    // full probe == brute force
    val full = IvfIndex.search(emb, queries, m, k = 5, nprobe = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact)
  }
}
