package graft.operators

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Chunking, corpus-frequency scoring, and epoch shuffle on hand-computable
  * inputs (sf-scale behavior is oracle-checked via q68–q70).
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunk: stride windows with clamped tail, short docs yield themselves") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b")).toDF("doc_id", "text") //  2 tokens < chunkSize
    val r = TextAnalysis.chunk(docs, "doc_id", "text", chunkSize = 5, overlap = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
    // stride 3, len 10: ceil((10-2)/3)=3 chunks at 1,4,7; tail clamped to 4
    assert(r.toSeq == Seq(
      (1L, 0, 5, "t1 t2 t3 t4 t5"),
      (1L, 1, 5, "t4 t5 t6 t7 t8"),
      (1L, 2, 4, "t7 t8 t9 t10"),
      (2L, 0, 2, "a b")))
  }

  test("chunk: consecutive chunks overlap by exactly `overlap` tokens") {
    val docs = Seq((1L, (1 to 100).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.chunk(docs, "doc_id", "text", chunkSize = 16, overlap = 4)
      .orderBy("chunk_idx").collect()
    r.sliding(2).foreach { case Array(a, b) =>
      val at = a.getString(3).split(" ")
      val bt = b.getString(3).split(" ")
      assert(at.takeRight(4).sameElements(bt.take(4)))
    }
    // every source token appears in some chunk
    assert(r.flatMap(_.getString(3).split(" ")).distinct.length == 100)
  }

  test("corpusFreqScore: mean frequency and rare ratio from corpus counts") {
    val docs = Seq(
      (1L, "x x y"), // x appears 3 times in corpus, y twice
      (2L, "x y z")) // z once → rare at minCount=2
      .toDF("doc_id", "text")
    val r = TextAnalysis.corpusFreqScore(docs, "doc_id", "text", minCount = 2)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      (1L, 3L, (3 + 3 + 2) / 3.0, 0.0),
      (2L, 3L, (3 + 2 + 1) / 3.0, 1 / 3.0)))
  }

  test("epochShuffle: shards partition the corpus; positions are 1..shardSize; salt reshuffles") {
    val docs = (1L to 200L).map(i => Tuple1(i)).toDF("doc_id")
    val e1 = Sampling.epochShuffle(docs, "doc_id", numShards = 4, salt = "e1")
    val rows = e1.collect()
    assert(rows.length == 200)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.subsetOf((0L until 4L).toSet))
    byShard.values.foreach { g =>
      assert(g.map(_.getAs[Int]("pos_in_shard")).sorted.sameElements(1 to g.length))
    }
    val e2 = Sampling.epochShuffle(docs, "doc_id", numShards = 4, salt = "e2")
    val m1 = rows.map(r => r.getLong(0) -> (r.getAs[Long]("shard"), r.getAs[Int]("pos_in_shard"))).toMap
    val m2 = e2.collect().map(r => r.getLong(0) -> (r.getAs[Long]("shard"), r.getAs[Int]("pos_in_shard"))).toMap
    assert(m1 != m2) // a different epoch salt produces a different permutation
    // determinism: same salt reproduces bit-identically
    val e1b = Sampling.epochShuffle(docs, "doc_id", numShards = 4, salt = "e1")
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("shard"), r.getAs[Int]("pos_in_shard"))).toMap
    assert(m1 == e1b)
  }

  test("int8 quantize: codes bounded, zero vector safe, round-trip error small") {
    val emb = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Quantize.int8(emb, "vec_id", "embedding").orderBy("vec_id").collect()
    val r1 = q(0)
    assert(r1.getDouble(1) == 1.0 / 127) // scale = max|x|/127
    val codes = r1.getSeq[Long](2)
    assert(codes == Seq(127L, -63L, 32L, 0L))
    assert(r1.getLong(3) == 127L)
    assert(r1.getDouble(4) < 4 * (1.0 / 127) / 2 + 1e-12) // per-dim err <= scale/2
    val r2 = q(1)
    assert(r2.getDouble(1) == 0.0 && r2.getSeq[Long](2).forall(_ == 0L) && r2.getDouble(4) == 0.0)
  }

  test("stratifiedSample: exact quota per stratum, deterministic, disjoint ranks") {
    val docs = (1L to 100L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("doc_id", "source")
    val s1 = Sampling.stratifiedSample(docs, "doc_id", "source", k = 10)
    val rows = s1.collect()
    val byS = rows.groupBy(_.getString(1))
    assert(byS("a").length == 10 && byS("b").length == 10)
    byS.values.foreach(g =>
      assert(g.map(_.getAs[Int]("sample_rank")).sorted.sameElements(1 to 10)))
    // small stratum: quota clamps to stratum size
    val tiny = Sampling.stratifiedSample(
      (1L to 5L).map(i => (i, "x")).toDF("doc_id", "source"), "doc_id", "source", k = 10)
    assert(tiny.count() == 5)
    // determinism
    assert(s1.collect().map(_.toString).sorted.sameElements(rows.map(_.toString).sorted))
  }

  test("packSequences: contiguous spans per shard, bin spans cover token stream") {
    val docs = Seq(
      (1L, "a", ("w " * 300).trim), // 300 tokens: bins 0..0 (offsets 0-299)
      (2L, "a", ("w " * 300).trim), // offsets 300-599: bins 0..1
      (3L, "a", ""),                // empty: excluded
      (4L, "a", ("w " * 600).trim), // offsets 600-1199: bins 1..2
      (5L, "b", ("w " * 10).trim))  // own shard: offsets 0-9, bin 0
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.packSequences(docs, "doc_id", "text", "source", contextLen = 512)
      .orderBy("source", "doc_id").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      (1L, 300L, 0L, 0L, 0L),
      (2L, 300L, 300L, 0L, 1L),
      (4L, 600L, 600L, 1L, 2L),
      (5L, 10L, 0L, 0L, 0L)))
  }

  test("quantizedRerankTopK: with full candidate budget it equals exact top-k") {
    val rnd = new scala.util.Random(7)
    val emb = (1L to 60L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" <= 3)
    // kCand = corpus size: tier 1 cannot lose the true neighbors, so the
    // re-ranked result must equal the exact brute-force top-k
    val got = Similarity.quantizedRerankTopK(emb, queries, kCand = 60, k = 5)
      .select("qid", "nid", "rn").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Similarity.cosineTopK(emb.withColumn("label", lit(0)), queries, k = 5)
      .select("qid", "nid", "rn").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == exact)
    // with a tight candidate budget, recall of the exact top-5 stays high
    // (int8 on 64 dims: rank error from quantization is small)
    val tight = Similarity.quantizedRerankTopK(emb, queries, kCand = 10, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.map { case (q, n, _) => (q, n) }
    assert(tight.intersect(exactPairs).size >= (exactPairs.size * 0.8).toInt)
  }

  test("oovBigramGate: bigram counts, OOV misses, vacuous short docs") {
    val ref = Seq((100L, "the cat sat on the mat")).toDF("doc_id", "text")
    // ref bigrams: {the cat, cat sat, sat on, on the, the mat}
    val docs = Seq(
      (1L, "the cat sat"),        // 2 bigrams, both in ref
      (2L, "the cat ate fish"),   // 3 bigrams, "cat ate"/"ate fish" OOV
      (3L, "dog"),                // 0 bigrams -> vacuous pass
      (4L, "on the mat")).toDF("doc_id", "text") // 2 bigrams, both in ref
    val r = TextAnalysis.oovBigramGate(docs, ref, "doc_id", "text",
        maxOovPermille = 500L)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(r.toSeq == Seq(
      (1L, 2L, 0L, true),
      (2L, 3L, 2L, false), // 2000 > 500*3
      (3L, 0L, 0L, true),
      (4L, 2L, 0L, true)))
  }

  test("oovBigramGate: duplicate bigram occurrences each count; empty text is vacuous") {
    val ref = Seq((1L, "a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b a b a b"), (2L, "")).toDF("doc_id", "text")
    // doc 1 bigrams: "a b","b a","a b","b a","a b" -> 5 total, 2 OOV ("b a")
    val r = TextAnalysis.oovBigramGate(docs, ref, "doc_id", "text",
        maxOovPermille = 400L)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(r.toSeq == Seq((1L, 5L, 2L, true), (2L, 0L, 0L, true)))
  }

  test("weightedSample: matches the hand-ranked A-ES priorities; w<=0 dropped; deterministic") {
    import org.apache.spark.unsafe.types.UTF8String
    val rows = Seq((1L, 10L), (2L, 1L), (3L, 100L), (4L, 5L), (5L, 0L), (6L, -3L))
    val df = rows.toDF("doc_id", "w")
    def prio(id: Long, w: Long): Long =
      graft.expr.Kernels.polyHash(UTF8String.fromString(s"$id:wsample")) / w
    val expect = rows.filter(_._2 > 0)
      .map { case (id, w) => (id, w, prio(id, w)) }
      .sortBy { case (id, _, p) => (p, id) }.take(3)
      .zipWithIndex.map { case ((id, w, p), i) => (id, w, p, i + 1) }
    val got = Sampling.weightedSample(df, "doc_id", "w", k = 3)
      .orderBy("sample_rank").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3)))
    assert(got.toSeq == expect)
    // repartition-stable (the oracle-gate property)
    val again = Sampling.weightedSample(df.repartition(5), "doc_id", "w", k = 3)
      .orderBy("sample_rank").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3)))
    assert(again.toSeq == expect)
  }

  test("capPerGroup: per-group cut at k, rank desc with id tie-break, groups independent") {
    val df = Seq(
      (1L, "a", 5), (2L, "a", 9), (3L, "a", 9), (4L, "a", 1),
      (5L, "b", 2)).toDF("doc_id", "source", "score")
    val r = TextAnalysis.capPerGroup(df, "source", "score", "doc_id", k = 2)
      .orderBy("source", "cap_rank").collect()
      .map(x => (x.getString(1), x.getLong(0), x.getInt(3)))
    // a: 9→doc2 (tie id), 9→doc3; doc1/doc4 cut. b: lone doc survives.
    assert(r.toSeq == Seq(("a", 2L, 1), ("a", 3L, 2), ("b", 5L, 1)))
  }

  test("temperatureSample: sqrt damping, exact isqrt at perfect squares, quota floor") {
    // sources: a=100 rows, b=25, c=4 -> isqrt 10, 5, 2 (all perfect
    // squares — the float-correction hot spot); k=17 -> quotas
    // 17*10/17=10, 17*5/17=5, 17*2/17=2
    val rows = (1L to 100L).map((_, "a")) ++ (101L to 125L).map((_, "b")) ++
      (126L to 129L).map((_, "c"))
    val df = rows.toDF("doc_id", "source")
    val r = Sampling.temperatureSample(df, "doc_id", "source", k = 17)
      .collect()
    // join output leads with the key: (source, doc_id, n_source, isq, quota, sample_rank)
    val bySource = r.groupBy(_.getString(0)).map { case (s, g) => s -> g.length }
    assert(bySource == Map("a" -> 10, "b" -> 5, "c" -> 2))
    // proportional sampling would give c ~0.5 rows; sqrt damping gives 2 —
    // and the big source is capped well under its 76% share
    val quotas = r.map(x => (x.getString(0), x.getLong(4))).toMap
    assert(quotas == Map("a" -> 10L, "b" -> 5L, "c" -> 2L))
    // deterministic under repartitioning
    val again = Sampling.temperatureSample(df.repartition(7), "doc_id", "source", k = 17)
      .collect().map(_.getLong(1)).sorted
    assert(again.sameElements(r.map(_.getLong(1)).sorted))
  }

  test("weightedSample: heavier rows win more often across salts (the bias property)") {
    val df = (1L to 200L).map(i => (i, if (i <= 100) 1L else 10L)).toDF("doc_id", "w")
    val wins = (1 to 10).map { s0 =>
      val picked = Sampling.weightedSample(df, "doc_id", "w", k = 20, salt = s"s$s0")
        .collect().map(_.getLong(0))
      picked.count(_ > 100L)
    }.sum
    // heavy rows (w=10) should take well over half of the 200 slots overall
    assert(wins > 120, s"heavy-weight rows won only $wins/200 slots")
  }

  test("percentileNormalize: ppm endpoints, ties by id, single-row group at 0") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 99L)).toDF("doc_id", "source", "q")
    val r = Sampling.percentileNormalize(df, "source", "q", "doc_id")
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    // group a (n=4): ranks 1..4 -> 0, 333333, 666666, 1000000 (tie 20,20
    // ordered by doc_id: rank 2 -> id 2, rank 3 -> id 3)
    assert(r == Map(1L -> 0L, 2L -> 333333L, 3L -> 666666L, 4L -> 1000000L,
      5L -> 0L), s"got $r")
  }

  test("leakageSafeSplit: cluster members share one split; unclustered rows match the id split") {
    val docs = (1L to 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // two crafted clusters: {3, 17, 41} and {8, 9}
    val clusters = Seq((3L, 3L), (17L, 3L), (41L, 3L), (8L, 8L), (9L, 8L))
      .toDF("doc_id", "cluster_id")
    val out = Sampling.leakageSafeSplit(docs, clusters, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == 50)
    // leakage invariant: every cluster member gets the representative's split
    assert(Set(out(3L), out(17L), out(41L)).size == 1)
    assert(out(8L) == out(9L))
    // unclustered rows: identical to the plain id-keyed split
    val plain = Sampling.trainValTestSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val unclustered = (1L to 50L).toSet -- Set(3L, 17L, 41L, 8L, 9L)
    unclustered.foreach { id =>
      assert(out(id) == (id, plain(id)), s"doc $id moved without being clustered")
    }
  }
}
