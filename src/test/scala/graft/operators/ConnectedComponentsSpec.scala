package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Large-star/small-star connected components vs a driver-side union-find
  * reference on hand-built and seeded-random graphs.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Both paths must agree: driver union-find (default threshold) and the
    * distributed large-star/small-star iteration (threshold 0).
    */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    def run(thr: Long) =
      Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b", driverThreshold = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = run(1L << 20)
    val distributed = run(0L)
    assert(driver == distributed, "driver and distributed CC paths disagree")
    driver
  }

  /** Reference union-find with path compression. */
  private def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root labels are min-ids because we always parent max under min
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain collapses to the minimum id") {
    assert(cc(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("two components, reversed/duplicate edges and self-loops tolerated") {
    val edges = Seq((2L, 1L), (1L, 2L), (2L, 2L), (3L, 1L), (10L, 20L), (20L, 10L))
    assert(cc(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 20L -> 10L))
  }

  test("self-loop-only node labels itself") {
    assert(cc(Seq((7L, 7L))) == Map(7L -> 7L))
  }

  test("empty edge list yields empty labels") {
    assert(cc(Seq.empty) == Map.empty)
  }

  test("seeded random graphs match union-find labels exactly") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n) {
        (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)
      }.filter { case (a, b) => a != b }
      assert(cc(edges) == ufLabels(edges), s"trial $trial")
    }
  }

  test("nearDupClusters groups exact+near dups under the min id with sizes") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),
      (3L, "a b c d e f g x"),
      (4L, "q r s t u v w z")).toDF("doc_id", "text")
    val r = Dedup.nearDupClusters(docs, "doc_id", "text", threshold = 0.4)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2), x.getLong(3)))
    // 1,2 identical; 3 near-dups both (jaccard 0.5 ≥ 0.4); 4 unpaired → absent
    assert(r.toSeq == Seq((1L, 1L, true, 3L), (1L, 2L, false, 3L), (1L, 3L, false, 3L)))
  }

  test("clusterRepresentatives keeps the richest copy, not the min id") {
    // doc 3 has 9 distinct tokens vs 8 for docs 1/2 — it must win its
    // cluster even though doc 1 is the canonical (min-id) label
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),
      (3L, "a b c d e f g h y"),
      (4L, "q r s t u v w z")).toDF("doc_id", "text")
    val r = Dedup.clusterRepresentatives(docs, "doc_id", "text", threshold = 0.4)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))
    assert(r.toSeq == Seq(
      (1L, 1L, 8L, 3L, false), (1L, 2L, 8L, 3L, false), (1L, 3L, 9L, 3L, true)))
    // score tie → doc_id ascending picks the smaller id
    val tied = Seq(
      (7L, "a b c d e f g h"), (5L, "a b c d e f g h")).toDF("doc_id", "text")
    val rt = Dedup.clusterRepresentatives(tied, "doc_id", "text", threshold = 0.4)
      .orderBy("doc_id").collect().map(x => (x.getLong(1), x.getBoolean(4)))
    assert(rt.toSeq == Seq((5L, true), (7L, false)))
  }

  test("normalizedDedup: case/punct/whitespace variants share a fingerprint, first id keeps") {
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "hello worlds"), // different normal form
      (5L, "  hello!!! world  ")).toDF("doc_id", "text")
    val r = Dedup.normalizedDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getBoolean(2)))
    assert(r.map(_._2).distinct.length == 2, "variants must collapse to one fp")
    assert(r.filter(_._3).map(_._1).toSeq == Seq(1L, 4L),
      "min doc_id per fingerprint keeps")
  }

  test("normalizedDedup: non-Latin docs (empty normal form) are ALL kept, never cross-flagged") {
    // round-17 review finding: without the blank exemption every kana/kanji
    // doc normalized to "" and shared one fingerprint — a data-destroying
    // default on non-English corpora
    val docs = Seq(
      (1L, "日本語の文書です"),
      (2L, "全く別の内容の文書"),
      (3L, "!!!"),
      (4L, "ascii doc"),
      (5L, "ASCII   doc!")).toDF("doc_id", "text")
    val r = Dedup.normalizedDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getBoolean(2)))
    assert(r.toSeq == Seq((1L, true), (2L, true), (3L, true), (4L, true), (5L, false)),
      "blank normal forms exempt; real ascii dup still caught")
  }

  test("normalizedDedup: blank rows salt the window key (no md5('') hot partition), one scan") {
    // ADVICE r17: on a predominantly non-Latin corpus every blank normal
    // form shares md5('') — the salt spreads the exchange; keep semantics
    // are untouched (blanks keep unconditionally) and the OUTPUT fp stays
    // the unsalted md5('') for all blanks
    val docs = (1L to 200L).map(i => (i, if (i <= 198) s"日本語文書その$i" else "same doc"))
      .toDF("doc_id", "text")
    val r = Dedup.normalizedDedup(docs, "doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getBoolean(2)))
    assert(r.count(_._3) == 199, "198 blanks + the first of the two ascii copies keep")
    val plan = Dedup.normalizedDedup(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(plan).length == 1,
      s"salting must not pay a second corpus scan:\n$plan")
    assert(!plan.contains("SinglePartition"), plan)
  }
}
