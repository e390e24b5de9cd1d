package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TextAnalysis.packBinsFfd — whole-document first-fit-decreasing packing
  * (the no-split SFT example layout). sf-scale behavior is oracle-checked
  * via q227; these specs hand-run the FFD walk, the oversize contract, and
  * the capacity invariant.
  */
class PackBinsFfdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "))

  private def pack(docs: Seq[(Long, String)], capacity: Int) =
    TextAnalysis.packBinsFfd(docs.toDF("doc_id", "text"), "doc_id", "text",
        capacity, nShards = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3),
        r.getBoolean(4)))).toMap

  test("first-fit decreasing, hand-run: the 7/6/4/3/3/2 walk at capacity 10") {
    // sorted desc: 7,6,4,3,3,2. FFD: 7->bin0; 6->bin1; 4 SKIPS bin0
    // (7+4>10) and fills bin1 to 10 (the first-fit step next-fit would
    // miss); 3 fills bin0 to 10; 3->bin2; 2->bin2.
    val out = pack(Seq(doc(1, 7), doc(2, 6), doc(3, 4), doc(4, 3),
      doc(5, 3), doc(6, 2)), capacity = 10)
    assert(out.view.mapValues(_._1).toMap ==
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 2, 6L -> 2), out.toString)
    assert(out.values.forall(!_._3))
  }

  test("oversize document opens its own permanently-overfull bin") {
    val out = pack(Seq(doc(7, 12), doc(1, 7), doc(2, 6), doc(3, 4),
      doc(4, 3), doc(5, 3), doc(6, 2)), capacity = 10)
    assert(out(7L) == ((0, 12L, true)), out(7L).toString)
    // nothing else ever lands in the overfull bin; the rest shift one up
    assert(out.view.mapValues(_._1).toMap ==
      Map(7L -> 0, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 1, 5L -> 3, 6L -> 3))
  }

  test("packBinsReport: bins vs lower bound and occupancy, hand-checked") {
    // the 7/6/4/3/3/2 walk: 25 tokens, 3 bins at capacity 10 —
    // lower bound ceil(25/10) = 3 (FFD meets it), occupancy
    // 25_000_000 div 30 = 833_333 ppm
    val r = TextAnalysis.packBinsReport(
        Seq(doc(1, 7), doc(2, 6), doc(3, 4), doc(4, 3), doc(5, 3), doc(6, 2))
          .toDF("doc_id", "text"),
        "doc_id", "text", capacity = 10, nShards = 1)
      .collect()
    assert(r.length == 1)
    val row = r(0)
    def g(c: String) = row.getLong(row.fieldIndex(c))
    assert((g("n_docs"), g("n_tokens"), g("n_bins"), g("n_oversize"),
      g("lower_bound"), g("occupancy_ppm")) == ((6L, 25L, 3L, 0L, 3L, 833333L)),
      row.toString)
  }

  test("segment-tree first fit is bit-identical to the linear walk (round-19 review)") {
    // deterministic LCG lengths across several capacities, incl. growth
    // past the initial leaf array and oversize entries
    var seed = 12345L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (math.abs(seed % bound) + 1).toInt
    }
    Seq(10, 37, 128).foreach { cap =>
      val lens = Array.fill(3000)(next(cap + cap / 4 + 1)) // some oversize
      val ff = new FirstFitTree(cap)
      val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
      lens.zipWithIndex.foreach { case (n, k) =>
        var b = 0
        while (b < fills.length && fills(b) + n > cap) b += 1
        if (b == fills.length) fills += n.toLong else fills(b) += n
        val got = ff.place(n)
        assert(got == b, s"cap=$cap step=$k n=$n: tree chose $got, linear chose $b")
      }
    }
  }

  test("negative doc_ids shard identically to the oracle's % (sign follows dividend)") {
    val out = TextAnalysis.packBinsFfd(
        Seq((-3L, "w w"), (5L, "w w w")).toDF("doc_id", "text"),
        "doc_id", "text", capacity = 10, nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(-3L) == -3L, s"Spark % must truncate toward zero like DuckDB: ${out(-3L)}")
    assert(out(5L) == 5L)
  }

  test("capacity invariant: no multi-doc bin exceeds capacity; shards are independent") {
    val docs = (1L to 40L).map(i => doc(i, (i % 9 + 1).toInt))
    val rows = TextAnalysis.packBinsFfd(docs.toDF("doc_id", "text"),
        "doc_id", "text", capacity = 12, nShards = 4)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
    rows.groupBy(t => (t._1, t._2)).foreach { case ((shard, bin), grp) =>
      val fill = grp.map(_._3).sum
      assert(fill <= 12 || grp.length == 1,
        s"shard $shard bin $bin overfull with ${grp.length} docs: $fill")
    }
    // shard assignment is the deterministic doc_id mod, not physical
    rows.foreach { case (shard, _, _) => assert(shard >= 0 && shard < 4) }
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("packBinsWithSalvage: fitting docs FFD-pack, oversize docs split through the salvage stream (VERDICT r19 #5)") {
    // capacity 10: docs 7/6/4/3/3/2 fit (the hand-run walk above), docs
    // 12 and 25 are oversize. Salvage stream (doc_id order: 7 then 8):
    // doc 7 (12 tokens) spans offsets [0,12) -> windows 0..1; doc 8 (25)
    // spans [12,37) -> windows 1..3 (it SHARES window 1 with doc 7's tail
    // — the concat-and-split contract, no padding between docs).
    val out = TextAnalysis.packBinsWithSalvage(
        Seq(doc(1, 7), doc(2, 6), doc(3, 4), doc(4, 3), doc(5, 3), doc(6, 2),
          doc(7, 12), doc(8, 25)).toDF("doc_id", "text"),
        "doc_id", "text", capacity = 10, nShards = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // FFD half unchanged from the hand-run walk — oversize docs no longer
    // shift the bin numbering (they never enter the walk)
    assert(out(1L) == (("ffd", 7L, 0L, 0L)))
    assert(out(2L) == (("ffd", 6L, 1L, 1L)))
    assert(out(3L) == (("ffd", 4L, 1L, 1L)))
    assert(out(4L) == (("ffd", 3L, 0L, 0L)))
    assert(out(5L) == (("ffd", 3L, 2L, 2L)))
    assert(out(6L) == (("ffd", 2L, 2L, 2L)))
    // salvage half: packSequences arithmetic at contextLen = capacity
    assert(out(7L) == (("salvage", 12L, 0L, 1L)), out(7L).toString)
    assert(out(8L) == (("salvage", 25L, 1L, 3L)), out(8L).toString)
  }

  test("packSalvageReport: per-strategy docs/bins/tokens and the salvaged fraction") {
    // same fixture: ffd 25 tokens / 3 bins, salvage 37 tokens / 4 windows;
    // salvage_ppm = 37e6 div 62 = 596_774
    val r = TextAnalysis.packSalvageReport(
        Seq(doc(1, 7), doc(2, 6), doc(3, 4), doc(4, 3), doc(5, 3), doc(6, 2),
          doc(7, 12), doc(8, 25)).toDF("doc_id", "text"),
        "doc_id", "text", capacity = 10, nShards = 1)
      .collect()
    assert(r.length == 1)
    val row = r(0)
    def g(c: String) = row.getLong(row.fieldIndex(c))
    assert((g("n_docs_ffd"), g("n_docs_salvaged"), g("ffd_bins"),
      g("salvage_bins"), g("tokens_ffd"), g("tokens_salvaged"),
      g("salvage_ppm")) == ((6L, 2L, 3L, 4L, 25L, 37L, 596774L)), row.toString)
  }

  test("packBinsWithSalvage: all-oversize and all-fitting shards both report; one exchange per stage") {
    // shard 0 = all oversize, shard 1 = all fitting (nShards 2)
    val df = Seq(doc(2L, 30), doc(4L, 15), doc(1L, 3), doc(3L, 5))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.packBinsWithSalvage(df, "doc_id", "text",
        capacity = 10, nShards = 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows == Map(2L -> "salvage", 4L -> "salvage",
      1L -> "ffd", 3L -> "ffd"))
    val rep = TextAnalysis.packSalvageReport(df, "doc_id", "text",
        capacity = 10, nShards = 2)
      .collect().map(r => r.getLong(0) -> ((
        r.getLong(r.fieldIndex("ffd_bins")), r.getLong(r.fieldIndex("salvage_bins")))))
      .toMap
    assert(rep(0L) == ((0L, 5L)), rep(0L).toString) // 45 tokens -> 5 windows
    assert(rep(1L) == ((1L, 0L)), rep(1L).toString)
    // plan: the token-count projection is checkpointed, so each branch adds
    // exactly one shard-keyed exchange (the flatMapGroups; the window)
    val plan = TextAnalysis.packBinsWithSalvage(df, "doc_id", "text",
        capacity = 10, nShards = 2).queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 2, s"expected the two shard-keyed exchanges, got $shuffles\n$plan")
  }
}
