package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Similarity.marginBitextMine — the Artetxe & Schwenk ratio-margin
  * criterion for parallel-pair mining. sf-scale behavior is oracle-checked
  * via q213; these specs pin the margin semantics on hand-built vector
  * sides: the mutual-best exactness identity, hub dampening (the reason
  * the margin exists at all), and the short-target-side mean.
  */
class MarginBitextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("mutual best pair at k=1 has margin exactly 1.0") {
    // each x's top-1 is its matched y AND each y's top-1 is its matched x,
    // so avg_x = avg_y = cos and margin = cos / ((cos + cos) / 2) = 1.0
    // exactly (same-double addition halved is exact in IEEE)
    val src = df(Seq(0L -> Seq(1f, 0f), 2L -> Seq(0f, 1f)))
    val tgt = df(Seq(1L -> Seq(0.99f, 0.05f), 3L -> Seq(0.05f, 0.99f)))
    val rows = Similarity.marginBitextMine(src, tgt, k = 1, threshold = 0.99)
      .orderBy("xid").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("margin")) == 1.0, r.toString)
      assert(r.getBoolean(r.fieldIndex("accepted")))
    }
    // matched pairing, not crossed
    assert(rows.map(r => (r.getLong(r.fieldIndex("xid")),
      r.getLong(r.fieldIndex("yid")))).toSet == Set((0L, 1L), (2L, 3L)))
  }

  test("hub target is dampened below the exclusive match") {
    // y=1 ("hub") is fairly close to BOTH sources; y=3 is an exclusive
    // match for x=0. The hub's neighborhood mean is inflated by its second
    // strong neighbor, so margin(x0, y3) > margin(x0, y1) even though the
    // raw cosines are comparable.
    val src = df(Seq(0L -> Seq(1f, 0f), 2L -> Seq(0f, 1f)))
    val tgt = df(Seq(
      1L -> Seq(0.7f, 0.7f), // hub: cos ~0.7 to both sources
      3L -> Seq(0.99f, 0.1f), // exclusive match for x=0
      5L -> Seq(-1f, 0f))) // filler so k=2 neighborhoods differ
    val rows = Similarity.marginBitextMine(src, tgt, k = 2)
      .where("xid = 0").collect()
      .map(r => r.getLong(r.fieldIndex("yid")) -> r.getDouble(r.fieldIndex("margin")))
      .toMap
    assert(rows.contains(1L) && rows.contains(3L), rows.toString)
    assert(rows(3L) > rows(1L),
      s"exclusive match should out-margin the hub: $rows")
  }

  test("target side smaller than k: mean over found neighbors only") {
    val src = df(Seq(0L -> Seq(1f, 0f)))
    val tgt = df(Seq(1L -> Seq(1f, 0f)))
    val rows = Similarity.marginBitextMine(src, tgt, k = 4).collect()
    assert(rows.length == 1)
    val r = rows(0)
    // single pair: avg_x = avg_y = cos = 1.0 => margin exactly 1.0
    assert(r.getDouble(r.fieldIndex("margin")) == 1.0)
    assert(r.getInt(r.fieldIndex("rn")) == 1)
  }

  test("all-negative neighborhood never accepts (ADVICE r18 sign guard)") {
    // x=0's only targets are all dissimilar: cos(x0,y1) = -1.0 and
    // cos(x0,y3) ~ -0.6, so avg_x and avg_y are negative. The raw ratio
    // for the MOST dissimilar pair is then > 1 (more-negative over
    // less-negative), which the unguarded threshold would accept; the
    // positive-denominator gate must reject every such pair while still
    // reporting the margin value itself.
    val src = df(Seq(0L -> Seq(1f, 0f)))
    val tgt = df(Seq(1L -> Seq(-1f, 0f), 3L -> Seq(-0.6f, -0.8f)))
    val rows = Similarity.marginBitextMine(src, tgt, k = 2, threshold = 1.05)
      .collect()
    assert(rows.length == 2)
    val worst = rows.maxBy(r => r.getDouble(r.fieldIndex("margin")))
    assert(worst.getDouble(worst.fieldIndex("margin")) > 1.05,
      s"fixture must exercise the margin>threshold branch: ${rows.mkString(";")}")
    rows.foreach(r => assert(!r.getBoolean(r.fieldIndex("accepted")), r.toString))
  }

  test("IVFADC-candidate rescore equals the exhaustive pass when probes cover (the bitext-scale composition)") {
    // 4 sources x 6 targets on the unit circle; candidates from the q212
    // IVFADC stack run BIDIRECTIONALLY (forward src-over-tgt + reversed
    // tgt-over-src — the Artetxe & Schwenk protocol) with full coverage
    // (nprobe = kCoarse, topK = side size), so the candidate set contains
    // both true top-k neighborhoods and the rescore must reproduce the
    // exhaustive frame EXACTLY — same pairs, same doubles, same flags.
    def ring(ids: Seq[Long], phase: Double) = df(ids.zipWithIndex.map {
      case (id, i) =>
        val a = phase + i * 0.7
        id -> Seq(math.cos(a).toFloat, math.sin(a).toFloat, 0f, 0f)
    })
    val src = ring(Seq(0L, 2L, 4L, 6L), 0.1)
    val tgt = ring(Seq(1L, 3L, 5L, 7L, 9L, 11L), 0.35)
    val fwd = Quantize.ivfAdcTopK(tgt, src, kCoarse = 2, nprobe = 2,
        m = 2, kCent = 4, iters = 2, topK = 6)
      .select(col("qid").as("xid"), col("nid").as("yid"))
    val bwd = Quantize.ivfAdcTopK(src, tgt, kCoarse = 2, nprobe = 2,
        m = 2, kCent = 4, iters = 2, topK = 4)
      .select(col("nid").as("xid"), col("qid").as("yid"))
    val cand = fwd.union(bwd)
    val exhaustive = Similarity.marginBitextMine(src, tgt, k = 2)
      .collect().map(_.toSeq).toSet
    val rescored = Similarity.marginBitextRescore(src, tgt, cand, k = 2)
      .collect().map(_.toSeq).toSet
    assert(rescored == exhaustive,
      s"rescore over covering IVFADC candidates must equal the exhaustive pass\n" +
        s"exhaustive=$exhaustive\nrescored=$rescored")
  }

  test("plan shape: source side broadcasts; windows are keyed") {
    val src = df(Seq(0L -> Seq(1f, 0f)))
    val tgt = df(Seq(1L -> Seq(1f, 0f), 3L -> Seq(0f, 1f)))
    val plan = Similarity.marginBitextMine(src, tgt, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    // both rank windows carry a partition spec (xid / yid) — never a
    // single-partition global window over the scored frame
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("every forward candidate surfaces with its rank") {
    val src = df(Seq(0L -> Seq(1f, 0f), 2L -> Seq(0f, 1f)))
    val tgt = df((1 to 9 by 2).map(i =>
      i.toLong -> Seq(math.cos(i / 10.0).toFloat, math.sin(i / 10.0).toFloat)))
    val out = Similarity.marginBitextMine(src, tgt, k = 3).collect()
    assert(out.length == 6) // 2 sources x k=3
    val ranks = out.groupBy(_.getLong(0)).values.map(_.map(r =>
      r.getInt(r.fieldIndex("rn"))).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1, 2, 3)))
  }
}
