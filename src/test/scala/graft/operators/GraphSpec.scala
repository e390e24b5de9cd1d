package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Integer PageRank: hand-computed fixed points on tiny graphs (cycle,
  * star, dangling sink), the tie-break contract, and the partition-layout
  * independence that admits the operator to the exact-hash oracle gate.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def edges(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  test("2-cycle is the exact fixed point: rank mass never moves") {
    val out = Graph.pageRankInt(edges(1L -> 2L, 2L -> 1L), iters = 3, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contribution = 10^6 div 1; 150000 + 85*10^6 div 100 = 10^6 again
    assert(out == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("symmetric star: hub and leaf match the hand-run recurrence") {
    val e = edges(0L -> 1L, 0L -> 2L, 0L -> 3L, 1L -> 0L, 2L -> 0L, 3L -> 0L)
    val out = Graph.pageRankInt(e, iters = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byNode = out.map(t => t._1 -> t._2).toMap
    // iter1: hub = 150000 + 85*(3*10^6) div 100            = 2700000
    //        leaf = 150000 + 85*(10^6 div 3) div 100       = 433333
    // iter2: hub = 150000 + 85*(3*433333) div 100          = 1254999
    //        leaf = 150000 + 85*(2700000 div 3) div 100    = 915000
    assert(byNode == Map(0L -> 1254999L, 1L -> 915000L, 2L -> 915000L, 3L -> 915000L))
    // hub ranks first; leaves tie-break by node id
    assert(out.sortBy(_._3).map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("dangling sink stays in the node universe and holds teleport mass") {
    val out = Graph.pageRankInt(edges(1L -> 2L), iters = 2, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sink 2 has no out-edges; source 1 has no in-edges -> pure teleport
    // iter1: pr(2) = 150000 + 850000 = 10^6;   pr(1) = 150000
    // iter2: pr(2) = 150000 + 85*150000 div 100 = 277500
    assert(out == Map(1L -> 150000L, 2L -> 277500L))
  }

  test("topK truncates and rn is dense from 1") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val out = Graph.pageRankInt(e, iters = 3, topK = 2).collect()
    assert(out.length == 2)
    assert(out.map(_.getInt(2)).toSeq.sorted == Seq(1, 2))
    // 3-cycle: all ranks equal -> tie-break by node id
    assert(out.sortBy(_.getInt(2)).map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("personalized: teleport mass lands only on seeds; unreachable components drop out") {
    import spark.implicits._
    val e = edges(0L -> 1L, 0L -> 2L, 0L -> 3L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      5L -> 6L, 6L -> 5L) // disconnected 2-cycle, no seed
    val seeds = Seq(0L).toDF("node")
    val out = Graph.personalizedPageRankInt(e, seeds, iters = 2, topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getInt(3)))
      .toMap
    // iter1: hub = 150000 + 0 (leaves hold no mass yet)
    //        leaf = 0 + 85*(10^6 div 3) div 100            = 283333
    // iter2: hub = 150000 + 85*(3*283333) div 100          = 872499
    //        leaf = 0 + 85*(150000 div 3) div 100          = 42500
    assert(out(0L) == ((872499L, true, 1)))
    assert(Seq(1L, 2L, 3L).forall(n => out(n)._1 == 42500L && !out(n)._2))
    assert(!out.contains(5L) && !out.contains(6L)) // zero-rank, filtered
  }

  test("result is partition-layout independent (the gate property)") {
    val es = (1 to 200).map(i => (i.toLong, ((i * 37) % 50 + 1).toLong)) ++
      (1 to 50).map(i => (i.toLong, ((i * 13) % 200 + 1).toLong))
    val base = edges(es: _*)
    val a = Graph.pageRankInt(base, iters = 3, topK = 25)
      .collect().map(_.toSeq).toSeq
    val b = Graph.pageRankInt(base.repartition(7), iters = 3, topK = 25)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("iters=30 completes in bounded time (lineage guard, VERDICT r11 #5)") {
    // without the every-8-hops localCheckpoint the plan grows linearly
    // with iters and analysis/optimization time blows up well before 30
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 1L)
    val t0 = System.nanoTime()
    val out = Graph.pageRankInt(e, iters = 30, topK = 3).collect()
    val p = Graph.personalizedPageRankInt(e,
      e.sparkSession.range(1, 2).select(org.apache.spark.sql.functions.col("id").as("node")),
      iters = 30, topK = 3).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.length == 3 && p.nonEmpty)
    // generous CI bound: the unguarded version takes minutes at 30 hops
    assert(secs < 120.0, s"30-hop PageRank pair took $secs s — lineage guard broken?")
    // deep recurrence stays a fixed point of the damping identity:
    // total mass is conserved up to integer-div truncation
    val total = out.map(_.getLong(1)).sum
    assert(total > 0L)
  }

  test("degreeSpectrum: hand-computed bins across a power-of-two edge") {
    // out-degrees: node 1 -> 4 edges (bin 2), node 2 -> 1 (bin 0);
    // in-degrees: 10 gets 3 (bin 1), 11 gets 2 (bin 1)
    val e = edges(1L -> 10L, 1L -> 10L, 1L -> 10L, 1L -> 11L, 2L -> 11L)
    val r = Graph.degreeSpectrum(e).orderBy("direction", "bin").collect()
      .map(x => (x.getString(0), x.getInt(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      ("in", 1, 2L, 5L),
      ("out", 0, 1L, 1L), ("out", 2, 1L, 4L)))
  }

  test("HITS: overflow guard raises instead of silently wrapping") {
    // scale near sqrt(Long.MaxValue): the very first hop's raw sum
    // (deg * scale) already exceeds MaxValue/scale, so the in-plan
    // raise_error branch must fire rather than let (s * scale) wrap
    val e = edges(1L -> 10L, 2L -> 10L)
    val ex = intercept[Exception] {
      Graph.hitsInt(e, iters = 1, topK = 5, scale = 3037000500L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("overflows at scale")), msgs(ex).mkString("; "))
  }

  test("HITS: hand-run recurrence on a 2x2 bipartite graph") {
    val e = edges(1L -> 10L, 1L -> 11L, 2L -> 10L)
    val out = Graph.hitsInt(e, iters = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // h0 = 10^6 everywhere.
    // iter1: ar(10)=2e6, ar(11)=1e6, amax=2e6 -> a(10)=10^6, a(11)=500000
    //        hr(1)=1.5e6, hr(2)=1e6, hmax=1.5e6 -> h(1)=10^6, h(2)=666666
    // iter2: ar(10)=1666666, ar(11)=1e6 -> a(10)=10^6, a(11)=600000
    //        hr(1)=1.6e6, hr(2)=1e6 -> h(1)=10^6, h(2)=625000
    assert(out.toSeq == Seq(
      (10L, 1000000L, 0L, 1),
      (11L, 600000L, 0L, 2),
      (1L, 0L, 1000000L, 3),
      (2L, 0L, 625000L, 4)))
  }

  test("HITS is partition-layout independent (the gate property)") {
    val es = (1 to 200).map(i => (i.toLong, ((i * 37) % 50 + 1000).toLong)) ++
      (1 to 50).map(i => ((i + 500).toLong, ((i * 13) % 200 + 1000).toLong))
    val base = edges(es: _*)
    val a = Graph.hitsInt(base, iters = 3, topK = 25)
      .collect().map(_.toSeq).toSeq
    val b = Graph.hitsInt(base.repartition(7), iters = 3, topK = 25)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("label propagation: hand-run sync updates with the (count desc, label asc) tie-break") {
    // triangle {1,2,3} + pendant 4 <- 3, all edges symmetrized
    val e = edges(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 1L -> 3L, 3L -> 1L,
      3L -> 4L, 4L -> 3L)
    // l0 = identity. hop1 (all neighbor counts are 1 -> min label wins):
    //   1 <- {2,3} -> 2;  2 <- {1,3} -> 1;  3 <- {1,2,4} -> 1;  4 <- {3} -> 3
    // hop2: 1 <- {lab(2)=1, lab(3)=1} -> 1 (count 2); 2 <- {2,1} -> 1 (tie -> 1)
    //   3 <- {2,1,3} -> 1 (tie -> 1);  4 <- {1} -> 1
    // hop3: everyone <- all-1 neighborhoods -> 1; single community of 4
    val out = Graph.labelPropagation(e, iters = 3, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 4L, 1)))
  }

  test("label propagation: two disconnected triangles stay two communities; partition independent") {
    // odd cycles converge under sync updates (2-cycles oscillate by design
    // — the paper's async order is what damps them; fixed hops replay
    // whatever state the hop count lands on, deterministically)
    def tri(a: Long, b: Long, c: Long) =
      Seq(a -> b, b -> a, b -> c, c -> b, a -> c, c -> a)
    val base = edges(tri(1L, 2L, 3L) ++ tri(10L, 11L, 12L): _*)
    val a = Graph.labelPropagation(base, iters = 4, topK = 10)
      .collect().map(_.toSeq).toSeq
    val b = Graph.labelPropagation(base.repartition(5), iters = 4, topK = 10)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.map(r => (r(0), r(1))).toSet == Set((1L, 3L), (10L, 3L)))
  }

  test("HITS max-normalization keeps the leader at exactly `scale` and pure hubs at auth 0") {
    val out = Graph.hitsInt(edges(1L -> 2L, 3L -> 2L, 3L -> 4L), iters = 4, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byNode = out.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byNode(2L)._1 == 1000000L)        // top authority pinned at scale
    assert(byNode(1L)._1 == 0L && byNode(3L)._1 == 0L) // pure hubs
    assert(byNode(3L)._2 == 1000000L)        // best hub pinned at scale
  }
}
