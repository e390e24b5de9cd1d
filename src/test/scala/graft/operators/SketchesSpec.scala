package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // zipfish token stream: token "t<i>" appears ~30000/i times
  private lazy val toks = spark.range(0, 30000).select(
    concat(lit("t"), (lit(30000) / ($"id" + 1)).cast("long")).as("tok"))

  test("CMS never underestimates and stays within budget on every token") {
    val exact = toks.groupBy("tok").count().as[(String, Long)].collect().toMap
    val sketch = toks.agg(Cms.cmsAgg($"tok").as("s"), count(lit(1)).as("n"))
      .as[(Seq[Long], Long)].head()
    val (s, total) = sketch
    val budget = math.ceil(8.0 * total / 4096).toLong
    exact.foreach { case (tok, n) =>
      val est = Cms.estimate(s, tok, 4, 4096)
      assert(est >= n, s"underestimate for $tok: $est < $n")
      assert(est <= n + budget, s"budget blown for $tok: $est > $n + $budget")
    }
  }

  test("sketch is partitioning-invariant (merge order cannot change it)") {
    val s1 = toks.repartition(1).agg(Cms.cmsAgg($"tok")).as[Seq[Long]].head()
    val s32 = toks.repartition(32).agg(Cms.cmsAgg($"tok")).as[Seq[Long]].head()
    assert(s1 == s32)
  }

  test("heavyHitterAudit returns exact counts with both guarantees true") {
    val out = Cms.heavyHitterAudit(toks.toDF(), "tok", k = 10)
      .as[(String, Long, Boolean, Boolean)].collect().toSeq
    assert(out.size == 10)
    assert(out.head._1 == "t1" && out.head._2 > 10000)
    assert(out.forall(_._3), "no_underestimate must hold everywhere")
    assert(out.forall(_._4), "within_budget must hold everywhere")
  }

  test("CMS aggregation runs as partial+final (one fixed-size buffer per partition)") {
    val plan = toks.agg(Cms.cmsAgg($"tok")).queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), s"expected map-side partial aggregate in:\n$plan")
  }

  test("CMS works as a streaming aggregate: incremental batches equal one batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = mem.toDS().toDF("tok")
      .groupBy()
      .agg(Cms.cmsAgg(col("tok")).as("sketch"), count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      mem.addData("a", "b", "a"); q.processAllAvailable()
      mem.addData("c", "a"); q.processAllAvailable()
      val row = spark.table("cms_stream").head()
      val streamed = row.getSeq[Long](0)
      val batch = Seq("a", "b", "a", "c", "a").toDF("tok")
        .agg(Cms.cmsAgg(col("tok"))).as[Seq[Long]].head()
      assert(streamed == batch)
      assert(Cms.estimate(streamed, "a", 4, 4096) == 3L)
    } finally q.stop()
  }
}
