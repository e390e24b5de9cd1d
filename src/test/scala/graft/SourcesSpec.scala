package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink surface (SURVEY.md §2-B row 1): parquet/csv/json read+write
  * round-trips with schema preservation, partitioned writes, and pushdown
  * verification on the parquet scan.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_src").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val sample = Seq(
    (1L, "alpha", 1.5, "2024-01-01"),
    (2L, "beta", 2.5, "2024-01-02"),
    (3L, "gamma", 3.5, "2024-01-02"))

  test("parquet round-trip preserves schema and values") {
    val dir = s"${tmp()}/p"
    val df = sample.toDF("id", "name", "v", "day")
    df.write.parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet read marks all columns nullable; names+types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("csv round-trip with header + explicit schema") {
    val dir = s"${tmp()}/c"
    sample.toDF("id", "name", "v", "day").write.option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema("id BIGINT, name STRING, v DOUBLE, day STRING")
      .csv(dir)
    assert(back.count() == 3)
    assert(back.where($"name" === "beta").head().getDouble(2) == 2.5)
  }

  test("json lines round-trip") {
    val dir = s"${tmp()}/j"
    sample.toDF("id", "name", "v", "day").write.json(dir)
    val back = spark.read.json(dir).orderBy("id")
    assert(back.count() == 3)
    assert(back.select("name").as[String].collect().toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("partitioned parquet write + partition pruning on read") {
    val dir = s"${tmp()}/part"
    sample.toDF("id", "name", "v", "day").write.partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir).where($"day" === "2024-01-02")
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-filter
    assert(plan.contains("PartitionFilters") && plan.contains("day"))
  }

  test("predicate + projection pushdown reach the parquet scan") {
    val dir = s"${tmp()}/push"
    sample.toDF("id", "name", "v", "day").write.parquet(dir)
    val q = spark.read.parquet(dir).where($"id" > 1).select("id", "name")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)"), scan)
    assert(scan.contains("ReadSchema: struct<id:bigint,name:string>"), scan)
  }

  test("orc round-trip with predicate pushdown") {
    val dir = s"${tmp()}/orc"
    sample.toDF("id", "name", "v", "day").write.orc(dir)
    val back = spark.read.orc(dir).where($"id" > 1).select("id", "name")
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((2L, "beta"), (3L, "gamma")))
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters"), scan)
  }

  test("bucketed tables: equi-join on the bucket key runs with no shuffle exchange") {
    // bucketing pre-shuffles data at WRITE time — the 100 TB pattern for a
    // fact table joined repeatedly on the same key: pay the shuffle once,
    // every later join reads co-located buckets
    // DROP only clears the in-memory catalog; the warehouse directory
    // outlives the JVM and saveAsTable refuses to reuse it — remove both
    Seq("graft_bkt_a", "graft_bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      if (loc.exists()) rm(loc)
    }
    spark.range(0, 1000).select($"id", ($"id" % 7).as("v"))
      .write.bucketBy(8, "id").sortBy("id").saveAsTable("graft_bkt_a")
    spark.range(0, 1000).select($"id", ($"id" % 11).as("w"))
      .write.bucketBy(8, "id").sortBy("id").saveAsTable("graft_bkt_b")
    val joined = spark.table("graft_bkt_a")
      .join(spark.table("graft_bkt_b"), "id")
      .where($"v" === 0)
    // disable broadcast so the join would otherwise need a shuffle
    val plan = withNoBroadcast {
      joined.queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not re-shuffle:\n$plan")
    assert(joined.count() == 143) // 1000/7 → ids 0,7,…,994
  }

  private def withNoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
