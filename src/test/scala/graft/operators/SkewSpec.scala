package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // heavily skewed: one hot key with 10k rows, 10 cold keys
  private lazy val large = spark.range(0, 10000).select(
    when($"id" < 9990, lit(1L)).otherwise($"id" % 10 + 2).as("k"),
    ($"id" % 100).cast("double").as("v"))
  private lazy val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (11L, "c"))
    .toDF("k", "name")

  test("saltedJoin matches plain join row-for-row") {
    val plain = large.join(small, Seq("k")).groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedJoin(large, small, "k", saltFactor = 8)
      .groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect().toSeq
    assert(salted.map(r => (r.getLong(0), r.getString(1), r.getLong(2))) ==
      plain.map(r => (r.getLong(0), r.getString(1), r.getLong(2))))
  }

  test("saltedJoin left join preserves unmatched large-side rows") {
    val plainN = large.join(small, Seq("k"), "left").count()
    val saltedN = Skew.saltedJoin(large, small, "k", 4, "left").count()
    assert(plainN == saltedN && saltedN == 10000)
  }

  test("saltedSumCount equals direct aggregation") {
    val direct = large.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val salted = Skew.saltedSumCount(large, "k", "v", 8)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(direct.map(t => (t._1, t._2)) == salted.map(t => (t._1, t._2)))
    // double sums may differ in association order; compare with tolerance
    direct.zip(salted).foreach { case (d, s) => assert(math.abs(d._3 - s._3) < 1e-6) }
  }
}
