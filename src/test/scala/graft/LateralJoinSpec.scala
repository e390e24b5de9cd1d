package graft

import org.scalatest.funsuite.AnyFunSuite

class LateralJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("correlated LATERAL subquery with ORDER BY + LIMIT resolves and is exact") {
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").createOrReplaceTempView("lc")
    Seq((1L, 10.0), (1L, 30.0), (1L, 20.0), (2L, 5.0))
      .toDF("cid", "amt").createOrReplaceTempView("lo")
    val out = spark.sql(
      """SELECT c.id, t.amt FROM lc c,
        |LATERAL (SELECT amt FROM lo WHERE cid = c.id
        |         ORDER BY amt DESC LIMIT 2) t
        |ORDER BY c.id, t.amt DESC""".stripMargin)
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 30.0), (1L, 20.0), (2L, 5.0)))
  }
}
