package graft

import org.scalatest.funsuite.AnyFunSuite

class ExplodeNgramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(sql: String) = {
    Graft.register(spark)
    spark.sql(sql)
  }

  test("trigrams with positions over a 5-token text") {
    Seq((1L, "a b c d e")).toDF("id", "text").createOrReplaceTempView("ng1")
    val out = run("SELECT id, explode_ngrams(text, 3) FROM ng1 ORDER BY pos")
      .as[(Long, Int, String)].collect().toSeq
    assert(out == Seq((1L, 0, "a b c"), (1L, 1, "b c d"), (1L, 2, "c d e")))
  }

  test("short text yields no rows; null text yields no rows; n=1 is unigram") {
    Seq((1L, "a b"), (2L, null.asInstanceOf[String]), (3L, "x"))
      .toDF("id", "text").createOrReplaceTempView("ng2")
    assert(run("SELECT id, explode_ngrams(text, 3) FROM ng2").count() == 0)
    val uni = run("SELECT id, explode_ngrams(text, 1) FROM ng2 ORDER BY id, pos")
      .as[(Long, Int, String)].collect().toSeq
    assert(uni == Seq((1L, 0, "a"), (1L, 1, "b"), (3L, 0, "x")))
  }

  test("non-constant n is rejected at analysis time") {
    Seq((3, "a b c")).toDF("n", "text").createOrReplaceTempView("ng3")
    val e = intercept[Exception] {
      run("SELECT explode_ngrams(text, n) FROM ng3").collect()
    }
    assert(e.getMessage.contains("constant INT") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("plan is a single Generate, no array materialization step") {
    Seq((1L, "a b c d")).toDF("id", "text").createOrReplaceTempView("ng4")
    val plan = run("SELECT id, explode_ngrams(text, 2) FROM ng4")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
