package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CurationFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gopherFilter: each rule rejects its own pathology, good doc passes") {
    val good = (1 to 60) // 60 distinct all-alpha words, mean length 5
      .map(i => s"${('a' + i % 26).toChar}${('a' + (i / 26) % 26).toChar}ord")
      .mkString(" ")
    val tooShort = "just five words right here"
    val longWords = (1 to 60).map(_ => "pneumonoultramicroscopic").mkString(" ")
    val nonAlpha = (1 to 60).map(i => s"123$i!").mkString(" ")
    val dupey = (1 to 60).map(_ => "same").mkString(" ")
    val df = Seq(
      (1L, good), (2L, tooShort), (3L, longWords), (4L, nonAlpha), (5L, dupey))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilter(df, "doc_id", "text")
      .select("doc_id", "r_word_count", "r_mean_len", "r_alpha", "r_dup", "keep")
      .orderBy("doc_id")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(out(0) == ((1L, true, true, true, true, true)))
    assert(!out(1)._2 && !out(1)._6, "short doc fails word count")
    assert(!out(2)._3 && !out(2)._6, "long mean word length fails")
    assert(!out(3)._4 && !out(3)._6, "non-alpha tokens fail")
    assert(!out(4)._5 && !out(4)._6, "duplicate-heavy doc fails")
  }

  test("gopherFilter is a single shuffle-free projection") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.gopherFilter(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
