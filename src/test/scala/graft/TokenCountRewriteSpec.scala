package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The size(split(x, " ")) → token_count(x) optimizer rule: exact
  * equivalence on the full empty-string edge surface, plan rewrite proof,
  * and result identity on real data through both API shapes.
  */
class TokenCountRewriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    Graft.register(s)
    s
  }
  import spark.implicits._

  test("kernel equals size(split(_, \" \", -1)) on every empty-string edge") {
    val cases = Seq("", " ", "  ", "a", "a b", " a", "a ", "a  b",
      "多 バイト  文字 ", "a b c d e")
    cases.foreach { c =>
      val viaSplit = c.split(" ", -1).length
      val viaKernel = graft.expr.Kernels.tokenCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(c))
      assert(viaKernel == viaSplit, s"'$c': kernel $viaKernel vs split $viaSplit")
    }
  }

  test("rule rewrites the logical plan: token_count appears, the split array is gone") {
    // parquet-backed: a local Seq constant-folds to a LocalRelation before
    // the plan can be inspected (the ClusteringSpec lesson)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(size(split(col("text"), " ")).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("token_count"), s"rule did not fire:\n$optimized")
    assert(!optimized.contains("split("), s"split survived the rewrite:\n$optimized")
  }

  test("rule leaves other separators and explicit limits alone") {
    val df = Seq((1L, "a,b")).toDF("id", "text")
    val other = df.select(size(split(col("text"), ",")).as("n"))
      .queryExecution.optimizedPlan.toString
    assert(!other.contains("token_count"), other)
    val limited = df.select(size(split(col("text"), " ", 2)).as("n"))
      .queryExecution.optimizedPlan.toString
    assert(!limited.contains("token_count"), limited)
  }

  test("results identical on real data, SQL text included; nulls stay null") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("tcr_docs")
    val viaDsl = docs.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val viaSql = spark.sql(
      "SELECT doc_id, size(split(text, ' ')) AS n FROM tcr_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(viaDsl == viaSql && viaDsl.nonEmpty)
    val withNull = Seq((1L, "a b"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text").select(size(split(col("text"), " ")).as("n"))
      .collect()
    assert(withNull(0).getInt(0) == 2 && withNull(1).isNullAt(0))
  }
}
