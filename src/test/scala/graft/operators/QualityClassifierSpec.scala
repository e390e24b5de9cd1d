package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** QualityClassifier.perceptron: hand-derived weights on a separable
  * literal corpus (epoch 1 = class-difference sum from w=0; epoch 2 a
  * no-op once separated), held-out scoring, the score>0 prediction rule,
  * and partition independence (the batch-update contract).
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // polyHash("aa")%32 = 4, polyHash("bb")%32 = 8, polyHash("cc")%32 = 12 —
  // distinct buckets (asserted below so a hash change fails loudly here,
  // not as a silent recall drop)
  test("feature buckets of the fixture tokens are distinct") {
    def b(s: String) = (graft.expr.Kernels.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)) % 32).toInt
    assert(Set(b("aa"), b("bb"), b("cc")).size == 3)
  }

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "aa aa", "pos"), (2L, "bb bb", "neg"),
      (3L, "aa", "pos"), (4L, "bb", "neg"),      // train = doc_id <= 4
      (5L, "aa aa aa", "pos"), (6L, "bb", "neg"), // held-out, separable
      (7L, "cc", "pos")                           // held-out, unseen token
    ).toDF("doc_id", "text", "lab")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    QualityClassifier.perceptron(df, "doc_id", "text",
        label = when(col("lab") === "pos", 1L).otherwise(-1L),
        isTrain = col("doc_id") <= 4L, nFeatures = 32, epochs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))

  test("separable corpus: epoch-1 class-difference weights classify train and held-out") {
    val out = run(docs)
    // epoch 1 from w=0: every train doc misclassified → w[aa] = 2+1 = 3,
    // w[bb] = −(2+1) = −3; epoch 2 finds zero misclassified → unchanged
    assert(out(0) == ((1L, 1L, 6L, 1L, true, true)))
    assert(out(1) == ((2L, -1L, -6L, -1L, true, true)))
    // held-out: scores under the same final weights
    assert(out(4) == ((5L, 1L, 9L, 1L, true, false)))
    assert(out(5) == ((6L, -1L, -3L, -1L, true, false)))
    // unseen token: score 0 → pred −1 (score>0 rule) → a miss on a pos doc
    assert(out(6) == ((7L, 1L, 0L, -1L, false, false)))
  }

  test("partition independence: repartition(5) gives the identical frame") {
    assert(run(docs).toSeq == run(docs.repartition(5)).toSeq)
  }

  test("guards: nFeatures and epochs bounds") {
    intercept[IllegalArgumentException] {
      QualityClassifier.perceptron(docs, "doc_id", "text", lit(1L), lit(true),
        nFeatures = 0)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.perceptron(docs, "doc_id", "text", lit(1L), lit(true),
        epochs = 9)
    }
  }
}
