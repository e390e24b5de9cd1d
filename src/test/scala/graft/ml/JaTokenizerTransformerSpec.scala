package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF}
import org.apache.spark.ml.linalg.SparseVector
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ja.{JaGolden, JaTokenizer}

/** The MLlib face of the tokenizer: identical output to the SQL kernel,
  * composes into a real feature Pipeline (CountVectorizer → IDF), persists
  * with DefaultParams read/write, and keeps the A3/A4/A9 contract.
  */
class JaTokenizerTransformerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transform output is identical to the direct kernel on golden sentences") {
    val sents = JaGolden.corpus.take(120).map(_.sentence)
    val df = sents.toDF("text")
    val out = new JaTokenizerTransformer().setInputCol("text").setOutputCol("toks")
      .transform(df).select("toks").collect().map(_.getSeq[String](0))
    val tok = new JaTokenizer()
    sents.zip(out).foreach { case (s, got) =>
      assert(got == tok.tokenize(s).toSeq, s"transformer diverged on: $s")
    }
  }

  test("null row -> null output (A9); mode param validates (A3)") {
    val df = Seq(Option("本を読む。"), None).toDF("text")
    val r = new JaTokenizerTransformer().setInputCol("text").setOutputCol("toks")
      .transform(df).select("toks").collect()
    assert(r(0).getSeq[String](0) == Seq("本", "読む"))
    assert(r(1).isNullAt(0))
    intercept[IllegalArgumentException] {
      new JaTokenizerTransformer().setMode("BOGUS")
    }
  }

  test("composes into a CountVectorizer -> IDF pipeline and fits end-to-end") {
    val df = JaGolden.corpus.take(200).map(_.sentence).toDF("text")
    val pipe = new Pipeline().setStages(Array(
      new JaTokenizerTransformer().setInputCol("text").setOutputCol("toks"),
      new CountVectorizer().setInputCol("toks").setOutputCol("tf").setVocabSize(64),
      new IDF().setInputCol("tf").setOutputCol("tfidf")))
    val model = pipe.fit(df)
    val vocab = model.stages(1).asInstanceOf[CountVectorizerModel].vocabulary
    assert(vocab.nonEmpty && vocab.length <= 64)
    // the vocabulary is made of the kernel's lemmatized tokens, not surfaces
    val kernelToks = {
      val tok = new JaTokenizer()
      JaGolden.corpus.take(200).flatMap(c => tok.tokenize(c.sentence)).toSet
    }
    assert(vocab.forall(kernelToks.contains),
      s"vocab tokens not from the kernel: ${vocab.filterNot(kernelToks.contains).mkString(",")}")
    val vecs = model.transform(df).select("tfidf").collect()
    assert(vecs.length == 200 &&
      vecs.exists(_.getAs[SparseVector](0).numNonzeros > 0))
  }

  test("pipeline persistence round-trips the params and the output") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ml_tok").toString
    val stage = new JaTokenizerTransformer().setInputCol("text").setOutputCol("toks")
      .setMode("SEARCH").setStopWords(Array.empty[String])
    stage.write.overwrite().save(dir)
    val loaded = JaTokenizerTransformer.load(dir)
    assert(loaded.getMode == "SEARCH")
    val df = Seq("プラネタリウムは楽しい。").toDF("text")
    val a = stage.transform(df).select("toks").head().getSeq[String](0)
    val b = loaded.transform(df).select("toks").head().getSeq[String](0)
    assert(a == b && a.nonEmpty)
  }
}
