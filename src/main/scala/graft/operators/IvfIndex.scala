package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosine_sim, nearest_centroid}

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the classic two-level ANN: k-means-style coarse quantizer →
  * per-centroid posting lists → queries probe only the `nprobe` nearest
  * lists (the IVF stage of Jégou/Douze/Schmid 2011, "Product quantization
  * for nearest neighbor search", sans the PQ residual codes).
  *
  * Scale shape (SURVEY.md §2-C): centroid fitting is the ONLY driver-side
  * state and is sample-bounded (`maxSample` vectors — the standard ANN
  * practice of training the coarse quantizer on a corpus sample); the
  * expensive passes — assignment and search — are fully distributed.
  * Assignment is a shuffle-free per-row argmax against plan-embedded
  * centroids (a codegen'd expression — no crossJoin, no window, no
  * exchange); search joins query probes to posting lists on the cid
  * equi-key, hash-partitioned.
  *
  * Determinism: the fit sample is the first `maxSample` vectors by vec_id
  * (no RNG), Lloyd iterations are fixed-count, and every accumulation is a
  * left-to-right double fold in vec_id/dimension order — so an engine
  * replaying the same ordered folds reproduces the centroids bit-for-bit
  * (q54's DuckDB oracle replays fit + assign + probe search exactly).
  */
object IvfIndex {

  final case class Model(centroids: Array[(Int, Array[Double])]) {
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      centroids.toSeq.map { case (id, v) => (id, v.toSeq) }.toDF("cid", "centroid")
    }
    /** Centroid vectors indexed by cid, for the per-row argmax kernel. */
    private[operators] def arrays: Array[Array[Double]] =
      centroids.sortBy(_._1).map(_._2)
  }

  /** Cosine with the exact accumulation order of graft.expr.Kernels.cosine
    * (single pass, dot/na/nb each summed left-to-right): fit on the driver
    * and assignment on executors must agree bit-for-bit.
    */
  private def cosine(a: Array[Double], b: Array[Double]): java.lang.Double = {
    if (a.length != b.length) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  private def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = Double.NegativeInfinity
    var bestIdx = 0
    var i = 0
    while (i < cents.length) {
      val c = cosine(v, cents(i))
      if (c != null && c.doubleValue > best) { best = c.doubleValue; bestIdx = i }
      i += 1
    }
    bestIdx
  }

  /** Fit nlist centroids with `iters` Lloyd iterations over a driver-side
    * sample: the first `maxSample` vectors by vec_id (TakeOrdered — a
    * bounded collect regardless of corpus size). Init = the first nlist
    * sample vectors. Empty clusters keep their previous centroid.
    */
  def fit(corpus: DataFrame, nlist: Int, iters: Int = 3, maxSample: Int = 65536): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs: Array[Array[Double]] = corpus
      .orderBy("vec_id").limit(maxSample)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .sortBy(_._1).map(_._2.toArray)
    require(vecs.length >= nlist, s"need >= $nlist sample vectors, got ${vecs.length}")

    var cents: Array[Array[Double]] = vecs.take(nlist).map(_.clone)
    (1 to iters).foreach { _ =>
      val sums = cents.map(c => new Array[Double](c.length))
      val cnts = new Array[Long](nlist)
      vecs.foreach { v =>
        val ci = nearest(v, cents)
        cnts(ci) += 1
        val s = sums(ci)
        var d = 0
        while (d < v.length && d < s.length) { s(d) += v(d); d += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, i) =>
        if (cnts(i) == 0L) old else sums(i).map(_ / cnts(i))
      }
    }
    Model(cents.zipWithIndex.map { case (c, i) => (i, c) })
  }

  /** Nearest-centroid assignment: corpus columns + cid. A pure projection —
    * the argmax runs per row inside whole-stage codegen against the
    * plan-embedded centroid array (kilobytes), so the corpus scan stays
    * shuffle-free: no crossJoin row inflation, no per-vector window.
    */
  def assign(corpus: DataFrame, model: Model): DataFrame =
    corpus.withColumn("cid", nearest_centroid(col("embedding"), model.arrays))

  /** Probe search: each query visits its `nprobe` nearest posting lists
    * only; candidates meet on the cid equi-key. Output: qid, nid, cos, rn.
    */
  def search(corpus: DataFrame, queries: DataFrame, model: Model,
      k: Int, nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    val cdf = broadcast(model.toDF(spark))
    val lists = assign(corpus, model)
      .select(col("vec_id").as("nid"), col("embedding").as("n_emb"), col("cid"))

    // probe selection over |queries| × nlist rows — both sides small; the
    // corpus-sized work below never inflates
    val qScored = queries.select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
      .crossJoin(cdf)
      .withColumn("sim", cosine_sim(col("q_emb"), col("centroid")))
    val wq = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    val probes = qScored.withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nprobe)
      .select(col("qid"), col("q_emb"), col("cid"))

    val cand = broadcast(probes).join(lists, Seq("cid"))
      .where(col("nid") =!= col("qid"))
      .withColumn("cos", cosine_sim(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    cand.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }
}
