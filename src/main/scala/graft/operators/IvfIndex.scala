package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.cosine_sim

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the classic two-level ANN: k-means-style coarse quantizer →
  * per-centroid posting lists → queries probe only the `nprobe` nearest
  * lists (the IVF stage of Jégou/Douze/Schmid 2011, "Product quantization
  * for nearest neighbor search", sans the PQ residual codes).
  *
  * Scale shape (SURVEY.md §2-C): centroid fitting is the ONLY driver-side
  * state and is sample-bounded (nlist × dim floats — kilobytes); assignment
  * and search are broadcast-joins against that tiny table, so the corpus
  * scan stays embarrassingly parallel and the search join is keyed by
  * centroid id (equi-join, hash-partitioned). Determinism: centroids are
  * seeded by vec_id order (no RNG), Lloyd iterations are fixed-count, and
  * all scoring uses the ordered-reduce cosine kernel.
  */
object IvfIndex {

  final case class Model(centroids: Array[(Int, Array[Float])]) {
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      centroids.toSeq.map { case (id, v) => (id, v.toSeq) }.toDF("cid", "centroid")
    }
  }

  /** Fit nlist centroids with `iters` Lloyd iterations. Init = the first
    * nlist vectors by vec_id (deterministic). Each iteration: one broadcast
    * assignment pass + one aggregation; only the centroid table (tiny)
    * returns to the driver.
    */
  def fit(corpus: DataFrame, nlist: Int, iters: Int = 3): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var centroids: Array[(Int, Array[Float])] = corpus
      .orderBy("vec_id").limit(nlist)
      .select(col("embedding")).as[Seq[Float]].collect()
      .zipWithIndex.map { case (v, i) => (i, v.toArray) }

    (1 to iters).foreach { _ =>
      val cdf = broadcast(Model(centroids).toDF(spark)
        .select(col("cid"), col("centroid").cast("array<float>").as("centroid")))
      val assigned = assign(corpus, cdf)
      val next = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(avg(col("x")).as("mean"))
        .groupBy(col("cid"))
        .agg(map_from_arrays(collect_list(col("dim")), collect_list(col("mean"))).as("m"))
        .as[(Int, Map[Int, Double])]
        .collect()
      val updated = next.map { case (cid, m) =>
        val arr = new Array[Float](m.size)
        m.foreach { case (d, v) => arr(d) = v.toFloat }
        (cid, arr)
      }.toMap
      // empty lists keep their previous centroid
      centroids = centroids.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
    }
    Model(centroids)
  }

  /** Nearest-centroid assignment: (vec_id, embedding, label?, cid). */
  def assign(corpus: DataFrame, centroidDf: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroidDf))
      .withColumn("sim", cosine_sim(col("embedding"), col("centroid")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn", "sim", "centroid")
  }

  /** Probe search: each query visits its `nprobe` nearest posting lists
    * only; candidates meet on the cid equi-key. Output: qid, nid, cos, rn.
    */
  def search(corpus: DataFrame, queries: DataFrame, model: Model,
      k: Int, nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    val cdf = broadcast(model.toDF(spark)
      .select(col("cid"), col("centroid").cast("array<float>").as("centroid")))
    val lists = assign(corpus, cdf)
      .select(col("vec_id").as("nid"), col("embedding").as("n_emb"), col("cid"))

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
