package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.graft_hash64

/** Seed-labeled quality/language classifier training — the fastText-style
  * linear-model rung of the curation stack (Joulin et al. 2017 train a
  * linear classifier over hashed n-gram features for exactly this job;
  * CCNet and the Llama data pipeline gate pages with such models): given a
  * deterministic seed labeling (a known-good source, a language column, an
  * existing gate), learn integer feature weights that generalize the seed
  * signal, and score EVERY document with the learned model.
  *
  * The learner is the BATCH perceptron (the per-epoch sum of misclassified
  * feature vectors, Rosenblatt's rule aggregated per epoch): unlike the
  * online perceptron — whose weight trajectory depends on row ORDER and so
  * can never sit on a distributed exact-hash gate — the batch update is a
  * commutative integer sum, making the final weights a pure function of
  * the corpus under ANY partitioning, and replayable in SQL with the
  * epochs unrolled as CTEs (the q162 k-means discipline applied to a
  * learner).
  */
object QualityClassifier {

  /** Batch-perceptron training + full-corpus scoring.
    *
    * Features: token occurrences hashed into `nFeatures` buckets with
    * graft_hash64 (poly-131 over code points, mod 1e9+7 — non-negative, so
    * plain `%` is the bucket map in both engines); x[f] = occurrence count.
    * Label: `label` must evaluate to ±1; `isTrain` selects the training
    * split (evaluation covers every doc, including held-out).
    *
    * Epoch e: score each training doc under w (integer dot product),
    * collect Δ[f] = Σ_{y·score ≤ 0} y·x[f] over the misclassified set, and
    * set w ← w + Δ. From w = 0 every training doc is misclassified
    * (y·0 ≤ 0), so epoch 1 degenerates to the class-difference centroid —
    * the documented starting step. Driver state: nFeatures longs (the
    * k-means centroid class); each epoch is one scan of the feature frame
    * (two shuffles: the doc-keyed score aggregate and the ≤nFeatures-group
    * delta aggregate). Exactness bound: |w[f]| ≤ training token count T,
    * so |score| ≤ T·(doc tokens) — under 2⁶³ through ~10⁹-token training
    * splits per 10⁹-token documents; far past any real split.
    *
    * Output per doc: doc_id, y, score (integer dot under the FINAL
    * weights), pred (+1 iff score > 0), correct, is_train — the confusion
    * table and train/held-out accuracy read directly off it.
    */
  def perceptron(docs: DataFrame, idCol: String, textCol: String,
      label: Column, isTrain: Column, nFeatures: Int = 32,
      epochs: Int = 2): DataFrame = {
    require(nFeatures >= 1 && nFeatures <= 4096,
      "perceptron: nFeatures in [1, 4096] (weights are driver state)")
    require(epochs >= 1 && epochs <= 8,
      "perceptron: epochs in [1, 8] (each epoch is unrolled in the oracle)")

    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__text"),
      label.cast("long").as("y"),
      isTrain.cast("boolean").as("is_train"))
    // the feature frame is read 2× per epoch (score + delta) plus once
    // for final scoring — localCheckpoint (the q67/Graph precedent) pays
    // the corpus token explode exactly once; the checkpointed frame is
    // ≤ nFeatures rows per doc, far narrower than the corpus
    val feats = base
      .select(col("doc_id"), explode(split(col("__text"), " ")).as("tok"))
      .select(col("doc_id"),
        (graft_hash64(col("tok")) % nFeatures).cast("int").as("f"))
      .groupBy("doc_id", "f").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val lab = base.select(col("doc_id"), col("y"), col("is_train"))
    val trainFeats = feats
      .join(lab.where(col("is_train")).select("doc_id", "y"), Seq("doc_id"))
      .localCheckpoint()

    var wts = Array.fill(nFeatures)(0L)
    (1 to epochs).foreach { _ =>
      val wLit = array(wts.toIndexedSeq.map(lit): _*)
      val mis = trainFeats
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("cnt") * element_at(wLit, col("f") + 1)).as("s"))
        .where(col("y") * col("s") <= 0L)
        .select(col("doc_id"), col("y"))
      val deltas = trainFeats.join(mis, Seq("doc_id", "y"))
        .groupBy("f").agg(sum(col("y") * col("cnt")).as("d"))
        .collect()
      val next = wts.clone()
      deltas.foreach(r => next(r.getInt(0)) += r.getLong(1))
      wts = next
    }

    val wFinal = array(wts.toIndexedSeq.map(lit): _*)
    val scores = feats.groupBy("doc_id")
      .agg(sum(col("cnt") * element_at(wFinal, col("f") + 1)).as("score"))
    lab.join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"), col("y"),
        coalesce(col("score"), lit(0L)).as("score"), col("is_train"))
      .withColumn("pred", when(col("score") > 0L, 1L).otherwise(-1L))
      .withColumn("correct", col("pred") === col("y"))
      .select(col("doc_id"), col("y"), col("score"), col("pred"),
        col("correct"), col("is_train"))
  }
}
