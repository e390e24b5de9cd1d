package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.kmeans_assign

/** Scalar int8 quantization for embedding columns — the memory-side
  * enabler for similarity search at corpus scale: a 64-dim float32 vector
  * (256 B) becomes 64 int8 codes + one scale (~68 B), a ~3.7× reduction
  * that lets executors hold the code table for billions of vectors while
  * full-precision vectors stay in parquet for re-ranking (the standard
  * IVF-PQ-style two-tier layout, here with the simplest codebook).
  *
  * Symmetric per-vector scaling: scale = max|x|/127, code = ⌊x/scale + ½⌋.
  * Zero maps to zero, codes never exceed ±127 by construction, and every
  * step (divide, floor, multiply, left-to-right error sum) is a single
  * IEEE-754 operation — so scale and reconstruction error are
  * bit-reproducible cross-engine (the oracle-determinism rules in
  * Relational.scala). A pure per-row projection: no shuffle, no state.
  */
object Quantize {

  /** (idCol, scale, codes array<long in [-127,127]>, max_abs_code,
    * recon_err = Σ|x − code·scale| folded left-to-right). All-zero vectors
    * get scale 0, zero codes, zero error.
    */
  def int8(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    // `scale` is projected as an attribute BEFORE the per-element lambdas
    // reference it — nested, the array_max would re-evaluate per element
    // (the higher-order-lambda trap, PLANS.md)
    df.select(col(idCol), transform(col(embCol), x => x.cast("double")).as("e"))
      .select(col(idCol), col("e"),
        (array_max(transform(col("e"), x => abs(x))) / 127).as("scale"))
      .select(
        col(idCol),
        col("scale"),
        when(col("scale") === 0d, transform(col("e"), _ => lit(0L)))
          .otherwise(transform(col("e"),
            x => floor(x / col("scale") + 0.5).cast("long")))
          .as("codes"),
        when(col("scale") === 0d, lit(0L))
          .otherwise(array_max(transform(col("e"),
            x => abs(floor(x / col("scale") + 0.5)).cast("long"))))
          .as("max_abs_code"),
        when(col("scale") === 0d, lit(0d))
          .otherwise(aggregate(col("e"), lit(0d),
            (acc, x) => acc + abs(x - floor(x / col("scale") + 0.5) * col("scale"))))
          .as("recon_err"))
  }

  /** Product-quantization ANN (Jégou, Douze & Schmid, TPAMI 2011): split
    * each vector into `m` subspaces, train a per-subspace codebook with
    * the exact integer Lloyd of [[Clustering.fitCentroids]], encode the
    * corpus as `m` byte codes, and answer queries with asymmetric distance
    * computation (ADC) — per query, the m·kCent exact subspace distances
    * are precomputed ONCE into a lookup table and each corpus row's
    * distance is m table lookups, never a vector op.
    *
    * This is the remaining codebook rung of the similarity stack:
    * [[int8]] is the scalar codebook (4 bits of precision per dim at full
    * dim count), PQ trades dims for centroids — 64 float dims (256 B)
    * become m=4 codes (4 B at kCent ≤ 256), a 64× compression that lets
    * one executor hold codes for ~10⁹ vectors while the float vectors stay
    * in parquet (compose [[Similarity.quantizedRerankTopK]]'s re-rank join
    * on the ADC candidates for the full IVFADC layout).
    *
    * Determinism (the q162 contract end-to-end): codebooks are pure
    * functions of the corpus (quantize-once, integer distances, truncating
    * means, tie → smaller cid, seeds = first kCent by vec_id — shared
    * across subspaces); encoding ties break to the smaller code; ADC
    * distances are exact longs (query quantized with the same
    * floor(x·scale)); the top-k window orders by (dist, nid). The oracle
    * replays the fit, the encoding, AND the lookup-table composition.
    *
    * Id contract (the cosineTopK "self excluded" rule): queries are
    * assumed to be corpus rows, and each query's own vec_id is excluded
    * from its neighbor list BY ID — an external query frame must use ids
    * disjoint from the corpus or accept that colliding ids are dropped.
    *
    * Scale shape: fit = m·iters corpus scans over the SLICED vectors (each
    * the [[Clustering.kmeansInt]] shape: codegen argmin projection +
    * kCent·subDims-group partial agg, driver state m·kCent·subDims longs);
    * encode = ONE corpus scan with m codegen argmins per row, no shuffle;
    * search = ONE scan of the (nid, m codes) frame against the broadcast
    * per-query tables (|queries|·m·kCent longs), then the per-query top-k
    * window — parallelism |queries|, the [[Similarity.cosineTopK]] shape.
    * Output: qid, nid, dist (exact long ADC distance), rn ≤ topK.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, m: Int, kCent: Int,
      iters: Int, topK: Int, scale: Long = 1L << 20): DataFrame = {
    require(m >= 1 && m <= 64, "pqTopK: m in [1, 64]")
    require(kCent >= 1 && kCent <= 256, "pqTopK: kCent in [1, 256] (codes pack into bytes)")
    require(iters >= 1, "pqTopK: iters must be >= 1")
    require(topK >= 1 && topK <= 512, "pqTopK: topK in [1, 512]")
    val spark = corpus.sparkSession
    import spark.implicits._

    val base = corpus.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding"))
    val inDims = Clustering.embeddingDims(base, "pqTopK")
    require(inDims % m == 0, s"pqTopK: $inDims dims not divisible by m=$m")
    val sub = inDims / m

    // collect + validate the bounded query set BEFORE the m·iters fit
    // scans — an empty or wrong-dims query frame must not cost a fit
    val qRows = queries
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    require(qRows.nonEmpty, "pqTopK: empty query set")
    qRows.foreach { case (qid, emb) =>
      require(emb.length == inDims,
        s"pqTopK: query $qid has ${emb.length} dims, corpus has $inDims")
    }

    // per-subspace codebooks under the exact kmeansInt arithmetic; the
    // slice is 1-based and the seed rule (first kCent by vec_id) picks the
    // SAME seed rows in every subspace, so the oracle shares one seed CTE.
    // All m sub-fits batched into one scan per iteration (r21): identical
    // centroids, m·iters corpus scans down to iters.
    val cents: Array[Array[Array[Long]]] =
      Clustering.fitCentroidsSliced(base, m, sub, kCent, iters, scale,
        op = "pqTopK")

    // encode: m codegen argmins in one projection — no shuffle, the codes
    // frame is the hot structure (m bytes + id per corpus row)
    val encoded = base.select(
      (col("vec_id").as("nid") +: (0 until m).map { j =>
        (kmeans_assign(slice(col("embedding"), j * sub + 1, sub), cents(j), scale)
          .bitwiseAND(lit(255L))).cast("int").as(s"c$j")
      }): _*)

    // ADC tables (the IVF-fit bounded-collect class): each query's
    // m·kCent exact subspace distances flattened row-major
    val dtRows = qRows.map { case (qid, emb) =>
      val qq = emb.map(x => math.floor(x * scale).toLong).toArray
      val flat = new Array[Long](m * kCent)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < kCent) {
          var s = 0L
          var d = 0
          while (d < sub) {
            val diff = qq(j * sub + d) - cents(j)(c)(d)
            s += diff * diff
            d += 1
          }
          flat(j * kCent + c) = s
          c += 1
        }
        j += 1
      }
      (qid, flat.toSeq)
    }.toSeq
    val dts = broadcast(spark.createDataFrame(dtRows).toDF("qid", "dt"))

    // ADC distance = m literal-index lookups, a codegen-friendly sum of
    // element_at — no lambda, no per-row loop over a higher-order function
    val dist = (0 until m).map { j =>
      element_at(col("dt"), col(s"c$j") + lit(j * kCent) + lit(1))
    }.reduce(_ + _)
    val scored = encoded.crossJoin(dts)
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), dist.as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("nid"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= topK)
      .select(col("qid"), col("nid"), col("dist"), col("rn"))
  }

  /** IVFADC — the full Jégou 2011 production layout and the composition
    * capstone of the ANN stack ([[Similarity.cosineTopK]] flat →
    * [[Similarity.bucketedCosineTopK]] LSH → [[IvfIndex]] coarse lists →
    * [[Similarity.quantizedRerankTopK]] int8 re-rank → [[pqTopK]] PQ flat
    * → this): a coarse integer-k-means quantizer partitions the corpus
    * into kCoarse inverted lists; each vector's RESIDUAL from its coarse
    * centroid is product-quantized with per-subspace codebooks; a query
    * probes only its `nprobe` nearest coarse lists and scores candidates
    * by table lookups over the residual codebooks. Scanned work per query
    * drops by ~kCoarse/nprobe relative to [[pqTopK]] while the residual
    * codebooks see far less variance than raw vectors — the reason this
    * layout serves billion-vector indexes.
    *
    * Determinism end-to-end in the q162 integer arithmetic: the coarse
    * fit and assignment are [[Clustering.fitCentroids]]/kmeans_assign
    * exactly; residuals are exact long differences in the quantized
    * space; the residual sub-fits run the SAME Lloyd at scale 1 (the
    * residual longs pass through floor(x·1) unchanged — exact below
    * 2⁵³); probe selection orders coarse lists by (dist, cid); the final
    * rank orders by (dist, nid). The oracle replays every stage.
    *
    * Id contract as [[pqTopK]]: each query's own vec_id is excluded by id.
    *
    * Scale shape: coarse fit = iters corpus scans (kmeansInt); the
    * residual frame (vec_id, cid, residual longs) is localCheckpointed
    * ONCE and feeds the m·iters sub-fits and the encode projection, so
    * the raw corpus is never re-read by the PQ stage; search = broadcast
    * (qid, probed-cid, table) frame equi-JOINED on the coarse cid — the
    * corpus never meets unprobed queries, unlike pqTopK's crossJoin —
    * then the per-query top-k window (ONE hashpartitioning exchange).
    * Output: qid, nid, dist (exact long residual-ADC distance), rn.
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, kCoarse: Int,
      nprobe: Int, m: Int, kCent: Int, iters: Int, topK: Int,
      scale: Long = 1L << 20): DataFrame = {
    require(kCoarse >= 1 && kCoarse <= 256, "ivfAdcTopK: kCoarse in [1, 256]")
    require(nprobe >= 1 && nprobe <= kCoarse, "ivfAdcTopK: nprobe in [1, kCoarse]")
    require(m >= 1 && m <= 64, "ivfAdcTopK: m in [1, 64]")
    require(kCent >= 1 && kCent <= 256, "ivfAdcTopK: kCent in [1, 256]")
    require(iters >= 1, "ivfAdcTopK: iters must be >= 1")
    require(topK >= 1 && topK <= 512, "ivfAdcTopK: topK in [1, 512]")
    val spark = corpus.sparkSession
    import spark.implicits._

    val base = corpus.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding"))
    val inDims = Clustering.embeddingDims(base, "ivfAdcTopK")
    require(inDims % m == 0, s"ivfAdcTopK: $inDims dims not divisible by m=$m")
    val sub = inDims / m

    val qRows = queries
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    require(qRows.nonEmpty, "ivfAdcTopK: empty query set")
    qRows.foreach { case (qid, emb) =>
      require(emb.length == inDims,
        s"ivfAdcTopK: query $qid has ${emb.length} dims, corpus has $inDims")
    }

    // stage 1: coarse quantizer (the q162 fit) + per-row residuals; the
    // residual frame is materialized ONCE — the sub-fits and the encode
    // would otherwise re-derive coarse assignment m·iters + 1 times
    val coarse = Clustering.fitCentroids(base, kCoarse, iters, scale,
      op = "ivfAdcTopK")
    val coarseLit = array(coarse.toIndexedSeq.map(row =>
      array(row.toIndexedSeq.map(lit): _*)): _*)
    val resid = base
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * scale.toDouble).cast("long")).as("q"),
        (kmeans_assign(col("embedding"), coarse, scale)
          .bitwiseAND(lit(255L))).cast("int").as("cid"))
      .select(col("vec_id"), col("cid"),
        zip_with(col("q"), element_at(coarseLit, col("cid") + 1),
          (a, b) => a - b).as("r"))
      .localCheckpoint()

    // stage 2: per-subspace residual codebooks — the same Lloyd at scale
    // 1 (floor(x·1) is the identity on the residual longs, exact < 2^53).
    // All m sub-fits batched into one scan per iteration over the
    // checkpointed residual frame (r21): identical centroids, m·iters
    // scans down to iters.
    val residEmb = resid.select(col("vec_id"),
      col("r").cast("array<double>").as("embedding"))
    val cents: Array[Array[Array[Long]]] =
      Clustering.fitCentroidsSliced(residEmb, m, sub, kCent, iters, 1L,
        op = "ivfAdcTopK")

    // stage 3: encode — coarse list id + m residual codes in one
    // projection over the checkpointed frame (no join, no re-scan)
    val encoded = resid.select(
      (col("vec_id").as("nid") +: col("cid").as("cid") +:
        (0 until m).map { j =>
          (kmeans_assign(
              slice(col("r"), j * sub + 1, sub).cast("array<double>"),
              cents(j), 1L)
            .bitwiseAND(lit(255L))).cast("int").as(s"c$j")
        }): _*)

    // stage 4: probe tables — per query, the nprobe nearest coarse lists
    // by (dist, cid), and for EACH probed list the query's residual from
    // THAT centroid product-quantized into an m·kCent lookup table
    val tableRows = qRows.flatMap { case (qid, emb) =>
      val qq = emb.map(x => math.floor(x * scale).toLong).toArray
      val coarseDists = coarse.indices.map { c =>
        var s = 0L
        var d = 0
        while (d < inDims) { val diff = qq(d) - coarse(c)(d); s += diff * diff; d += 1 }
        (s, c)
      }
      val probed = coarseDists.sorted.take(nprobe).map(_._2)
      probed.map { pc =>
        val flat = new Array[Long](m * kCent)
        var j = 0
        while (j < m) {
          var c = 0
          while (c < kCent) {
            var s = 0L
            var d = 0
            while (d < sub) {
              val qr = qq(j * sub + d) - coarse(pc)(j * sub + d)
              val diff = qr - cents(j)(c)(d)
              s += diff * diff
              d += 1
            }
            flat(j * kCent + c) = s
            c += 1
          }
          j += 1
        }
        (qid, pc, flat.toSeq)
      }
    }.toSeq
    val tables = broadcast(
      spark.createDataFrame(tableRows).toDF("qid", "cid", "dt"))

    // stage 5: candidates = corpus rows in a probed list — a broadcast
    // EQUI-join on the coarse cid (the corpus never meets unprobed
    // queries); distance = m residual-table lookups; per-query top-k
    val dist = (0 until m).map { j =>
      element_at(col("dt"), col(s"c$j") + lit(j * kCent) + lit(1))
    }.reduce(_ + _)
    val scored = encoded.join(tables, Seq("cid"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), dist.as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("nid"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= topK)
      .select(col("qid"), col("nid"), col("dist"), col("rn"))
  }
}
