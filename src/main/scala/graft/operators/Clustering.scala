package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.kmeans_assign

/** Exact distributed k-means over an embedding column, in scaled integer
  * arithmetic — the full-corpus complement to [[IvfIndex.fit]]'s
  * sample-bounded driver-side Lloyd: here the E-step (assignment) and the
  * M-step (per-cluster per-dimension mean) are cluster-wide operations, so
  * the centroids are exact over ALL rows, not a 65k sample. The curation
  * uses: corpus partitioning for per-cluster quality gates / dedup domains
  * (the SemDeDup grouping), balanced shard assignment, and diversity-aware
  * sampling strata.
  *
  * Determinism (the q42 all-integer rule): each element is quantized
  * `floor(x · scale)` once (one IEEE double multiply — bit-identical in any
  * engine), distances are exact long sums of squares, means are
  * truncating integer divisions (`/` here, `//` in the DuckDB oracle), and
  * ties pick the smaller cid — so every iteration, and therefore the final
  * assignment, is a pure function of the input under ANY partitioning and
  * replays on the exact-hash oracle gate with the iterations unrolled as
  * CTEs (q162).
  *
  * Scale shape: per iteration ONE corpus scan — assignment is a shuffle-free
  * codegen'd per-row argmin against plan-embedded centroids
  * ([[graft.expr.KmeansAssign]]; no crossJoin, no window), and the M-step is
  * a posexplode + hash aggregate over (cid, dim) — k·dims groups, collapsed
  * map-side to k·dims partials per task, then a k·dims-row collect (driver
  * state: k·dims longs, corpus-size-independent). At 100 TB that is `iters`
  * sequential scans — the k-means lower bound — with zero data shuffle
  * beyond the 256-group partial-agg exchange. Init is the first k vectors
  * by vec_id (TakeOrdered — bounded, no RNG); empty clusters keep their
  * previous centroid (the [[IvfIndex.fit]] rule).
  */
object Clustering {

  /** Deterministic ±1 random projection to `outDims` dimensions
    * (Achlioptas, JCSS 2003) — the embedding-sketch step before LSH
    * banding, coarse clustering, or shipping vectors off-cluster: 64
    * float dims become `outDims` exact longs, 4× narrower at outDims=8.
    * The sign matrix derives from polyHash("j:d") parity — no RNG, so the
    * SQL oracle regenerates the identical matrix and the projection sits
    * on the exact-hash gate.
    *
    * Scale shape: a single codegen'd projection ([[graft.expr.RandProject]]
    * — no shuffle, no per-dim explode; the unnest+join formulation
    * shuffles rows·dims). Output: vec_id, p0..p{outDims−1} as columns.
    */
  /** First-row dimensionality probe shared by randomProjection and
    * [[Quantize.pqTopK]] — one bounded limit(1) job; an empty frame gets a
    * contract error naming the caller, not an index crash.
    */
  private[operators] def embeddingDims(df: DataFrame, op: String): Int = {
    val head = df.select(col("embedding")).limit(1).collect()
    require(head.nonEmpty, s"$op: empty embedding frame")
    head(0).getSeq[Any](0).length
  }

  def randomProjection(corpus: DataFrame, outDims: Int,
      scale: Long = 1L << 20): DataFrame = {
    require(outDims >= 1 && outDims <= 64, "randomProjection: outDims in [1, 64]")
    val inDims = embeddingDims(corpus, "randomProjection")
    val signs: Array[Array[Int]] = Array.tabulate(outDims, inDims) { (j, d) =>
      val h = graft.expr.Kernels.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$j:${d + 1}"))
      if (h % 2 == 0) 1 else -1
    }
    // materialize the kernel ONCE per row, then extract — element_at over
    // the raw expression would re-run the projection per output column
    corpus.select(col("vec_id"),
        graft.functions.rand_project(col("embedding"), signs, scale).as("__p"))
      .select(
        (col("vec_id") +: (0 until outDims).map(j =>
          element_at(col("__p"), j + 1).as(s"p$j"))): _*)
  }

  /** Returns (vec_id, cid, dist): the assignment under the final centroids
    * after `iters` full Lloyd update cycles, dist = exact squared L2 in the
    * quantized space.
    */
  def kmeansInt(corpus: DataFrame, k: Int, iters: Int,
      scale: Long = 1L << 20): DataFrame = {
    val base = corpus.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding"))
    val cents = fitCentroids(base, k, iters, scale)
    base.select(col("vec_id"),
        kmeans_assign(col("embedding"), cents, scale).as("__packed"))
      .select(col("vec_id"),
        col("__packed").bitwiseAND(lit(255L)).cast("int").as("cid"),
        shiftright(col("__packed"), 8).as("dist"))
  }

  /** The Lloyd fit extracted from [[kmeansInt]] so product quantization
    * ([[Quantize.pqTopK]]) can train per-subspace codebooks under the
    * IDENTICAL arithmetic contract (quantize-once, exact long distances,
    * truncating-division means, tie → smaller cid, empty cluster keeps its
    * centroid, seeds = first k rows by vec_id). `base` must expose
    * (vec_id: long, embedding: array<float|double>). Returns the final
    * centroid matrix in quantized space — k·dims longs of driver state.
    */
  private[operators] def fitCentroids(base: DataFrame, k: Int, iters: Int,
      scale: Long, op: String = "kmeansInt"): Array[Array[Long]] = {
    require(k >= 1 && k <= 256, s"$op: k in [1, 256] (cid packs into 8 bits)")
    require(iters >= 1, s"$op: iters must be >= 1")
    val spark = base.sparkSession
    import spark.implicits._

    def quantized(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") * scale.toDouble).cast("long")

    // init: first k vectors by vec_id, quantized — a bounded TakeOrdered(k)
    val seedRows = base.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    require(seedRows.length == k, s"$op: need >= $k vectors, got ${seedRows.length}")
    var cents: Array[Array[Long]] =
      seedRows.map(_._2.map(x => math.floor(x * scale).toLong).toArray)

    (1 to iters).foreach { _ =>
      // one scan: E-step projection fused with the M-step explode+agg
      val sums = base
        .select((kmeans_assign(col("embedding"), cents, scale)
            .bitwiseAND(lit(255L))).cast("int").as("cid"),
          posexplode(col("embedding")).as(Seq("d", "x")))
        .groupBy(col("cid"), col("d"))
        .agg(sum(quantized(col("x"))).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone) // empty cluster keeps its centroid
      sums.foreach { r =>
        // truncating division, NOT floorDiv: DuckDB's `//` truncates toward
        // zero on negatives (-7 // 2 = -3), matching Scala `/` and Spark
        // `div` — the established div pairing; the mean rule is part of the
        // operator contract, so both engines must share it exactly
        next(r.getInt(0))(r.getInt(1)) = r.getLong(2) / r.getLong(3)
      }
      cents = next
    }
    cents
  }

  /** All m per-subspace Lloyd fits of product quantization in ONE scan per
    * iteration (r21): the m sub-fits are mathematically independent — each
    * subspace's E/M-step touches only its own slice — so running them as m
    * sequential [[fitCentroids]] calls paid m·iters corpus scans plus m
    * seed collects for work one scan per iteration can do. Per iteration,
    * each row emits (j, cid_j, d, x) for every subspace j via one
    * explode-of-structs projection; the aggregate groups by (j, cid, d) —
    * m·k·subDims groups, map-side combined, one bounded collect. The
    * per-subspace arithmetic (quantize-once, exact long argmin, truncating
    * division, tie → smaller cid, empty cluster keeps centroid, seeds =
    * first k rows by vec_id sliced per subspace) is IDENTICAL to m
    * independent fitCentroids calls — same centroids bit-for-bit, m× fewer
    * passes. `base` must expose (vec_id: long, embedding) with
    * m·subDims-wide embeddings.
    */
  private[operators] def fitCentroidsSliced(base: DataFrame, m: Int,
      subDims: Int, k: Int, iters: Int, scale: Long, op: String)
      : Array[Array[Array[Long]]] = {
    require(k >= 1 && k <= 256, s"$op: k in [1, 256] (cid packs into 8 bits)")
    require(iters >= 1, s"$op: iters must be >= 1")
    val spark = base.sparkSession
    import spark.implicits._

    def quantized(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") * scale.toDouble).cast("long")

    // ONE seed collect: the per-subspace seed rule is "first k rows by
    // vec_id, sliced" — the same k rows in every subspace, sliced locally
    val seedRows = base.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    require(seedRows.length == k, s"$op: need >= $k vectors, got ${seedRows.length}")
    var cents: Array[Array[Array[Long]]] = Array.tabulate(m) { j =>
      seedRows.map(_._2.slice(j * subDims, (j + 1) * subDims)
        .map(x => math.floor(x * scale).toLong).toArray)
    }

    (1 to iters).foreach { _ =>
      val subStructs = array((0 until m).map { j =>
        struct(lit(j).as("j"),
          (kmeans_assign(slice(col("embedding"), j * subDims + 1, subDims),
              cents(j), scale)
            .bitwiseAND(lit(255L))).cast("int").as("cid"),
          slice(col("embedding"), j * subDims + 1, subDims).as("sl"))
      }: _*)
      val sums = base
        .select(explode(subStructs).as("e"))
        .select(col("e.j").as("j"), col("e.cid").as("cid"),
          posexplode(col("e.sl")).as(Seq("d", "x")))
        .groupBy(col("j"), col("cid"), col("d"))
        .agg(sum(quantized(col("x"))).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.map(_.clone))
      sums.foreach { r =>
        // truncating division — the fitCentroids contract, see above
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getLong(3) / r.getLong(4)
      }
      cents = next
    }
    cents
  }
}
