package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.graft_hash64

/** Deterministic, engine-independent sampling and splitting for
  * training-data pipelines. Unlike rand()-based sampling, membership is a
  * pure function of the row's id (+ salt): reproducible across runs,
  * engines, and cluster topologies, stable under re-partitioning, and
  * joinable — two tables sampled with the same salt select the SAME ids,
  * which rand() can never guarantee. This is the property that matters at
  * 100 TB, where a "10% sample" must mean the same rows tomorrow.
  */
object Sampling {

  /** Hash bucket in [0, 100) for an id column and salt. */
  def pctBucket(id: Column, salt: String): Column =
    graft_hash64(concat(id.cast("string"), lit(":"), lit(salt))) % 100

  /** Keep ~pct% of rows, deterministically by id hash. */
  def sampleByHash(df: DataFrame, idCol: String, pct: Int, salt: String = "graft"): DataFrame =
    df.where(pctBucket(col(idCol), salt) < pct)

  /** Assign train/val/test splits by hash bucket: [0,train) → "train",
    * [train, train+val) → "val", rest → "test".
    */
  def trainValTestSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10, salt: String = "graft"): DataFrame = {
    require(trainPct + valPct <= 100)
    val b = pctBucket(col(idCol), salt)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Per-stratum reservoir sample: exactly min(k, |stratum|) rows per
    * stratum, selected and ordered by (hash(id:salt), id) — the balanced-
    * sampling step for mixing sources/domains/languages at fixed quotas.
    * Deterministic and repartition-stable (membership is a pure function
    * of id and salt, unlike rand()-reservoirs). The window partitions by
    * the stratum key, so parallelism = #strata and each task ranks one
    * stratum; at scale a heavily skewed stratum can pre-filter with
    * `pctBucket` before ranking to bound the sort input.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      k: Int, salt: String = "graft"): DataFrame = {
    val key = graft_hash64(concat(col(idCol).cast("string"), lit(":"), lit(salt)))
    df.withColumn("smp_key", key)
      .withColumn("sample_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(strataCol)).orderBy(col("smp_key"), col(idCol))))
      .where(col("sample_rank") <= k)
      .drop("smp_key")
  }

  /** Source-weighted mixture materialization — the "epochs per source"
    * step of an LLM training mix (GPT-3 Table 2.2-style): weight 2.3 on a
    * source repeats each of its rows 2 times plus a deterministic 30%
    * chance of a third copy; weight 0.4 keeps a 40% hash-sample; weight 0
    * drops the source. Fractions are resolved in basis points against the
    * row's id hash, so membership of the fractional copy is a pure
    * function of (id, salt) — reproducible, repartition-stable, and
    * engine-independent (the DuckDB oracle reproduces it exactly).
    *
    * Scale shape: one codegen'd projection + a map-side explode of a tiny
    * int sequence — no shuffle, no driver state; output partitioning
    * inherits the input's. `copy` (1..n) lets a downstream epoch shuffle
    * spread repeats across shards.
    */
  def mixtureWeights(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = "mix"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 100),
      "mixture weights must be in [0, 100]")
    def parts(w: Double): (Int, Int) = {
      val base = math.floor(w).toInt
      (base, math.round((w - base) * 10000).toInt)
    }
    val h = graft_hash64(concat(col(idCol).cast("string"), lit(":"), lit(salt))) % 10000
    val (db, dbp) = parts(defaultWeight)
    val (base, bp) = weights.foldLeft((lit(db), lit(dbp))) {
      case ((b, f), (k, v)) =>
        val (kb, kf) = parts(v)
        (when(col(sourceCol) === k, kb).otherwise(b),
          when(col(sourceCol) === k, kf).otherwise(f))
    }
    df.withColumn("n_copies", base + when(h < bp, 1).otherwise(0))
      .where(col("n_copies") >= 1)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies").cast("long"))))
      .drop("n_copies")
  }

  /** Deterministic epoch shuffle + shard assignment for training readers:
    * shard = hash(id:salt) mod numShards — reshuffled per epoch by
    * changing the salt — and a reading position WITHIN the shard ordered
    * by (hash, id). Each data-loader worker gets a disjoint, reproducible,
    * internally-shuffled slice. Deliberately NOT a global row_number (a
    * no-partition window is a single-reducer at scale): the per-shard
    * window partitions by shard, so parallelism = numShards and hash
    * balance bounds the skew; the id tiebreak makes positions unique and
    * engine-independent.
    */
  def epochShuffle(df: DataFrame, idCol: String, numShards: Int,
      salt: String = "epoch0"): DataFrame = {
    val h = graft_hash64(concat(col(idCol).cast("string"), lit(":"), lit(salt)))
    df.withColumn("shuffle_key", h)
      .withColumn("shard", pmod(col("shuffle_key"), lit(numShards.toLong)))
      .withColumn("pos_in_shard",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("shuffle_key"), col(idCol))))
  }
}

/** Benchmark decontamination: flag/remove training documents whose content
  * fingerprint collides with a held-out evaluation set — the standard
  * pre-training hygiene step. The benchmark side is small → broadcast
  * semi/anti join on a 128-bit md5 fingerprint (graft_hash64's ~2^30 range
  * would false-positive at billion-doc scale); the corpus scan never
  * shuffles.
  */
object Decontaminate {

  private def fp(textCol: String): Column = md5(col(textCol))

  /** Corpus rows whose exact content fingerprint appears in `benchmark`. */
  def flagExact(corpus: DataFrame, benchmark: DataFrame, textCol: String): DataFrame = {
    val bfp = benchmark.select(fp(textCol).as("__fp")).distinct()
    corpus.withColumn("__fp", fp(textCol))
      .join(broadcast(bfp), Seq("__fp"), "left_semi")
      .drop("__fp")
  }

  /** Corpus with exact benchmark collisions removed (anti join). */
  def removeExact(corpus: DataFrame, benchmark: DataFrame, textCol: String): DataFrame = {
    val bfp = benchmark.select(fp(textCol).as("__fp")).distinct()
    corpus.withColumn("__fp", fp(textCol))
      .join(broadcast(bfp), Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Near-duplicate benchmark contamination (the GPT-3/C4-style n-gram
    * overlap rule): a corpus doc is contaminated when ≥ `threshold` of its
    * distinct k-token shingles also occur anywhere in the benchmark set.
    * Returns (id, n_shingles, n_shared, contaminated).
    *
    * Scale shape: shingles travel as 8-byte hashes; the benchmark side
    * (distinct hashes of a test set — small by construction) broadcasts,
    * so the corpus never shuffles: scan → semi-match → per-doc count. The
    * integer comparison `shared·den ≥ num·total` avoids any FP ratio.
    */
  def flagNearNgram(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int = 6,
      thresholdNum: Int = 1, thresholdDen: Int = 2): DataFrame = {
    val ch = Dedup.hashedShingles(corpus, idCol, textCol, k)
    val bh = broadcast(
      Dedup.hashedShingles(benchmark, idCol, textCol, k)
        .select(col("h")).distinct())
    val shared = ch.join(bh, Seq("h"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
    ch.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
      .join(shared, Seq("id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("contaminated",
        col("n_shared") * thresholdDen >= col("n_shingles") * thresholdNum)
  }
}
