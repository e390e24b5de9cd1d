package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_hash(str) → bigint` — deterministic polynomial string hash:
  * fold over Unicode code points, h ← (h·131 + cp) mod 1e9+7.
  *
  * Chosen to be exactly reproducible in portable SQL (the DuckDB oracle
  * recomputes it with list_reduce over code points — no engine-native hash
  * has that property), while staying cheap enough for per-shingle use in
  * MinHash pipelines. Not cryptographic. Participates in whole-stage
  * codegen via a static kernel call.
  */
case class GraftHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_hash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Kernels.polyHash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.polyHash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `char_stats(text) → array<bigint>` = `[n_chars, n_distinct, coll_num]`
  * over Unicode code points (see [[Kernels.charStats]]) — the per-row
  * kernel of the character-diversity gibberish gate: one codegen'd pass,
  * no explode, no shuffle, where the per-char groupBy formulation shuffles
  * every character of the corpus.
  */
/** `script_counts(text) → array<bigint>`: single-pass writing-system
  * class counts [n_chars, latin, digit, hiragana, katakana, kanji, space,
  * replacement, c0_ctrl] (see Kernels.scriptCounts) — the codegen kernel
  * behind q199's script-mix profile AND q197's encoding-damage gate (the
  * last two slots, VERDICT r17 #4: U+FFFD and the C0/DEL class, so both
  * gates share ONE char pass).
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def prettyName: String = "script_counts"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    Kernels.scriptCounts(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.scriptCounts($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `minhash_bands(text) → array<bigint>` =
  * `[n_distinct_shingles, band_0, …]` — fused shingle+MinHash+banding
  * kernel (layout and parity notes at [[Kernels.minhashBands]]); the
  * per-row scan kernel of Decontaminate.fuzzyContamination. Permutation
  * constants are immutable Seqs so structural equality (and codegen CSE)
  * hold — the round-17 AcMatch/BpeSegment lesson.
  */
case class MinhashBands(child: Expression, k: Int, aCo: Seq[Long], bCo: Seq[Long],
    bands: Int) extends UnaryExpression {

  require(k >= 1, "k must be >= 1")
  require(aCo.nonEmpty && aCo.length == bCo.length, "need matched (a, b) permutation seqs")
  require(bands >= 1 && aCo.length % bands == 0, "bands must divide numHashes")

  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val aArr = aCo.toArray
  @transient private lazy val bArr = bCo.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    Kernels.minhashBands(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, aArr, bArr, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhPermA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhPermB", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.Kernels.minhashBands($c, $k, $aRef, $bRef, $bands)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `repetition_signals(text) → array<bigint>`: single-pass Gopher
  * repetition-filter integers (Rae et al. 2021 Table A1) — token counts,
  * top-{2,3,4}-gram coverage, dup-{5..10}-gram span-union coverage, and
  * line/paragraph duplicate stats; layout documented at
  * [[Kernels.repetitionSignals]]. The per-row kernel behind
  * TextAnalysis.gopherRepetition: ONE pass over the tokens per n where
  * the relational formulation explodes the corpus ~9× and shuffles every
  * window.
  */
case class RepetitionSignals(child: Expression) extends UnaryExpression {

  override def prettyName: String = "repetition_signals"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    Kernels.repetitionSignals(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.repetitionSignals($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class CharStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "char_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    Kernels.charStats(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.charStats($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `shingle_hashes(text, k) → array<bigint>`: graft_hash64 of every
  * k-token shingle of a space-separated text, in order (duplicates kept —
  * follow with array_distinct for set semantics). Fuses split + slice +
  * concat_ws + hash into one codegen'd char pass; the shingle strings are
  * never materialized. Values are bit-identical to hashing the string
  * shingles, so the DuckDB oracles keep working unchanged.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "k must be >= 1")
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    Kernels.shingleHashes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.shingleHashes($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `rolling_window_hashes(text, win) → array<binary>`: 128-bit (16-byte)
  * fingerprints of every win-token window of a space-separated text, in
  * order — the O(n) rolling replacement for the O(n·L) per-position
  * md5-of-sliced-window form in exactSubstringSpans (VERDICT r15 #2). Two
  * independent wraparound-i64 polynomial rolls over fmix64-finalized token
  * hashes; see Kernels.rollingWindowHashes for the collision math (128 bits
  * keeps the 100 TB window count in md5's no-collision regime where 64
  * would not).
  */
case class RollingWindowHashes(child: Expression, win: Int) extends UnaryExpression {

  require(win >= 2, "win must be >= 2")
  override def prettyName: String = "rolling_window_hashes"
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    Kernels.rollingWindowHashes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.rollingWindowHashes($c, $win)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `bpe_segment(text) → array<string>`: row-level BPE segmentation through
  * a plan-embedded ordered merge table — the inference half of the
  * TextAnalysis.bpeMerges learner (Sennrich et al. 2016; VERDICT r15 #3).
  * Each word walks the learner's exact double-replace merge chain, so
  * learned-vocabulary words reproduce the training segmentation and new
  * words segment consistently. A pure codegen projection: the merge table
  * rides the plan (broadcast with the task closure), zero shuffle.
  */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  // merges is an immutable Seq of pairs, NOT Array[Array[String]]
  // (ADVICE r16): Catalyst compares constructor args with ==, and Array
  // equality is reference-based — an Array param defeats semanticEquals,
  // CSE, and exchange reuse for identical calls.
  require(merges.length <= 65536, "bpe_segment: merge table capped at 65536 rows (plan-embedded)")
  require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
    "bpe_segment: every merge row must be a non-empty (left, right) pair")
  // precomputed once per plan, shared by eval and generated code
  private val patterns: Array[String] = merges.map(m => " " + m._1 + " " + m._2 + " ").toArray
  private val replacements: Array[String] = merges.map(m => " " + m._1 + m._2 + " ").toArray

  override def prettyName: String = "bpe_segment"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    Kernels.bpeSegment(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      patterns, replacements)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("bpePatterns", patterns, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("bpeReplacements", replacements, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.bpeSegment($c, $pRef, $rRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `unigram_segment(text)` → array<string>: SentencePiece-style unigram-LM
  * Viterbi segmentation (Kudo 2018) over a plan-embedded (piece, prob)
  * vocabulary — the decode half of operators.TextAnalysis.unigramLmVocab.
  * A pure codegen projection like BpeSegment: the vocabulary rides the
  * plan as one reference object (never a join), so segmentation is
  * zero-shuffle at any corpus size. Constructor args are immutable Seqs
  * (the BpeSegment/ADVICE r16 lesson: Array params defeat semanticEquals
  * and exchange reuse).
  */
object UnigramSegment {
  /** 2^-84 — the smallest piece/unk probability compatible with the
    * kernel's one-boost-per-step renormalization invariant. */
  val MinProb: Double = java.lang.Math.scalb(1.0, -84)
}

case class UnigramSegment(child: Expression, pieces: Seq[String],
    probs: Seq[Double], unkScore: Double)
    extends UnaryExpression {

  require(pieces.nonEmpty && pieces.length == probs.length,
    "unigram_segment: pieces and probs must be equal-length and non-empty")
  require(pieces.length <= 65536,
    "unigram_segment: vocabulary capped at 65536 pieces (plan-embedded)")
  require(pieces.forall(_.nonEmpty), "unigram_segment: empty piece")
  // the floor 2^-84 is the one-boost-per-step invariant of the kernel's
  // power-of-two renormalization (round-19 review finding): a prob below
  // it can drive the stored dp to exactly 0.0 despite the boost, leaving
  // no chosen predecessor (the backtrack would read index -1). Library
  // callers always satisfy it — probs are freq/total with BIGINT totals
  // (>= 2^-63) and unkScore is 1/(total·10^6) (>= ~2^-83).
  require(probs.forall(p => p >= UnigramSegment.MinProb && p <= 1.0)
      && unkScore >= UnigramSegment.MinProb && unkScore <= 1.0,
    s"unigram_segment: probs and unkScore must be in [2^-84, 1]")

  // built once per plan, shared by eval and generated code
  private val vocabMap: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    pieces.iterator.zip(probs.iterator).foreach { case (pc, p) =>
      m.put(pc, java.lang.Double.valueOf(p))
    }
    m
  }
  private val maxLen: Int = pieces.iterator
    .map(p => p.codePointCount(0, p.length)).max

  override def prettyName: String = "unigram_segment"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    Kernels.unigramSegment(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      vocabMap, unkScore, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("unigramVocab", vocabMap, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.Kernels.unigramSegment($c, $vRef, $unkScore, $maxLen)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `unigram_expected(text)` → array<struct<piece string, q bigint>>:
  * forward–backward EXPECTED piece counts under the plan-embedded unigram
  * model — Kudo 2018 §3.2's true E-step (soft EM), the marginal-count
  * sibling of [[UnigramSegment]]'s Viterbi path (VERDICT r19 #2). Each
  * valid span's posterior mass α·p·β/Z is quantized to ⌊eq·2^24⌋ BEFORE it
  * leaves the row, so downstream corpus aggregation is integer-exact in any
  * order (see [[Kernels.unigramExpected]] for the full cross-engine
  * exactness argument: boosted linear-space sums, ordered left folds, the
  * [-2,2] emission boost-adjust bound). Same plan shape as UnigramSegment:
  * the vocabulary rides the plan as one reference object, segmentation is a
  * zero-shuffle codegen projection at any corpus size.
  */
case class UnigramExpected(child: Expression, pieces: Seq[String],
    probs: Seq[Double], unkScore: Double)
    extends UnaryExpression {

  require(pieces.nonEmpty && pieces.length == probs.length,
    "unigram_expected: pieces and probs must be equal-length and non-empty")
  require(pieces.length <= 65536,
    "unigram_expected: vocabulary capped at 65536 pieces (plan-embedded)")
  require(pieces.forall(_.nonEmpty), "unigram_expected: empty piece")
  // same floor as UnigramSegment: the one-boost renormalization invariant
  // and the spread ≤ 2 window bound both assume probs ≥ 2^-84
  require(probs.forall(p => p >= UnigramSegment.MinProb && p <= 1.0)
      && unkScore >= UnigramSegment.MinProb && unkScore <= 1.0,
    s"unigram_expected: probs and unkScore must be in [2^-84, 1]")

  private val vocabMap: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    pieces.iterator.zip(probs.iterator).foreach { case (pc, p) =>
      m.put(pc, java.lang.Double.valueOf(p))
    }
    m
  }
  private val maxLen: Int = pieces.iterator
    .map(p => p.codePointCount(0, p.length)).max
  // Fail at PLAN BUILD, not per-row in the codegen kernel (ADVICE r20 #3):
  // the kernel's spread ≤ 2 invariant holds because a boost band (2^256)
  // cannot be crossed in under ⌈256/84⌉ = 4 positions when every span
  // multiplies by ≥ MinProb = 2^-84 — so across the maxLen-wide lattice
  // window the boost moves at most ⌊(maxLen−1)/3⌋ bands. maxLen ≤ 7 keeps
  // that ≤ 2; a wider vocabulary piece must raise the renorm window bound
  // in Kernels.unigramExpected first, not fail a job mid-query.
  // ADVICE r21: the band math above (spread = ⌊(maxLen−1)/3⌋ ≤ 2) would in
  // fact admit maxLen up to 9; the pin at 7 is DELIBERATE conservative
  // headroom (one full band of margin against the crossing-count argument),
  // not the exact invariant — a caller needing 8–9 should re-derive the
  // window bound in Kernels.unigramExpected before loosening this.
  require(maxLen <= 7,
    s"unigram_expected: longest piece spans $maxLen codepoints — the " +
      "boost-renorm window bound (spread <= 2 at probs >= 2^-84) is only " +
      "proven for maxLen <= 7 (deliberately below the theoretical 9)")

  override def prettyName: String = "unigram_expected"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("piece", StringType, nullable = false),
      StructField("q", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    Kernels.unigramExpected(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      vocabMap, unkScore, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("unigramVocab", vocabMap, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.Kernels.unigramExpected($c, $vRef, $unkScore, $maxLen)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `simhash64(text, bits)` → bigint: per-row SimHash signature over the
  * space-separated token multiset (Charikar 2002). Fuses split + per-token
  * hash + per-bit vote into one codegen'd char pass — the explode + `bits`
  * sum-aggregates formulation shuffles every token, while this is a pure
  * projection (zero shuffle). Bit-identical to that formulation (and to the
  * DuckDB oracle's unnest + per-bit SUM).
  */
case class SimHash64(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Kernels.simhash64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], bits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.simhash64($c, $bits)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `nearest_centroid(emb)` → int: index of the cosine-nearest centroid in a
  * plan-embedded (broadcast-with-the-task) centroid table — the shuffle-free
  * IVF assignment path: a per-row argmax needs no crossJoin, no window, no
  * exchange. Ties pick the smallest index; a vector with no valid cosine
  * (zero norm) falls back to index 0 (matching `row_number over (order by
  * cos desc nulls last, cid)`).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "centroids must be non-empty")
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName expects an array<float|double> argument")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    java.lang.Integer.valueOf(Kernels.nearestCentroid(v.asInstanceOf[ArrayData], centroids, isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.nearestCentroid($c, $cRef, $isFloat)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `token_count(text)` → int, equal by construction to
  * `size(split(text, " ", -1))` — the allocation-free form the
  * [[graft.rules.TokenCountRewrite]] optimizer rule substitutes: the
  * split+size composition materializes the full token array per row only
  * to take its length; this is one byte pass. Codegen'd.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def prettyName: String = "token_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    java.lang.Integer.valueOf(Kernels.tokenCount(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.tokenCount($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `rand_project(emb)` → array<bigint>: ±1 sign-matrix projection of the
  * floor-quantized vector (see [[Kernels.randProject]]) — deterministic
  * dimensionality reduction as a pure codegen'd projection: no shuffle,
  * no per-dim explode, the 100 TB-safe shape for embedding sketches.
  */
case class RandProject(child: Expression, signs: Array[Array[Int]], scale: Long)
    extends UnaryExpression {

  require(signs.nonEmpty, "rand_project: need at least one output dimension")
  override def prettyName: String = "rand_project"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName expects an array<float|double> argument")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    Kernels.randProject(v.asInstanceOf[ArrayData], signs, scale, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("signs", signs, "int[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.randProject($c, $sRef, ${scale}L, $isFloat)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `kmeans_assign(emb)` → bigint: packed `(squared-L2-dist << 8) | cid`
  * against plan-embedded integer-quantized centroids — the shuffle-free
  * E-step of [[graft.operators.Clustering.kmeansInt]]: a per-row argmin
  * needs no crossJoin, no window, no exchange, and the all-integer distance
  * keeps the whole iteration on the exact-hash oracle gate. Unpack with
  * `packed & 255` (cid) and `packed >> 8` (dist).
  */
case class KmeansAssign(child: Expression, centroids: Array[Array[Long]], scale: Long)
    extends UnaryExpression {

  require(centroids.nonEmpty && centroids.length <= 256,
    "kmeans_assign: need 1..256 centroids (cid packs into 8 bits)")
  // dist < 2^55 packing bound (ADVICE r14): with every quantized magnitude
  // <= B, dist <= dims·(2B)² — solve for the largest safe B at these dims.
  // Centroids are plan constants, checked here; row elements are checked
  // per-row by the kernel against the same bound.
  private val maxAbsQ: Long = {
    val dims = math.max(1, centroids.map(_.length).max)
    var b = (math.sqrt((1L << 55).toDouble / dims) / 2.0).toLong
    // strict bound (ADVICE r15): when 2^55/dims is a perfect even square
    // (dims = 2, 8, 32, 128, …) the floor lands exactly on equality and
    // dist == 2^55 overflows (best << 8) into the sign bit — decrement
    // until dims·(2B)² < 2^55 (at most one step)
    while (b > 0 && dims.toLong * (2 * b) * (2 * b) >= (1L << 55)) b -= 1
    b
  }
  require(centroids.forall(_.forall(c => c <= maxAbsQ && c >= -maxAbsQ)),
    s"kmeans_assign: a centroid element exceeds the 2^55 distance-packing bound (max |q| = $maxAbsQ)")
  override def prettyName: String = "kmeans_assign"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName expects an array<float|double> argument")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Kernels.kmeansAssign(
      v.asInstanceOf[ArrayData], centroids, scale, maxAbsQ, isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "long[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.Kernels.kmeansAssign($c, $cRef, ${scale}L, ${maxAbsQ}L, $isFloat)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `l2_normalize(a) → array<double>`: unit-normalize with the norm computed
  * once per row (codegen'd kernel); zero vector passes through, null
  * element → null.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "l2_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName expects an array<float|double> argument")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    Kernels.l2Normalize(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("l2n")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $res =
         |  graft.expr.Kernels.l2Normalize($c, $isFloat);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `cosine_sim(a, b) → double` over array<float>/array<double> vectors.
  *
  * Accumulates in double, strictly left-to-right, so the result is
  * bit-identical to any engine that does the same (the DuckDB oracle uses an
  * ordered list_reduce). Null/length-mismatch/zero-norm → null. Codegen'd.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "cosine_sim"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects two array<float|double> arguments")

  private def aFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def bFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    Kernels.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("cosRes")
      s"""
         |java.lang.Double $res = graft.expr.Kernels.cosine($a, $b, $aFloat, $bFloat);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `hilbert_index(x, y)` → bigint: Hilbert-curve index of a quantized
  * non-negative (x, y) pair at order `bits` (each coordinate < 2^bits).
  * A pure per-row projection participating in whole-stage codegen via the
  * static kernel — the `aggregate`-HOF fold formulation of the same walk
  * evaluates the lambda interpreted per row per level (measured ~30× on
  * the q155 scan). Semantics pinned by LayoutDsirCdcSpec's full-grid
  * bijection + Manhattan-adjacency test.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && 2 * bits <= 62, "hilbert_index: 2 x bits must fit a signed key")
  override def prettyName: String = "hilbert_index"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects two bigint arguments")

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.valueOf(Kernels.hilbert(l.asInstanceOf[Long], r.asInstanceOf[Long], bits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.Kernels.hilbert($a, $b, $bits)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `hash_hits_128(hashes)` → bigint: how many of the row's 16-byte window
  * fingerprints (a `rolling_window_hashes` array) are in the plan-embedded
  * probe set — the per-row kernel of n-gram-overlap benchmark
  * decontamination (Brown et al. 2020 §C: the GPT-3 13-gram collision
  * rule). The probe rides the plan as interleaved sorted (hi, lo) long
  * pairs (an unboxed `ArraySeq` — value equality for Catalyst's
  * semanticEquals, primitive storage for the task closure, the AcMatch
  * pattern-list precedent at 10⁶ entries), probed by binary search: a pure
  * codegen projection, zero shuffle, O(windows · log |benchmark|) per row.
  */
case class HashHits128(child: Expression, probe: Seq[Long]) extends UnaryExpression {

  require(probe.length % 2 == 0, "hash_hits_128: probe must be (hi, lo) pairs")
  // validate sortedness eagerly but cheaply (runs per executor
  // deserialization, like AcMatch's validation): the binary search is
  // silently wrong on an unsorted probe
  require(HashProbe128.isSortedPairs(probe), "hash_hits_128: probe must be pair-sorted")

  @transient private lazy val pairs: Array[Long] = probe.toArray

  override def prettyName: String = "hash_hits_128"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(BinaryType, _) => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName expects array<binary>")
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(HashProbe128.hits(pairs, v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashProbePairs", pairs, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.expr.HashProbe128.hits($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `hash_hits_64(hashes)` → bigint: how many of the row's 64-bit hashes
  * (an `array<bigint>` — shingle hashes, folded band keys) are in the
  * plan-embedded SORTED probe set — the long-array sibling of
  * [[HashHits128]], and the kernel that makes the shingle-containment and
  * LSH-band decontamination rungs pure projections (no explode, no
  * semi-join, no per-doc re-aggregation — the shape a STREAMING ingest
  * gate needs, where grouped re-aggregation would demand state). Binary
  * search per element: O(n · log |probe|), zero shuffle.
  */
case class HashHits64(child: Expression, probe: Seq[Long]) extends UnaryExpression {

  // primitive-loop validation (the HashProbe128.isSortedPairs pattern):
  // this require re-runs on every Catalyst copy() of the expression, and
  // a sliding(2) over a ~2M-long probe would box two-element Seqs per
  // step each time (round-19 review finding)
  require(HashProbe64.isSorted(probe), "hash_hits_64: probe must be sorted ascending")

  @transient private lazy val arr: Array[Long] = probe.toArray

  override def prettyName: String = "hash_hits_64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName expects array<bigint>")
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(HashProbe64.hits(arr, v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashProbe64", arr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.expr.HashProbe64.hits($ref, $c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `token_profile(text, stopwords) → array<bigint>` =
  * `[n_tokens, n_distinct, sum_len, n_stopword, n_alpha]` — the one-pass
  * codegen kernel behind TextAnalysis.quality / gopherFilter (see
  * [[Kernels.tokenProfile]]). The stopword set rides the plan as one
  * reference object, the UnigramSegment pattern.
  */
case class TokenProfile(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  // immutable Seq constructor arg keeps structural equality/codegen CSE
  // (the AcMatch/BpeSegment lesson); the set is built once per plan
  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(stopwords.length, 1) * 2)
    stopwords.foreach(s.add)
    s
  }

  override def prettyName: String = "token_profile"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    Kernels.tokenProfile(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("tokenProfileStops", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.tokenProfile($c, $sRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `word_repetition_stats(text) → array<bigint>` =
  * `[n_tokens, n_distinct_words, n_distinct_bigrams, max_word_count]` —
  * the one-pass codegen kernel behind TextAnalysis.repetition (see
  * [[Kernels.wordRepetitionStats]] for the equivalence argument vs the
  * interpreted sort/fold/zip_with formulation it replaces).
  */
case class WordRepetitionStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "word_repetition_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any =
    Kernels.wordRepetitionStats(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Kernels.wordRepetitionStats($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `ordered_struct_sum(array<struct<key, v:double>>) → double` — sort by
  * (key, v) ascending and left-fold v from 0.0: the whole-stage-codegen
  * replacement for `aggregate(array_sort(ts), 0.0, (acc,x) -> acc + x.v)`,
  * which runs as an INTERPRETED higher-order function (HOFs are
  * CodegenFallback through Spark 4.x). Bit-identical on the reachable
  * inputs — see [[Kernels.orderedStructDoubleSum]] for the order and null
  * contracts. Key types: string, int, long.
  */
case class OrderedStructSum(child: Expression) extends UnaryExpression {

  override def prettyName: String = "ordered_struct_sum"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def keyKind: Int = child.dataType match {
    case ArrayType(StructType(fs), _) if fs.length == 2 => fs(0).dataType match {
      case StringType => 0
      case IntegerType => 1
      case LongType => 2
      case _ => -1
    }
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _) if fs.length == 2 &&
        keyKind >= 0 && fs(1).dataType == DoubleType => TypeCheckSuccess
    case _ => TypeCheckFailure(
      s"$prettyName expects array<struct<string|int|bigint, double>>")
  }

  override def nullSafeEval(v: Any): Any =
    Kernels.orderedStructDoubleSum(v.asInstanceOf[ArrayData], keyKind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val res = ctx.freshName("ossRes")
      s"""
         |java.lang.Double $res = graft.expr.Kernels.orderedStructDoubleSum($a, $keyKind);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `long_dot(a, b) → bigint` — integer dot product of two `array<bigint>`:
  * the whole-stage-codegen replacement for the interpreted
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` HOF in the int8 rerank's
  * per-pair scoring (the |corpus|×|queries| hot kernel of q75). Exact —
  * associative integer arithmetic; null/mismatch contract at
  * [[Kernels.longDot]].
  */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "long_dot"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def isLongVec(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongVec(left.dataType) && isLongVec(right.dataType)) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects two array<bigint> arguments")

  override def nullSafeEval(l: Any, r: Any): Any =
    Kernels.longDot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("ldotRes")
      s"""
         |java.lang.Long $res = graft.expr.Kernels.longDot($a, $b);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static probe kernel for [[HashHits64]]: sorted signed longs. */
object HashProbe64 {
  def isSorted(p: Seq[Long]): Boolean = {
    var i = 1
    while (i < p.length) {
      if (p(i - 1) > p(i)) return false
      i += 1
    }
    true
  }

  def hits(probe: Array[Long], hashes: ArrayData): Long = {
    var cnt = 0L
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      if (java.util.Arrays.binarySearch(probe, hashes.getLong(i)) >= 0) cnt += 1
      i += 1
    }
    cnt
  }
}

/** Static probe kernel for [[HashHits128]]: interleaved (hi, lo) pairs,
  * sorted by signed (hi, then lo) — the same comparator
  * `Decontaminate.benchmarkWindowHashes` sorts with on the driver.
  */
object HashProbe128 {

  def isSortedPairs(p: Seq[Long]): Boolean = {
    var i = 2
    while (i + 1 < p.length) {
      val c = java.lang.Long.compare(p(i - 2), p(i))
      if (c > 0 || (c == 0 && java.lang.Long.compare(p(i - 1), p(i + 1)) > 0)) return false
      i += 2
    }
    true
  }

  /** Count of `hashes` elements present in the sorted pair array. */
  def hits(pairs: Array[Long], hashes: ArrayData): Long = {
    var cnt = 0L
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      val b = hashes.getBinary(i)
      var hi = 0L
      var lo = 0L
      var k = 0
      while (k < 8) { hi = (hi << 8) | (b(k) & 0xffL); k += 1 }
      while (k < 16) { lo = (lo << 8) | (b(k) & 0xffL); k += 1 }
      if (contains(pairs, hi, lo)) cnt += 1
      i += 1
    }
    cnt
  }

  /** Fold a collected 16-byte fingerprint into the probe's (hi, lo) form —
    * the driver-side twin of the big-endian fold in [[hits]] (the two MUST
    * match; the underlying byte layout of the fingerprint is irrelevant as
    * long as both sides fold identically).
    */
  def fold(b: Array[Byte]): (Long, Long) = {
    var hi = 0L
    var lo = 0L
    var k = 0
    while (k < 8) { hi = (hi << 8) | (b(k) & 0xffL); k += 1 }
    while (k < 16) { lo = (lo << 8) | (b(k) & 0xffL); k += 1 }
    (hi, lo)
  }

  private def contains(p: Array[Long], hi: Long, lo: Long): Boolean = {
    var l = 0
    var r = p.length / 2 - 1
    while (l <= r) {
      val m = (l + r) >>> 1
      val mh = p(2 * m)
      val c = if (mh != hi) java.lang.Long.compare(mh, hi)
        else java.lang.Long.compare(p(2 * m + 1), lo)
      if (c < 0) l = m + 1 else if (c > 0) r = m - 1 else return true
    }
    false
  }
}
