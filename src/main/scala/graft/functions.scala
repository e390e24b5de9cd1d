package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit, array, typedLit}

/** Public Column API for the engine's functions — the Spark-side analogue
  * of the reference's registered Hive function (README.md:22–29). Requires
  * `Graft.register(spark)` (or the session extension) on the target session.
  */
object functions {

  /** tokenize_ja_neologd(line) with defaults: NORMAL mode, default stop
    * words/tags, no user dictionary.
    */
  def tokenize_ja_neologd(line: Column): Column =
    call_function("tokenize_ja_neologd", line)

  def tokenize_ja_neologd(line: Column, mode: String): Column =
    call_function("tokenize_ja_neologd", line, lit(mode))

  /** Full form. null arguments mean "use default" (reference semantics). */
  def tokenize_ja_neologd(
      line: Column,
      mode: String,
      stopWords: Seq[String],
      stopTags: Seq[String]): Column =
    call_function("tokenize_ja_neologd", line, strOrNull(mode),
      arrOrNull(stopWords), arrOrNull(stopTags))

  def tokenize_ja_neologd(
      line: Column,
      mode: String,
      stopWords: Seq[String],
      stopTags: Seq[String],
      userDictRows: Seq[String]): Column =
    call_function("tokenize_ja_neologd", line, strOrNull(mode),
      arrOrNull(stopWords), arrOrNull(stopTags), arrOrNull(userDictRows))

  def tokenize_ja_neologd_url(
      line: Column,
      mode: String,
      stopWords: Seq[String],
      stopTags: Seq[String],
      userDictUrl: String): Column =
    call_function("tokenize_ja_neologd", line, strOrNull(mode),
      arrOrNull(stopWords), arrOrNull(stopTags), lit(userDictUrl))

  /** Zero-arg version form (reference A11): returns ["<engine version>"]. */
  def tokenize_ja_neologd_version(): Column = call_function("tokenize_ja_neologd")

  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Deterministic polynomial string hash (see graft.expr.GraftHash64).
    * Built directly from the expression — no session registration needed.
    */
  def graft_hash64(c: Column): Column = toCol(graft.expr.GraftHash64(toExpr(c)))

  /** Cosine similarity of two array<float|double> vectors. */
  def cosine_sim(a: Column, b: Column): Column =
    toCol(graft.expr.CosineSimilarity(toExpr(a), toExpr(b)))

  private def strOrNull(s: String): Column =
    if (s == null) lit(null).cast("string") else lit(s)

  private def arrOrNull(a: Seq[String]): Column =
    if (a == null) lit(null).cast("array<string>") else typedLit(a)
}
