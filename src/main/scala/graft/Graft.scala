package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.TokenizeJaNeologd

object GraftVersion {
  /** Returned by the zero-arg tokenize_ja_neologd() call (reference A11). */
  val value: String = "0.1.0"
}

/** Engine entry points: SQL function registration.
  *
  * Two paths, mirroring how the reference is installed into Hive
  * (`create temporary function`, README.md:22–25):
  *   - `Graft.register(spark)` for an existing session;
  *   - `--conf spark.sql.extensions=graft.GraftSessionExtensions` to
  *     install at session build time.
  */
object Graft {

  private def arity(name: String, n: Int)(exprs: Seq[Expression]): Seq[Expression] = {
    require(exprs.length == n,
      s"Invalid number of arguments for function $name: expected $n, got ${exprs.length}")
    exprs
  }

  private[graft] val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "tokenize_ja_neologd" -> (exprs => TokenizeJaNeologd(exprs)),
    "graft_hash64" -> (exprs => graft.expr.GraftHash64(arity("graft_hash64", 1)(exprs).head)),
    "cosine_sim" -> (exprs => {
      val e = arity("cosine_sim", 2)(exprs)
      graft.expr.CosineSimilarity(e(0), e(1))
    }),
    "explode_ngrams" -> (exprs => {
      val e = arity("explode_ngrams", 2)(exprs)
      graft.expr.ExplodeNgrams(e(0), e(1))
    }))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions` installer — same (arity-checked) builders as
  * `Graft.register`.
  */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    Graft.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.expr", name),
        builder))
    }
}
