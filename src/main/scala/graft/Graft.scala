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

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "tokenize_ja_neologd" -> (exprs => TokenizeJaNeologd(exprs)),
    "graft_hash64" -> (exprs => graft.expr.GraftHash64(exprs.head)),
    "cosine_sim" -> (exprs => graft.expr.CosineSimilarity(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions` installer. */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("tokenize_ja_neologd"),
      new ExpressionInfo(classOf[TokenizeJaNeologd].getName, "tokenize_ja_neologd"),
      (exprs: Seq[Expression]) => TokenizeJaNeologd(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_hash64"),
      new ExpressionInfo(classOf[graft.expr.GraftHash64].getName, "graft_hash64"),
      (exprs: Seq[Expression]) => graft.expr.GraftHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.expr.CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => graft.expr.CosineSimilarity(exprs(0), exprs(1))))
  }
}
