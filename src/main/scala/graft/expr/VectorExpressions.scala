package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_hash(str) → bigint` — deterministic polynomial string hash:
  * fold over Unicode code points, h ← (h·131 + cp) mod 1e9+7.
  *
  * Chosen to be exactly reproducible in portable SQL (the DuckDB oracle
  * recomputes it with list_reduce over code points — no engine-native hash
  * has that property), while staying cheap enough for per-shingle use in
  * MinHash pipelines. Not cryptographic.
  */
case class GraftHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_hash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName expects a string argument")

  override def nullSafeEval(v: Any): Any = {
    val s = v.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `cosine_sim(a, b) → double` over array<float>/array<double> vectors.
  *
  * Accumulates in double, strictly left-to-right, so the result is
  * bit-identical to any engine that does the same (the DuckDB oracle uses an
  * ordered list_reduce). Null/length-mismatch/zero-norm → null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

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

  private def get(a: ArrayData, i: Int, float: Boolean): Double =
    if (float) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements != b.numElements) return null
    val af = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val bf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = a.numElements
    while (i < n) {
      val x = get(a, i, af)
      val y = get(b, i, bf)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
