package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native UDTF extension point (SURVEY.md §2-B last row): a custom Catalyst
  * `Generator` — the table-function shape the reference exposes only
  * indirectly (array-returning GenericUDF consumed by `explode`,
  * README.md:25–29) — implemented directly so the lateral expansion is ONE
  * Generate operator with no intermediate array materialization.
  *
  * `explode_ngrams(text, n)` emits (pos, ngram) rows for every n-token
  * window of the space-separated text; `n` must be a foldable positive
  * integer (the reference's const-arg contract, KuromojiNEologdUDF.java:
  * 93–111, enforced the same way at analysis time).
  */
case class ExplodeNgrams(child: Expression, nExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"explode_ngrams first argument must be STRING, got ${child.dataType.sql}")
    else if (nExpr.dataType != IntegerType || !nExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "explode_ngrams second argument must be a constant INT")
    else if (n <= 0)
      TypeCheckResult.TypeCheckFailure(s"explode_ngrams n must be positive, got $n")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val n: Int = nExpr.eval(null) match {
    case i: Int => i
    case null => -1
    case other => other.toString.toInt
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input).asInstanceOf[UTF8String]
    if (text == null) Iterator.empty
    else {
      // split(" ", -1) semantics: empty tokens kept — identical boundaries
      // to the oracle's string_split
      val tokens = text.toString.split(" ", -1)
      if (tokens.length < n) Iterator.empty
      else (0 to tokens.length - n).iterator.map { i =>
        val sb = new java.lang.StringBuilder
        var j = i
        while (j < i + n) {
          if (j > i) sb.append(' ')
          sb.append(tokens(j))
          j += 1
        }
        InternalRow(i, UTF8String.fromString(sb.toString))
      }
    }
  }

  override def prettyName: String = "explode_ngrams"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExplodeNgrams =
    copy(child = newChildren(0), nExpr = newChildren(1))
}
