package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2-B extension-points row): element-wise mean of
  * fixed-dimension float vectors — e.g. a per-label embedding centroid.
  *
  * Buffer is (sum vector, count); merge is associative/commutative, so
  * Spark runs it as partial (map-side) + final aggregation — the shuffle
  * carries one (dim+1)-double buffer per group per partition, not the rows.
  */
class VectorMeanAggregator(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val (sum, n) = b
    var i = 0
    while (i < dim && i < v.length) { sum(i) += v(i); i += 1 }
    (sum, n + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val (sx, nx) = x
    val (sy, ny) = y
    var i = 0
    while (i < dim) { sx(i) += sy(i); i += 1 }
    (sx, nx + ny)
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] = {
    val (sum, n) = b
    if (n == 0) Seq.fill(dim)(0.0) else sum.map(_ / n).toSeq
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
