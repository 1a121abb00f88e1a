package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate (the `Aggregator[IN, BUF, OUT]` Catalyst surface,
  * SURVEY §7.3 / spark guide): element-wise mean of an embedding column.
  * The partial-aggregation contract (reduce within partitions, merge across)
  * makes it a single-shuffle distributed centroid computation — the building
  * block for k-means/IVF cell refinement at 100 TB.
  */
object VectorAgg {

  case class VecBuffer(sums: Array[Double], n: Long)

  class VectorMean(dim: Int) extends Aggregator[Seq[Float], VecBuffer, Seq[Double]] {
    override def zero: VecBuffer = VecBuffer(new Array[Double](dim), 0L)

    override def reduce(b: VecBuffer, v: Seq[Float]): VecBuffer = {
      var i = 0
      while (i < dim && i < v.length) { b.sums(i) += v(i); i += 1 }
      VecBuffer(b.sums, b.n + 1)
    }

    override def merge(a: VecBuffer, b: VecBuffer): VecBuffer = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      VecBuffer(a.sums, a.n + b.n)
    }

    override def finish(b: VecBuffer): Seq[Double] =
      if (b.n == 0) Seq.empty else b.sums.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[VecBuffer] = Encoders.product[VecBuffer]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `vector_mean(dim)(col)` — element-wise mean of array<float> per group. */
  def vector_mean(dim: Int)(c: Column): Column = {
    implicit val inputEnc: Encoder[Seq[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
    udaf(new VectorMean(dim)).apply(c)
  }
}
