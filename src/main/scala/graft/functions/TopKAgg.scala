package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributed per-group top-k as a typed `Aggregator` — the
  * TakeOrdered-per-group pattern.
  *
  * Why not a `row_number` window: ranking Q·N scored pairs with a window
  * shuffles and SORTS every pair inside each group's partition. A bounded
  * top-k aggregate keeps at most k entries per group per input partition
  * (map-side partial), shuffles only those, and merges — data movement
  * drops from O(Q·N) rows to O(Q·k·partitions).
  *
  * Ordering: score DESC, id ASC on ties — identical to the window ordering
  * the oracle mirrors, so results are bit-for-bit interchangeable.
  */
object TopKAgg {

  /** One scored candidate. */
  case class Scored(id: Long, score: Double)

  /** Total order via `java.lang.Double.compare`, which (like Spark's window
    * sort) ranks NaN greater than every finite double and equal to itself —
    * so a NaN-scored candidate (0/0 cosine from a zero-norm vector) lands
    * exactly where the `row_number` DESC window would put it: first. */
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  /** Insert into a descending-sorted bounded list (k is small — single-digit
    * in ANN use — so linear insertion beats heap constant factors). */
  private def insert(buf: List[Scored], v: Scored, k: Int): List[Scored] = {
    val (pre, post) = buf.span(better(_, v))
    val merged = pre ::: (v :: post)
    if (merged.length > k) merged.take(k) else merged
  }

  class TopK(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    override def zero: List[Scored] = Nil

    override def reduce(buf: List[Scored], v: Scored): List[Scored] =
      if (buf.length == k && better(buf.last, v)) buf else insert(buf, v, k)

    override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      b.foldLeft(a)((acc, v) => reduce(acc, v))

    override def finish(buf: List[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** `top_k(k)(id, score)` — array of the k best (score DESC, id ASC),
    * already ordered; position = rank - 1. */
  def top_k(k: Int)(id: Column, score: Column): Column = {
    implicit val inputEnc: Encoder[Scored] = Encoders.product[Scored]
    udaf(new TopK(k)).apply(id, score)
  }
}
