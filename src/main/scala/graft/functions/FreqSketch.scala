package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the bounded
  * counterpart of exact word counting for corpus-scale frequency analysis
  * (dominant boilerplate, URLs, templates).
  *
  * Guarantee: any item occurring more than n/(k+1) times in n observations
  * survives in the sketch, and every reported count undercounts the true
  * frequency by at most n/(k+1). The sketch MERGES (counter addition +
  * re-trim), so per-partition partials combine exactly like any partial
  * aggregate — O(k) state regardless of corpus size, vs the full
  * explode-groupBy whose shuffle carries every distinct token.
  */
object FreqSketch {

  /** Decrement-all trim to at most k counters (the MG step). */
  private def trim(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      // remove the (k+1)-th largest count from everyone, drop non-positive
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (w, c) => if (c - cut > 0) Some(w -> (c - cut)) else None }
    }

  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], w: String): Map[String, Long] = {
      val bumped = m.updated(w, m.getOrElse(w, 0L) + 1L)
      if (bumped.size > k) trim(bumped, k) else bumped
    }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      trim(b.foldLeft(a) { case (m, (w, c)) => m.updated(w, m.getOrElse(w, 0L) + c) }, k)

    override def finish(m: Map[String, Long]): Map[String, Long] = m

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** `heavy_hitters(k)(wordCol)` — map of ≤ k surviving items to their
    * (under-)estimated counts. */
  def heavy_hitters(k: Int)(c: Column): Column = {
    implicit val inputEnc: Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    udaf(new MisraGries(k)).apply(c)
  }
}
