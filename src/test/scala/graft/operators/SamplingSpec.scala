package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

/** Deterministic-sampling invariants: layout independence, exact-k, seed
  * sensitivity, fraction accuracy. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bottomKByHash picks exactly k per group, invariant to partitioning") {
    val docs = Tables.documents(spark, sf)
    def sample(df: org.apache.spark.sql.DataFrame) =
      Sampling.bottomKByHash(df, Seq("lang"), col("doc_id"), k = 5)
        .select("lang", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val a = sample(docs)
    val b = sample(docs.repartition(13))
    assert(a == b, "sample must be a pure function of content")
    a.groupBy(_._1).foreach { case (lang, rows) =>
      val total = docs.filter(col("lang") === lang).count()
      assert(rows.size == math.min(5, total), s"$lang sample size")
    }
  }

  test("different seeds give different samples") {
    val docs = Tables.documents(spark, sf)
    val s1 = Sampling.bottomKByHash(docs, Seq("lang"), col("doc_id"), 5, seed = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.bottomKByHash(docs, Seq("lang"), col("doc_id"), 5, seed = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 != s2)
  }

  test("bernoulliByHash hits the target fraction and is layout-invariant") {
    val ev = Tables.events(spark, sf) // 10k rows at sf0.001
    val frac = 0.2
    val a = Sampling.bernoulliByHash(ev, col("event_id"), frac)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulliByHash(ev.repartition(9), col("event_id"), frac)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    val n = ev.count().toDouble
    assert(math.abs(a.size / n - frac) < 0.03, s"got ${a.size / n}, want ~$frac")
  }
}
