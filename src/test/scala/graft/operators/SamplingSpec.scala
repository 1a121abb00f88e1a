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

  test("mixtureSample: targets hit within rate tolerance, epochs replicate, layout-invariant") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val budget = docs.count()
    val weights = Map("en" -> 500L, "es" -> 300L)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureSample(df, "lang", "doc_id", weights, 66L, budget)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val out = run(docs)
    val avail = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    avail.foreach { case (lang, a) =>
      val target = budget * weights.getOrElse(lang, 66L) / 1000L
      val got = out.count(_._2 == lang)
      // remainder selection is bucket-rate exact; the affine permutation
      // spreads a group over the 10^4 buckets with ~sqrt(avail) deviation
      assert(math.abs(got - target) <= 4 * math.sqrt(a.toDouble) + 1,
        s"$lang: got $got rows for target $target (avail $a)")
      // upsampled groups: every row present in all full epochs
      val epochs = target / a
      if (epochs >= 1) {
        val ids = docs.filter(col("lang") === lang).collect().map(_.getLong(0))
        (0L until epochs).foreach { e =>
          assert(ids.forall(id => out.contains((id, lang, e))),
            s"$lang epoch $e incomplete")
        }
      }
    }
    // es (15% avail, 30% target) must actually exercise 2 full epochs here
    assert(out.exists(r => r._2 == "es" && r._3 == 1L), "fixture must upsample es")
    // pure function of content: identical under any partitioning
    assert(run(docs.repartition(7)) == out)
  }

  test("mixtureSample plans NO data shuffle (map-only filter + replication)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val plan = Sampling.mixtureSample(docs, "lang", "doc_id",
        Map("en" -> 500L), 100L, budget = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"mixture sampling must not shuffle the corpus:\n$plan")
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
