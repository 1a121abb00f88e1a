package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end curation over crafted docs with known dup/garbage structure. */
class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodText = "the quick brown fox jumps over the lazy dog and runs to the river bank again today"
  private lazy val docs = Seq(
    (0L, goodText, "en", 84L),
    (1L, goodText, "en", 84L),                                     // exact dup -> removed
    (2L, goodText.replace("today", "tomorrow"), "en", 87L),        // near dup -> removed
    (3L, "zz qq xx yy ww vv uu tt ss rr qq pp oo nn mm ll kk jj", "en", 53L), // no stopwords -> quality gate
    (4L, "x", "en", 1L),                                           // too short -> quality gate
    (5L, "the small data of the lake and the house of the sea and the road", "xx", 64L), // bad lang
    (6L, "the other document about the spark engine and the catalyst optimizer of the plan", "en", 80L)
  ).toDF("doc_id", "text", "lang", "n_chars")

  test("pipeline removes dups, garbage, and foreign docs; annotates survivors") {
    val (curated, stages) = CurationPipeline.curate(docs)
    val byStage = stages.toMap
    assert(byStage("input") == 7)
    assert(byStage("exact_dedup") == 6)   // doc 1 gone (doc 0 kept: keepBy doc_id)
    assert(byStage("near_dedup") == 5)    // doc 2 gone
    assert(byStage("quality_gate") == 3)  // docs 3, 4 gone
    assert(byStage("lang_filter") == 2)   // doc 5 gone
    val rows = curated.select("doc_id", "n_words", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 6L))
    rows.foreach { case (_, w, t) => assert(w > 0 && t >= w) }
  }

  test("per-lang sampling caps the output deterministically") {
    val docs = graft.util.Tables.documents(spark, TestSpark.sf)
    val (curated, _) = CurationPipeline.curate(docs,
      CurationPipeline.Config(samplePerLang = 4))
    val counts = curated.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ <= 4))
    val (again, _) = CurationPipeline.curate(docs.repartition(5),
      CurationPipeline.Config(samplePerLang = 4))
    assert(curated.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("embedding curation drops the near-identical vector and quantizes survivors") {
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val jit = base.clone(); jit(0) += 0.001f
    val other = Array.tabulate(8)(i => ((i * 37) % 13 - 6).toFloat)
    val emb = Seq((1L, base), (2L, jit), (3L, other)).toDF("vec_id", "embedding")
    val (out, stages) = CurationPipeline.curateEmbeddings(emb, dupThreshold = 0.999,
      numCentroids = 2)
    assert(stages.toMap == Map("input" -> 3L, "near_dedup" -> 2L))
    val rows = out.select("vec_id", "q_embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(rows.keySet == Set(1L, 3L)) // vec 2 (the jittered copy) dropped
    assert(rows.values.forall(q => q.forall(x => x >= -127 && x <= 127)))
    assert(rows(1L).last == 127) // the max-magnitude element quantizes to full scale
  }

  test("boilerplate report surfaces the dominant corpus words") {
    val top = CurationPipeline.boilerplateReport(docs, k = 8)
      .collect().map(_.getString(0))
    assert(top.contains("the"), s"'the' dominates this corpus, got ${top.toSeq}")
  }

  test("map-only claims hold: minhash/simhash signature plans have no Exchange") {
    val sigPlan = Dedup.withMinhashSignature(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!sigPlan.contains("Exchange"), s"minhash signatures must be map-only:\n$sigPlan")
    val simPlan = docs.select(Dedup.simhash64(col("text")))
      .queryExecution.executedPlan.toString
    assert(!simPlan.contains("Exchange"), s"simhash must be map-only:\n$simPlan")
  }
}
