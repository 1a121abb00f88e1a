package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the LM surface's input-size routing (VERDICT r12 #1): at or
  * under [[CorpusQueries.LmSmallInputBytes]] the declared q_ngram_lm /
  * q_ppl_buckets surface scores with the faithful uncapped model (what
  * the standard-tier oracles gate); above it — and on ANY unresolvable
  * input, the fail-safe direction — it scores with the vocabulary-capped
  * model whose state is bounded by construction. */
class NgramRoutingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect().toSeq

  test("small inputs take the uncapped model") {
    assert(rows(CorpusQueries.ngramLmScoresRouted(spark, sf, inputBytes = 1L))
      == rows(CorpusQueries.ngramLmScores(spark, sf)))
  }

  test("large inputs take the capped model") {
    assert(rows(CorpusQueries.ngramLmScoresRouted(spark, sf,
        inputBytes = CorpusQueries.LmSmallInputBytes + 1))
      == rows(CorpusQueries.ngramLmScoresCapped(spark, sf)))
  }

  test("fail-safe: an unresolvable input probes as MaxValue -> capped route") {
    val probed = graft.util.InputSize.bytes(spark, "/nonexistent/graft/doc.parquet")
    assert(probed == Long.MaxValue, s"unresolvable path probed as $probed")
    assert(probed > CorpusQueries.LmSmallInputBytes,
      "the fail-safe probe must select the bounded-state (capped) plan")
  }

  test("the probe sees the layout the query actually reads (r13 #3)") {
    // a directory-of-parts documents layout — cosmetically different from
    // the single-file `documents.parquet` convention — must probe at its
    // real (small) size, not Long.MaxValue, because ngramLmScoresAuto now
    // resolves the probe through the SAME DataFrame the query scans
    // (InputSize.bytesOf over the plan's own FileIndex), not a hardcoded
    // table path. Before the fix this layout silently model-switched a
    // tiny corpus onto the capped plan.
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_parts_").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .repartition(3).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val probed = graft.util.InputSize.bytesOf(
        graft.util.Tables.documents(spark, dir))
      assert(probed > 0L && probed < CorpusQueries.LmSmallInputBytes,
        s"directory-of-parts layout probed as $probed — router would model-switch")
      // end-to-end: the routed surface over this layout takes the UNCAPPED
      // model, matching the single-file layout's routed output
      assert(rows(CorpusQueries.ngramLmScoresAuto(spark, dir))
        == rows(CorpusQueries.ngramLmScores(spark, dir)))
      // in-memory frame (no file-backed leaf): fail-safe to MaxValue
      import spark.implicits._
      assert(graft.util.InputSize.bytesOf(Seq(1, 2).toDF("x")) == Long.MaxValue)
    } finally {
      val p = java.nio.file.Paths.get(dir)
      val reg = new graft.util.LayoutRegistry
      reg.register(p); reg.deleteAll()
    }
  }

  test("the declared surface routes the standard tier to the uncapped plan") {
    // sf-tier documents are far under the 256 MB bound: the declared
    // query must equal the uncapped twin here (the oracle contract)
    assert(rows(CorpusQueries.ngramLm(spark, sf))
      == rows(CorpusQueries.ngramLmScores(spark, sf)))
  }
}
