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

  test("the declared surface routes the standard tier to the uncapped plan") {
    // sf-tier documents are far under the 256 MB bound: the declared
    // query must equal the uncapped twin here (the oracle contract)
    assert(rows(CorpusQueries.ngramLm(spark, sf))
      == rows(CorpusQueries.ngramLmScores(spark, sf)))
  }
}
