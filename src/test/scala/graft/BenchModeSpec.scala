package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Pins the Bench timing-mode contract ([[Bench.isMapOnly]]): map-only
  * plans must be FORCED (count() column-prunes a pure projection to a
  * scan row-count — q_winnow measured 0.14 s counted vs ~1.8 s forced at
  * sf0.1) while any reducing plan must stay COUNTED so its rows remain
  * comparable with every prior round's artifacts. The r11 regression this
  * guards: under AQE the physical plan is a leaf wrapper, so a physical
  * node-name scan classified ALL queries map-only. */
class BenchModeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def forcedMode(df: org.apache.spark.sql.DataFrame): Boolean =
    Bench.isMapOnly(df.queryExecution)

  test("pure projections (with their presentation orderBy) are forced") {
    assert(forcedMode(TextQueries.scrubbedDocs(spark, sf)), "q_scrub_pii")
    assert(forcedMode(TextQueries.fingerprints(spark, sf)), "q_fingerprint")
    assert(forcedMode(TextQueries.frameSlices(spark, sf)),
      "q_frame_slices — generate/explode is map-side, still forced")
    assert(forcedMode(TextQueries.pairCuration(spark, sf)),
      "q_pair_curation — filters are map-side, still forced")
  }

  test("reducing plans stay counted") {
    assert(!forcedMode(RelationalQueries.groupByCount(spark, sf)), "aggregate")
    assert(!forcedMode(RelationalQueries.antiJoin(spark, sf)), "join")
    assert(!forcedMode(RelationalQueries.topK(spark, sf)), "limit")
    assert(!forcedMode(TextQueries.dedupExact(spark, sf)), "group-by dedup")
    assert(!forcedMode(TextQueries.bpeMergePairs(spark, sf)),
      "q_bpe_merges — vocab aggregate below the explode")
  }

  test("a non-top sort is reducing even when the top sort is stripped") {
    import org.apache.spark.sql.functions._
    val df = graft.util.Tables.documents(spark, sf)
      .orderBy("lang") // mid-plan sort (not removable by a count)
      .select(col("doc_id"), monotonically_increasing_id().as("rank"))
      .orderBy("doc_id") // presentation sort — stripped
    assert(!forcedMode(df))
  }
}
