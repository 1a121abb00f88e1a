package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

/** Plan pins for the composed curation DAG (VERDICT r11 #6). */
class CurationV2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("the scalar prefix fuses into one WholeStageCodegen region") {
    // html wrap → extract → NFC normalize → rule/lang filters must be ONE
    // codegen span over the scan: at 100 TB these per-doc stages are one
    // pass over the payload, with nothing materialized between them. A
    // count != 1 means a stage fell out of codegen (e.g. NormalizeText
    // losing its doGenCode path) and the pipeline pays an extra
    // materialization per excluded stage.
    val df = TextQueries.curationV2Scalar(Tables.documents(spark, sf))
    val plan = df.queryExecution.executedPlan
    val regions = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(regions.length == 1,
      s"expected exactly one codegen region, got ${regions.length}:\n$plan")
  }

  test("the full DAG dedups on normalized text and respects the domain cap") {
    val out = TextQueries.curationV2(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // per-host contribution never exceeds the cap for capped hosts and the
    // blocklisted domains never appear
    val byHost = rows.groupBy(_.getString(1)).view.mapValues(_.length)
    assert(!byHost.contains("spam.biz") && !byHost.contains("ads.example"))
    assert(byHost.getOrElse("megasite.example", 0) <= 12)
    // survivors are unique doc_ids (dedup kept one row per fingerprint)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }
}
