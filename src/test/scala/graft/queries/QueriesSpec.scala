package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Smoke + invariants for every declared query on sf0.001 (the DuckDB hash
  * gate runs driver-side at sf0.01; here we pin cheap structural facts). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("no declared query plans a CartesianProduct") {
    // the brute-force ANN θ-join broadcasts its tiny query side
    // (BroadcastNestedLoopJoin — fine); an unbroadcast cartesian anywhere in
    // the surface is always a scale bug
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan.toString
      val physical = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }

  test("entry (flagship star join) returns the per-nation revenue rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty && rows.forall(!_.anyNull))
  }

  test("anti-join removes every event of excluded users") {
    import org.apache.spark.sql.functions._
    val ev = graft.util.Tables.events(spark, sf)
    val bad = ev.filter(col("event_type") === "error" && col("value") > 190)
      .select("user_id").distinct()
    val kept = ev.join(bad, Seq("user_id"), "left_anti")
    assert(kept.join(bad, Seq("user_id"), "inner").count() == 0)
    assert(kept.count() + ev.join(bad, Seq("user_id"), "left_semi").count() == ev.count())
  }

  test("star join broadcasts the dimension sides (no shuffle of lineitem for the join)") {
    val plan = RelationalQueries.starJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
  }

  test("bucketed star join plans zero Exchange below the fact-fact join") {
    // at sf0.001 Catalyst would broadcast tiny orders outright; force the
    // at-scale shape (fact sides too big to broadcast — the 1000×-tier plan)
    // while the dimension sides keep their explicit broadcast() hints
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      val plan = RelationalQueries.starJoinBucketed(spark, sf)
        .queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a SortMergeJoin over the bucketed scans:\n$plan")
      val shufflesBelow = "(?<!Broadcast)Exchange".r.findAllIn(plan.substring(joinIdx)).size
      assert(shufflesBelow == 0, s"bucketed join still exchanges:\n$plan")
      assert(plan.substring(joinIdx).contains("SelectedBucketsCount"),
        s"join inputs are not the bucketed scans:\n$plan")
    } finally spark.conf.set(thresholdKey, saved)
  }

  test("projection prunes the parquet scan to selected columns") {
    val plan = RelationalQueries.project(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_returnflag:string"),
      s"scan not pruned:\n$plan")
  }

  test("surrogate ids are dense 0..n-1 (deterministic E9 variant)") {
    val ids = ScalarQueries.surrogateId(spark, sf)
      .select("dim_id").collect().map(_.getInt(0).toLong)
    assert(ids.toSeq == (0L until ids.length).toSeq)
  }

  test("pair curation: both image arms parse, the non-image arm drops, dims survive the round trip") {
    val rows = TextQueries.pairCuration(spark, sf)
      .select("doc_id", "format", "width", "height").collect()
    assert(rows.nonEmpty)
    var sawJpeg = false
    rows.foreach { r =>
      val (id, fmt, w, h) =
        (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))
      assert(id % 17 != 0, s"doc $id has the non-image payload — the format gate must drop it")
      // the engine PARSED these out of the payload bytes (PNG IHDR reads /
      // JPEG marker walk); they must equal the generation rule, or the
      // header synth/parse disagrees
      if (id % 13 == 0) {
        sawJpeg = true
        assert(fmt == "jpeg", s"doc $id should be the JPEG arm, got $fmt")
        assert(w == 64 + (id % 1984), s"doc $id JPEG width parse mismatch: $w")
        assert(h == 64 + (id * 11 % 1984), s"doc $id JPEG height parse mismatch: $h")
      } else {
        assert(fmt == "png", s"doc $id should be the PNG arm, got $fmt")
        assert(w == 64 + (id % 1984), s"doc $id width parse mismatch: $w")
        assert(h == 64 + (id * 7 % 1984), s"doc $id height parse mismatch: $h")
      }
      assert(w >= 128 && h >= 128 && w * 3 >= h && h * 3 >= w,
        s"doc $id violates the dim/aspect gates: ${w}x$h")
    }
    assert(sawJpeg, "no JPEG pair survived — the JPEG arm is not being measured")
  }

  test("salted aggregation is value-identical to the unsalted groupBy") {
    import org.apache.spark.sql.functions._
    val ev = graft.util.Tables.events(spark, sf).select(col("event_type"),
      floor(col("value") * lit(1000d)).cast("long").as("v_milli"))
    val plain = ev.groupBy("event_type")
      .agg(sum("v_milli").as("sum_v_milli"), count(lit(1)).as("cnt"))
      .orderBy("event_type").collect().toSeq
    val salted = AnalyticsQueries.saltedAgg(spark, sf).collect().toSeq
    assert(salted == plain, "salting changed the aggregate values")
    // and the rewrite actually spreads the reduce: the first aggregate
    // groups on (key, __salt), visible in the physical plan
    val plan = AnalyticsQueries.saltedAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"expected a salted partial aggregate:\n$plan")
  }

  test("pii stats: planted counts follow the plant rule exactly") {
    import org.apache.spark.sql.functions._
    val rows = TextQueries.piiStats(spark, sf).collect()
    val docs = graft.util.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
    val bySource = docs.groupBy(_.getString(1))
    rows.foreach { r =>
      val src = r.getString(0)
      val ids = bySource(src).map(_.getLong(0))
      assert(r.getLong(1) == ids.length, s"$src n_docs")
      // one planted email per doc, a second on doc_id % 3 == 0
      assert(r.getLong(2) == ids.length + ids.count(_ % 3 == 0), s"$src n_emails")
      assert(r.getLong(3) == ids.length, s"$src n_phones")
      assert(r.getLong(4) == ids.length, s"$src n_ips")
      assert(r.getLong(5) == ids.length, s"$src n_docs_with_pii")
    }
  }

  test("html extraction drops script/style blocks, strips tags and decodes entities") {
    val rows = TextQueries.htmlExtract(spark, sf).limit(5).collect()
    assert(rows.nonEmpty)
    // reconstruct one extraction on the driver and compare end-state facts:
    // the synthesized wrapper contributes a fixed prefix/suffix around text
    import org.apache.spark.sql.functions._
    val one = graft.util.Tables.documents(spark, sf)
      .orderBy("doc_id").limit(1).select("text").head().getString(0)
    val expectedBody =
      ("T Title " + one.replaceAll("[ \t\n\r]+", " ").trim +
        " A & B <tag> \"q\" 's' end about | x").replaceAll(" +", " ").trim
    val got = TextQueries.htmlExtract(spark, sf).orderBy("doc_id").limit(1)
      .select("n_chars").head().getInt(0)
    assert(got == expectedBody.length,
      s"extracted length $got != driver-side reference ${expectedBody.length}")
  }
}
