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
    // the engine PARSED format/width/height out of the payload bytes (PNG
    // IHDR reads / JPEG marker walk / WebP fixed-offset reads); the
    // SURVIVOR SET must equal the generation rule + curation gates
    // recomputed independently here, or the header synth/parse disagrees.
    // (At sf0.001 no WebP doc clears the min-dim gate — the set compare
    // handles any tier honestly; WebP survival is exercised at sf0.01+ by
    // the oracle hash and per-shape in MultimodalSpec.)
    val expected = graft.util.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect().flatMap { r =>
        val (id, lang, text) = (r.getLong(0), r.getString(1), r.getString(2))
        val fmtH: Option[(String, Long)] =
          if (id % 17 == 0) None
          else if (id % 13 == 0) Some(("jpeg", 11L))
          else if (id % 19 == 0) Some(("webp", 13L))
          else if (id % 23 == 0) Some(("webp", 17L))
          else if (id % 29 == 0) Some(("webp", 19L))
          else Some(("png", 7L))
        fmtH.flatMap { case (fmt, mult) =>
          val w = 64 + (id % 1984)
          val h = 64 + (id * mult % 1984)
          val nWords = text.split(" ").length
          val ok = w >= 128 && h >= 128 && w * 3 >= h && h * 3 >= w &&
            text.length >= 20 && nWords >= 5 &&
            Set("en", "es", "fr", "de").contains(lang)
          if (ok) Some(id -> ((fmt, w.toInt, h.toInt))) else None
        }
      }.toMap
    val got = rows.map(r =>
      r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got == expected,
      s"survivors diverge from the generation rule: " +
        s"extra=${(got.keySet -- expected.keySet).toSeq.sorted.take(5)} " +
        s"missing=${(expected.keySet -- got.keySet).toSeq.sorted.take(5)} " +
        s"diff=${got.collect { case (k, v) if expected.get(k).exists(_ != v) =>
          (k, v, expected(k)) }.take(5)}")
    assert(got.values.exists(_._1 == "jpeg"),
      "no JPEG pair survived — the JPEG arm is not being measured")
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
