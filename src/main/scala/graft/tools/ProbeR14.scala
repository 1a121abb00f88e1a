package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dev-only stage profiler for the round-14 optimization targets (not part
  * of the shipped surface): where do q_dedup_clusters, the decontam twins,
  * q_jsonl_ingest and one representative streaming entry spend their time? */
object ProbeR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.Sessions.build("graft-probe-r14", "32")
    val docs = graft.util.Tables.documents(spark, sfDir)
    docs.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }

    // --- q_dedup_clusters stages ---
    val blockExpr = concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long"))
    val proj = docs.select(col("doc_id").as("id"), blockExpr.as("block"),
      array_sort(TextFunctions.words(col("text"))).as("w"))
    time("dc: words proj (no k, no snap)")(proj.count())
    val withK = proj.withColumn("k", md5(to_json(struct(col("block"), col("w")))))
    time("dc: + content key k")(withK.count())
    time("dc: snap(full)")(graft.util.Snapshots.snap(withK).count())
    val full = graft.util.Snapshots.snap(withK)
    full.count()
    def skel() = graft.util.Snapshots.snap(
      full.groupBy("block", "k").agg(count(lit(1)).as("g"),
        min(col("id")).as("rep_id"), first(col("w")).as("w")))
    time("dc: skeleton snap")(skel().count())
    time("dc: edges end-to-end")(
      graft.operators.Dedup.jaccardNearDupEdges(docs, "doc_id", "text",
        blockExpr = blockExpr, threshold = 0.5).count())
    val pairs = graft.operators.Dedup.jaccardNearDupEdges(docs, "doc_id", "text",
      blockExpr = blockExpr, threshold = 0.5)
    time("dc: components over edges")(
      graft.operators.Components.clusters(docs.select("doc_id"), "doc_id",
        pairs, "id_a", "id_b").count())
    time("dc: full query")(
      graft.queries.PipelineQueries.dedupClusters(spark, sfDir).count())

    // --- decontam stages ---
    val sh = docs.select(col("doc_id"),
      explode(TextFunctions.wordShinglesStrict(col("text"), 5)).as("shingle"))
      .select(col("doc_id"), unhex(md5(col("shingle"))).as("sh"))
    time("decontam: full shingle stream")(sh.count())
    time("decontam: bench distinct")(
      sh.filter(col("doc_id") % 20 === 0).select("sh").distinct().count())
    time("decontam: full query")(
      graft.queries.PipelineQueries.decontam(spark, sfDir).count())
    time("decontam_bloom: full query")(
      graft.queries.CorpusQueries.decontamBloom(spark, sfDir).count())

    // --- jsonl ingest: write vs read ---
    time("jsonl: full query (1st)")(
      graft.queries.PipelineQueries.jsonlIngest(spark, sfDir).count())
    time("jsonl: full query (2nd)")(
      graft.queries.PipelineQueries.jsonlIngest(spark, sfDir).count())

    // --- one streaming entry, twice (warm machinery) ---
    time("stream_hourly (1st)")(
      graft.queries.StreamingQueries.streamHourlyCounts(spark, sfDir).count())
    time("stream_hourly (2nd)")(
      graft.queries.StreamingQueries.streamHourlyCounts(spark, sfDir).count())
    time("stream_sliding")(
      graft.queries.StreamingQueries.streamSlidingCounts(spark, sfDir).count())
    time("stream_join")(
      graft.queries.StreamingQueries.streamClickAttribution(spark, sfDir).count())

    // --- tfidf ---
    time("tfidf: full query")(
      graft.queries.PipelineQueries.tfidfTopTerms(spark, sfDir).count())

    spark.stop()
  }
}
