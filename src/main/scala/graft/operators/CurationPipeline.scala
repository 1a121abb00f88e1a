package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The flagship training-data curation pipeline — the 100 TB use case the
  * extension operators exist for, composed end-to-end:
  *
  *   1. exact dedup on normalized fingerprints (16-byte shuffle keys);
  *   2. MinHash-LSH near-duplicate removal (keep the lowest doc id of each
  *      near-dup pair's cluster);
  *   3. quality gate: stopword ratio + length bounds;
  *   4. language filter;
  *   5. token statistics annotation;
  *   6. deterministic per-language sample (content-hash bottom-k).
  *
  * Every stage is declarative; the only shuffles are the fingerprint
  * groupBy, the LSH band join, and the final per-group sample window.
  */
object CurationPipeline {

  case class Config(
      nearDupThreshold: Double = 0.8,
      minStopwordBp: Long = 200,      // ≥2% stopwords
      minChars: Int = 20,
      maxChars: Int = 100000,
      keepLangs: Seq[String] = Seq("en", "es", "fr", "de", "zh"),
      samplePerLang: Int = 0)          // 0 = keep all

  /** Returns the curated DataFrame plus per-stage counts (for reporting).
    *
    * Stage frames are cached only for the DURATION of this call (each
    * stage's count + its successors read the cache instead of recomputing
    * the prefix); every cache is released before returning. Leaving them
    * cached would leak permanently — CacheManager holds cached plans
    * strongly, ContextCleaner never reclaims them — and in a long session
    * each leaked entry taxes every later query's cache lookup and storage
    * memory. The caller's one consumption of the result recomputes the
    * (declarative, shuffle-minimal) chain once, which is the right trade. */
  def curate(docs: DataFrame, cfg: Config = Config()): (DataFrame, Seq[(String, Long)]) = {
    val stages = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val cachedFrames = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def stage(name: String, df: DataFrame): DataFrame = {
      val cached = df.cache()
      cachedFrames += cached
      stages += name -> cached.count()
      cached
    }
    try curateStaged(docs, cfg, stage, stages)
    finally cachedFrames.foreach(_.unpersist(blocking = false))
  }

  private def curateStaged(docs: DataFrame, cfg: Config,
      stage: (String, DataFrame) => DataFrame,
      stages: scala.collection.mutable.ArrayBuffer[(String, Long)])
      : (DataFrame, Seq[(String, Long)]) = {
    val input = stage("input", docs)

    val exact = stage("exact_dedup",
      Dedup.exactByFingerprint(input, "text", keepBy = Seq("doc_id")))

    // near-dup removal: from each (a < b) near-dup pair, drop the higher id
    val losers = Dedup
      .minhashNearDuplicates(exact, "doc_id", "text", threshold = cfg.nearDupThreshold)
      .select(col("id_b").as("doc_id")).distinct()
    val nearDeduped = stage("near_dedup", exact.join(losers, Seq("doc_id"), "left_anti"))

    val quality = stage("quality_gate", nearDeduped
      .filter(length(col("text")).between(cfg.minChars, cfg.maxChars))
      .filter(TextFunctions.stopwordRatioBp(col("text")) >= cfg.minStopwordBp))

    val langFiltered = stage("lang_filter",
      quality.filter(col("lang").isInCollection(cfg.keepLangs)))

    val annotated = langFiltered
      .withColumn("n_words", TextFunctions.wordCount(col("text")))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .withColumn("fingerprint", TextFunctions.fingerprint(col("text")))

    val result =
      if (cfg.samplePerLang > 0)
        stage("sample", Sampling.bottomKByHash(
          annotated, Seq("lang"), col("doc_id"), cfg.samplePerLang))
      else annotated

    (result, stages.toSeq)
  }

  /** Boilerplate report: the corpus's dominant words via the bounded
    * Misra–Gries sketch ([[graft.functions.FreqSketch]]) — O(k) state at
    * any corpus size, exploded to (word, est_count) rows sorted by weight.
    * Feed the result into a stopword/boilerplate filter list. */
  def boilerplateReport(docs: DataFrame, textCol: String = "text",
                        k: Int = 32): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .agg(graft.functions.FreqSketch.heavy_hitters(k)(col("word")).as("hh"))
      .select(explode(col("hh")).as(Seq("word", "est_count")))
      .orderBy(col("est_count").desc, col("word"))

  /** Embedding-side curation, composed from the ANN operators:
    *
    *   1. cosine near-duplicate removal (cell-blocked multi-probe; from
    *      each near-identical pair the higher vec_id is dropped);
    *   2. int8 quantization of the survivors (map-only, 4× storage cut for
    *      the ANN candidate table; the float column stays for re-ranking).
    *
    * Same contract as [[curate]]: curated frame + per-stage counts, and
    * the same cache lifecycle — stage caches released before returning. */
  def curateEmbeddings(emb: DataFrame,
                       dupThreshold: Double = 0.99,
                       numCentroids: Int = 16): (DataFrame, Seq[(String, Long)]) = {
    val stages = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val cachedFrames = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def stage(name: String, df: DataFrame): DataFrame = {
      val cached = df.cache()
      cachedFrames += cached
      stages += name -> cached.count()
      cached
    }
    try {
      val input = stage("input", emb)
      val losers = Similarity
        .cosineNearDuplicates(input, dupThreshold, numCentroids)
        .select(col("id_b").as("vec_id")).distinct()
      val deduped = stage("near_dedup", input.join(losers, Seq("vec_id"), "left_anti"))
      val quantized = deduped.withColumn("q_embedding",
        Similarity.quantizeInt8(Similarity.toDouble(col("embedding"))))
      (quantized, stages.toSeq)
    } finally cachedFrames.foreach(_.unpersist(blocking = false))
  }
}
