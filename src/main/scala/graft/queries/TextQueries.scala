package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.util.Tables._

/** Text-analysis query surface over `documents` (training-data extensions;
  * BASELINE.json north star). All single-pass, codegen'd, no UDFs. */
object TextQueries {

  /** Length / word / distinct-word stats per document. */
  def textStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        wordCount(col("text")).as("n_words"),
        size(words(col("text"))).as("n_distinct_words"))
      .orderBy("doc_id")

  /** BPE-ish pre-tokenizer token count. */
  def tokenCounts(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      .orderBy("doc_id")

  /** Distinct character-3-gram cardinality (shingle space size). */
  def ngramCardinality(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), charNgramCardinality(col("text"), 3).as("n_3grams"))
      .orderBy("doc_id")

  /** Quality signal: stopword ratio in basis points + words-per-doc. */
  def qualityScore(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        stopwordRatioBp(col("text")).as("stopword_bp"),
        wordCount(col("text")).as("n_words"))
      .orderBy("doc_id")

  /** Marker-based language guess vs the labeled lang column. */
  def langId(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang"), langGuess(col("text")).as("lang_guess"))
      .orderBy("doc_id")

  /** Normalized-text md5 fingerprint (exact-dedup key). */
  def fingerprints(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Exact dedup summarized: one row per distinct text with the surviving
    * (minimum) doc_id and the duplicate count. Groups on the md5 of the text
    * — the shuffle carries 16-byte keys, not documents (100 TB discipline). */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("text_md5"))
      .groupBy("text_md5")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")

  /** Corpus heavy hitters, exact: the 20 most frequent words overall.
    * Explode → partial-aggregate count → top-k; the scale-bounded sibling
    * is [[graft.functions.FreqSketch]] (Misra–Gries, O(k) state). */
  def topWords(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(20)

  /** PII scrubbing surface: URL + email redaction per document (the
    * corpus itself is synthetic and clean, so the behavioral contract is
    * pinned on crafted strings in TextPropertiesSpec; the oracle confirms
    * the two regexp passes agree across engines on every real row). */
  def scrubbedDocs(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), scrubPii(col("text")).as("scrubbed"))
      .orderBy("doc_id")

  /** End-to-end curation declared as an oracle-checked query — the
    * engine-portable core of [[graft.operators.CurationPipeline]]:
    * fingerprint dedup (survivor = lowest doc_id), length gate,
    * stopword-ratio quality gate, language allowlist; output is the
    * surviving docs with their word counts. The MinHash near-dup stage
    * stays in the pipeline operator (xxhash64 has no second-engine twin);
    * every stage here is expressible in both engines. */
  def curationSurvivors(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup
      .exactByFingerprint(documents(s, d), "text", keepBy = Seq("doc_id"))
      .filter(length(col("text")).between(20, 100000))
      .filter(stopwordRatioBp(col("text")) >= 200)
      .filter(col("lang").isInCollection(Seq("en", "es", "fr", "de")))
      .select(col("doc_id"), col("lang"), wordCount(col("text")).as("n_words"))
      .orderBy("doc_id")

  /** Heavy hitters via the Misra–Gries sketch, made exact (VERDICT round 2
    * next-round #7 + ADVICE determinism note): the O(k)-state sketch — one
    * pass, mergeable partials — nominates ≤ k candidate words, and its
    * guarantee says every word with count > n/(k+1) survives ANY partition
    * merge order. A second bounded pass re-counts only the candidates
    * exactly and keeps those above the guarantee bound, so the output is
    * provably equal to exact counting with `HAVING cnt·(k+1) > n` (integer
    * arithmetic, no float boundary) and fully deterministic — the MG
    * trim's merge-order wobble never reaches the output. At 100 TB:
    * pass 1 shuffles O(k·partitions) counters, pass 2 shuffles only rows
    * matching ≤ k candidate words. */
  def heavyHittersSketch(s: SparkSession, d: String): DataFrame = {
    val k = 40
    val words = documents(s, d).select(explode(split(col("text"), " ")).as("word"))
    val firstPass = words.agg(
      graft.functions.FreqSketch.heavy_hitters(k)(col("word")).as("sketch"),
      count(lit(1)).as("n")).head()
    val survivors = firstPass.getMap[String, Long](0).keys.toSeq
    val n = firstPass.getLong(1)
    val recounted = words
      .filter(col("word").isInCollection(survivors))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k + 1) > lit(n))
      .orderBy(col("cnt").desc, col("word"))
    if (survivors.isEmpty) recounted.limit(0) else recounted
  }

  /** Second quality family: word repetition (boilerplate signal) + Shannon
    * character entropy (degenerate-text / binary-noise signal). */
  def repetitionEntropy(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        repetitionBp(col("text")).as("repetition_bp"),
        round(charEntropy(col("text")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).cast("double")
          .as("char_entropy"))
      .orderBy("doc_id")

  /** Multimodal metadata surface: opaque binary payload + typed metadata,
    * payload-pruned at the scan (pixel decode lives in
    * [[graft.operators.Multimodal.ImageIODecoder]]). The oracle checks
    * byte length and content hash of the binary column. */
  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("payload_md5"))
      .orderBy("doc_id")

  /** Frame sampling as a DECLARED surface: every 8-byte-strided 16-byte
    * window of the payload, identified by md5 — the binary-slicing
    * primitive of a video pipeline ([[graft.operators.Multimodal
    * .sampleFrames]]), fully oracle-checkable because the slicing is pure
    * byte arithmetic both engines express. Docs shorter than one frame
    * contribute zero rows (the sequence(1,0)-counts-down regression this
    * query pins at every tier). */
  def frameSlices(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"), posexplode(
        graft.operators.Multimodal.sampleFrames(col("payload"), frameSize = 16, stride = 8))
        .as(Seq("pos", "frame")))
      .select(col("doc_id"), (col("pos") + 1).as("frame_idx"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  /** RAG-style document chunking: fixed 200-char windows on a 150-char
    * stride (50-char overlap), one row per (doc, window). Map-only — the
    * chunk count is pure arithmetic on `length(text)`, so the explode
    * never shuffles and parallelism is the scan's; at 100 TB this is the
    * embarrassingly-parallel shape chunk-for-embedding jobs need. Every
    * doc yields ≥ 1 chunk (an empty text still produces one empty chunk —
    * the greatest(len,1) guard keeps Spark's sequence() from counting
    * DOWN on a 0-length doc, which would diverge from DuckDB's empty
    * range()). */
  def chunkDocs(s: SparkSession, d: String): DataFrame = {
    val stride = 150
    val win = 200
    val maxK = floor((greatest(length(col("text")), lit(1)).cast("double") - 1d) /
      lit(stride.toDouble)).cast("long")
    documents(s, d)
      .select(col("doc_id"), col("text"), explode(sequence(lit(0L), maxK)).as("k"))
      .select(
        col("doc_id"),
        (col("k") + 1).as("chunk_id"),
        (col("k") * stride + 1).as("chunk_start"),
        col("text").substr((col("k") * stride + 1).cast("int"), lit(win)).as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Sequence packing for training batches: token counts accumulate in
    * doc_id order within a (lang, shard) stream, and each doc lands in the
    * 256-token bin its running prefix starts in (first-fit in arrival
    * order — docs never split). The window shuffles only (doc_id, lang,
    * shard, n_tokens) — the text column is projected away BEFORE the
    * exchange, so at 100 TB the shuffle carries ~32 bytes/doc, not
    * documents.
    *
    * `numShards` is the parallelism knob: window parallelism is
    * langs × numShards, and each shard's cumulative-sum sort grows with
    * corpus/numShards — size it to the cluster (a 1000-executor run wants
    * thousands of shards). Packing SEMANTICS are per-(lang, shard) stream
    * by construction, so the knob moves work, never results within a
    * stream (spec-pinned in ChunkPackSpec: bin composition per stream is
    * shard-count-invariant). The declared oracle query pins the fixture
    * value 8. */
  def seqPackSharded(s: SparkSession, d: String, numShards: Int): DataFrame = {
    val budget = 256
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "shard").orderBy("doc_id")
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        (col("doc_id") % numShards).as("shard"),
        tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens").cast("long")).over(w))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        floor(((col("cum") - col("n_tokens")).cast("double")) / lit(budget.toDouble))
          .cast("long").as("seq_id"))
      .orderBy("doc_id")
  }

  /** The declared fixture form of [[seqPackSharded]]: numShards = 8,
    * matching the oracle SQL's `doc_id % 8`. */
  def seqPack(s: SparkSession, d: String): DataFrame = seqPackSharded(s, d, 8)

  /** LAION-style image-text PAIR curation (VERDICT r10 #7): filter pairs
    * on BOTH media metadata (decoded from the binary payload) and caption
    * quality signals, in one pass. The pair table is synthesized
    * deterministically from `documents` — most docs get a real PNG
    * signature + IHDR, every 13th doc a real JPEG header (SOI + full JFIF
    * APP0 + SOF0), every 19th/23rd/29th a real WebP container (lossy
    * "VP8 " / lossless "VP8L" / extended "VP8X" — VERDICT r13 #6), each
    * carrying arithmetic-derived dimensions, and every
    * 17th doc a non-image payload the format gate must DROP — and the
    * ENGINE side recovers the dims by parsing the payload bytes
    * ([[graft.operators.Multimodal.pngWidth]]/`pngHeight` for PNG;
    * [[graft.operators.Multimodal.jpegDims]]' marker-segment walk for
    * JPEG, the format that actually dominates a LAION-style corpus —
    * VERDICT r11 #3), so the oracle's arithmetic twin gates the full
    * synthesize→parse round trip for BOTH formats.
    *
    * Curation rules (the standard LAION-2B shape: CLIP-score aside, the
    * metadata gates are exactly these): decodable image (PNG or JPEG),
    * min dimension ≥ 128, aspect ratio within 3:1 either way (integer
    * cross-multiplied — no float boundary), caption ≥ 20 chars and
    * ≥ 5 words, language allowlist. 100 TB posture: pairs arrive as
    * records (payload + caption in one row, the LAION parquet layout), so
    * the whole policy is ONE map-only scan-project-filter — no join, no
    * shuffle; the payload column is read only for its leading page
    * (header parse), and Catalyst prunes it entirely from the output. */
  def pairCuration(s: SparkSession, d: String): DataFrame = {
    // compiled payload constructor (r15) — see [[pairCurationPayloadHof]]
    // for the retained Column tower this is byte-for-byte pinned against
    // (SyntheticPayloadsSpec); one expression per reference lets codegen
    // CSE collapse the five format probes that each inlined the full
    // CASE/unhex tower before
    import org.apache.spark.sql.GraftBridge
    val payload = GraftBridge.column(
      graft.expr.PairPayload(GraftBridge.expression(col("doc_id"))))
    val pairs = documents(s, d).select(
      col("doc_id"), col("lang"), col("text"), payload.as("payload"))
    pairs
      .withColumn("jd", graft.operators.Multimodal.jpegDims(col("payload")))
      .withColumn("wd", graft.operators.Multimodal.webpDims(col("payload")))
      .select(
        col("doc_id"), col("lang"),
        when(graft.operators.Multimodal.isPng(col("payload")), lit("png"))
          .when(col("jd").getField("w").isNotNull, lit("jpeg"))
          .when(col("wd").getField("w").isNotNull, lit("webp"))
          .as("format"),
        coalesce(graft.operators.Multimodal.pngWidth(col("payload")),
          col("jd").getField("w"), col("wd").getField("w")).as("width"),
        coalesce(graft.operators.Multimodal.pngHeight(col("payload")),
          col("jd").getField("h"), col("wd").getField("h")).as("height"),
        wordCount(col("text")).as("n_words"),
        length(col("text")).as("n_chars"))
      .filter(col("format").isNotNull) // decodable-image gate (both arms)
      .filter(col("width").isNotNull && col("height").isNotNull)
      .filter(col("width") >= 128 && col("height") >= 128)
      .filter(col("width") * 3 >= col("height") && col("height") * 3 >= col("width"))
      .filter(col("n_chars") >= 20 && col("n_words") >= 5)
      .filter(col("lang").isInCollection(Seq("en", "es", "fr", "de")))
      .orderBy("doc_id")
  }

  /** The pre-r15 pure-Column spelling of the pair-table payload — the
    * SyntheticPayloadsSpec byte-identity pin for [[graft.expr.PairPayload]].
    * Branch layout: every 17th doc a non-image arm (red-herring SOI
    * mid-payload, dropped by the format gate), every 13th a real JPEG
    * header (SOI + full JFIF APP0 + SOF0, dims big-endian), every
    * 19th/23rd/29th a real WebP container (lossy "VP8 " / lossless "VP8L" /
    * extended "VP8X" — VERDICT r13 #6), the rest a PNG sig + IHDR; all
    * dims arithmetic-derived from doc_id. */
  private[graft] def pairCurationPayloadHof(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.Column
    val be32 = (c: Column) => unhex(lpad(hex(c), 8, "0"))
    val be16 = (c: Column) => unhex(lpad(hex(c), 4, "0"))
    val wGen = (lit(64L) + pmod(docId, lit(1984L))).cast("int")
    val hGenPng = (lit(64L) + pmod(docId * 7L, lit(1984L))).cast("int")
    val hGenJpg = (lit(64L) + pmod(docId * 11L, lit(1984L))).cast("int")
    val pngPayload = concat(
      unhex(lit("89504E470D0A1A0A0000000D49484452")), // sig + IHDR len/type
      be32(wGen), be32(hGenPng),
      unhex(lit("0806000000"))) // bit depth / color type / compression+filter+interlace
    val jpgPayload = concat(
      unhex(lit("FFD8FFE000104A46494600010100000100010000FFC0001108")),
      be16(hGenJpg), be16(wGen),
      unhex(lit("03012200021101031101")))
    val hGenWpV = (lit(64L) + pmod(docId * 13L, lit(1984L))).cast("int")
    val hGenWpL = (lit(64L) + pmod(docId * 17L, lit(1984L))).cast("int")
    val hGenWpX = (lit(64L) + pmod(docId * 19L, lit(1984L))).cast("int")
    def leBytes(c: Column, n: Int): Column =
      unhex(concat((0 until n).map(i =>
        lpad(hex(pmod(shiftright(c, 8 * i), lit(256))), 2, "0")): _*))
    val webpLossyPayload = concat(
      unhex(lit("52494646160000005745425056503820" + "0A000000" + "D00100" + "9D012A")),
      leBytes(wGen, 2), leBytes(hGenWpV, 2))
    val webpLosslessPayload = concat(
      unhex(lit("524946461100000057454250" + "5650384C" + "05000000" + "2F")),
      leBytes(wGen - 1 + (hGenWpL - 1) * 16384, 4))
    val webpXPayload = concat(
      unhex(lit("52494646160000005745425056503858" + "0A000000" + "00000000")),
      leBytes(wGen - 1, 3), leBytes(hGenWpX - 1, 3))
    val rawPayload = unhex(lit("DEADBEEF00FFD8"))
    when(pmod(docId, lit(17L)) === 0L, rawPayload)
      .when(pmod(docId, lit(13L)) === 0L, jpgPayload)
      .when(pmod(docId, lit(19L)) === 0L, webpLossyPayload)
      .when(pmod(docId, lit(23L)) === 0L, webpLosslessPayload)
      .when(pmod(docId, lit(29L)) === 0L, webpXPayload)
      .otherwise(pngPayload)
  }

  /** Image near-dup dedup by PERCEPTUAL hash (Krawetz dHash — the standard
    * fingerprint LAION-class pipelines dedup web images with): each doc
    * carries a REAL 9×8 grayscale BMP payload (bottom-up BI_RGB 24-bpp —
    * `javax.imageio` decodes it, and MultimodalSpec pins the column
    * expression's hash against a real decode), the 64-bit dHash is
    * extracted from the PAYLOAD BYTES by header-offset arithmetic
    * ([[graft.operators.Multimodal.dhashHex]]), and near-dup candidates
    * come from the banded-Hamming rule: 4 bands of 16 bits, a doc is a
    * candidate iff some band equals a smaller doc_id's (the
    * [[SimilarityQueries.bandDedup]] rule over perceptual bits).
    *
    * Synthesis plants the near-dups the gate must catch: every doc with
    * `doc_id % 5 = 4` repeats doc `doc_id−1`'s image at +2 brightness —
    * a DIFFERENT payload (different bytes, different md5) whose dHash is
    * IDENTICAL, because dHash compares neighboring lumas and a global
    * brightness shift preserves every comparison (the invariance that
    * makes dHash the right primitive; values stay ≤ 251 so no clamp).
    *
    * The oracle never parses the BMP: it recomputes the pixel arithmetic
    * directly (the payload round trip is pinned engine-side by
    * MultimodalSpec's ImageIO decode). Plan: synthesis + hash are one
    * map-only pass (~73 concat terms, 128 byte probes — constant-width
    * codegen); the band shuffle carries (doc_id, 16-char hash, 4-char
    * key) rows only. */
  /** The synthesized per-doc BMP payload — shared between [[imageDhash]]
    * and [[PipelineQueries.binaryIngest]]'s file materialization. */
  private[graft] def imagePayloads(s: SparkSession, d: String): DataFrame = {
    // compiled BMP constructor (r15) — one array fill instead of the ~73
    // concat terms the dHash's 128 byte probes each inlined; byte-identity
    // vs [[imagePayloadHof]] pinned by SyntheticPayloadsSpec
    import org.apache.spark.sql.GraftBridge
    documents(s, d).select(col("doc_id"),
      GraftBridge.column(graft.expr.ImageBmp(GraftBridge.expression(col("doc_id"))))
        .as("payload"))
  }

  /** The pre-r15 pure-Column spelling of the per-doc BMP — the
    * SyntheticPayloadsSpec byte-identity pin for [[graft.expr.ImageBmp]]. */
  private[graft] def imagePayloadHof(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.operators.Multimodal
    val mirror = pmod(docId, lit(5L)) === 4L
    val base = when(mirror, docId - 1L).otherwise(docId)
    val bright = when(mirror, lit(2)).otherwise(lit(0))
    def pix(x: Int, y: Int) =
      (pmod(base * 37L + lit(x * 11 + y * 23)
          + pmod(base * lit((x + 3) * (y + 7)), lit(97L)),
          lit(250L)) + bright).cast("int")
    Multimodal.syntheticBmp(pix)
  }

  def imageDhash(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Multimodal
    val hashed = imagePayloads(s, d)
      .select(col("doc_id"), Multimodal.dhashHex(col("payload")).as("dhash"))
    val bands = hashed.select(col("doc_id"), col("dhash"),
      posexplode(array((0 until 4).map(b =>
        substring(col("dhash"), 1 + 4 * b, 4)): _*)).as(Seq("band", "bkey")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bkey"))
    bands
      .withColumn("first_id", min(col("doc_id")).over(w))
      .groupBy("doc_id", "dhash")
      .agg(sum(when(col("first_id") < col("doc_id"), 1).otherwise(0))
        .cast("long").as("n_dup_bands"))
      .withColumn("is_neardup", (col("n_dup_bands") > 0).cast("int"))
      .orderBy("doc_id")
  }

  /** Generated oracle CTE shared by [[imageDhashOracleSql]] and
    * [[PipelineQueries]]' binary-ingest oracle: the pixel formula inlined
    * per sample, the same nibble packing as the engine's payload-byte
    * extraction. */
  private[queries] val imageDhashHashesCte: String = {
    def pxv(x: Int, y: Int) =
      s"(((b * 37 + ${x * 11 + y * 23} + (b * ${(x + 3) * (y + 7)}) % 97) % 250) + br)"
    val nibbles = (0 until 16).map { k =>
      val v = (0 until 4).map { j =>
        val idx = 4 * k + j
        val y = idx / 8; val x = idx % 8
        s"(CASE WHEN ${pxv(x, y)} > ${pxv(x + 1, y)} THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
      s"substring('0123456789abcdef', ($v) + 1, 1)"
    }.mkString(" || ")
    s"""ids AS (
         SELECT doc_id,
                CASE WHEN doc_id % 5 = 4 THEN doc_id - 1 ELSE doc_id END AS b,
                CASE WHEN doc_id % 5 = 4 THEN 2 ELSE 0 END AS br
         FROM documents),
       hashes AS (SELECT doc_id, ($nibbles) AS dhash FROM ids)"""
  }

  /** Generated oracle for [[imageDhash]]: the shared hash CTE plus the
    * band rule. */
  private[queries] val imageDhashOracleSql: String = {
    s"""WITH $imageDhashHashesCte,
       bands AS (
         SELECT doc_id, dhash, bd AS band, substring(dhash, 1 + 4*bd, 4) AS bkey
         FROM hashes, range(0, 4) t(bd)),
       marked AS (
         SELECT doc_id, dhash, band,
                min(doc_id) OVER (PARTITION BY band, bkey) AS first_id
         FROM bands)
       SELECT doc_id, dhash,
              CAST(sum(CASE WHEN first_id < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_bands,
              CAST(CASE WHEN sum(CASE WHEN first_id < doc_id THEN 1 ELSE 0 END) > 0
                   THEN 1 ELSE 0 END AS INTEGER) AS is_neardup
       FROM marked GROUP BY doc_id, dhash ORDER BY doc_id"""
  }

  /** Audio-clip metadata curation — the AUDIO arm of the multimodal
    * surface (the image arm is [[pairCuration]]/[[imageDhash]]): each doc
    * carries a REAL RIFF/WAVE container (PCM fmt chunk + declared data
    * size; data bytes elided — header-metadata extraction, the pass a
    * 100 TB audio corpus runs BEFORE any decode), and the engine recovers
    * channels / sample rate / bit depth / frame count with
    * [[graft.operators.Multimodal.wavMeta]]'s bounded CHUNK WALK — never
    * fixed offsets, because one arm plants an odd-sized LIST chunk before
    * `fmt ` (word-alignment pad and all) exactly where real broadcast
    * WAVs carry bext/LIST metadata. MultimodalSpec pins the walk against
    * the JDK's own `javax.sound.sampled` header parse on every arm.
    *
    * Synthesis arms (first match wins, mirrored in the oracle): doc_id
    * %17 → non-audio payload the gate must null out; %11 → 8 kHz mono
    * 8-bit; %13 → 44.1 kHz stereo 16-bit; %19 → 16 kHz mono 16-bit
    * behind the odd LIST chunk; else 16 kHz mono 16-bit. Frame count =
    * 8000 + (doc_id·31 mod 64000). Curation gate: a parsed fmt, sample
    * rate in [8000, 48000], duration ≥ 500 ms — the 44.1 kHz arm's short
    * clips (< 22 050 frames) drop, so the gate discriminates on REAL
    * parsed values, not arm identity. One map-only pass, scan pruned to
    * doc_id. */
  /** The synthesized WAV payload per doc — shared between [[audioMeta]]
    * and MultimodalSpec's byte-level javax.sound pin. */
  private[graft] def audioPayloads(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Column
    def leBytes(c: Column, n: Int): Column =
      unhex(concat((0 until n).map(i =>
        lpad(hex(pmod(shiftright(c, 8 * i), lit(256))), 2, "0")): _*))
    val nFrames = (lit(8000L) + pmod(col("doc_id") * 31L, lit(64000L)))
    def wav(rate: Long, ch: Int, bits: Int, listChunk: Boolean): Column = {
      val ba = ch * bits / 8
      val dsize = nFrames * ba.toLong
      val fmtAndData = concat(
        unhex(lit("666D742010000000" + "0100")), // "fmt " size=16, PCM
        leBytes(lit(ch.toLong), 2), leBytes(lit(rate), 4),
        leBytes(lit(rate * ba), 4), leBytes(lit(ba.toLong), 2),
        leBytes(lit(bits.toLong), 2),
        unhex(lit("64617461")), leBytes(dsize, 4), // "data" + declared size
        unhex(lit("00000000"))) // 4 real bytes; the rest elided
      // odd-sized LIST chunk (size 9 -> word-alignment pad byte) the walk must hop
      val list = unhex(lit("4C495354" + "09000000" + "494E464F4A554E4B31" + "00"))
      val chunks = if (listChunk) concat(list, fmtAndData) else fmtAndData
      val riffSize = lit(4L + (if (listChunk) 18L else 0L) + 24L) + lit(8L) + dsize
      concat(unhex(lit("52494646")), leBytes(riffSize, 4), unhex(lit("57415645")), chunks)
    }
    val garbage = unhex(lit("DEADBEEF00666D7420")) // red-herring "fmt " off-preamble
    val payload =
      when(pmod(col("doc_id"), lit(17L)) === 0L, garbage)
        .when(pmod(col("doc_id"), lit(11L)) === 0L, wav(8000L, 1, 8, listChunk = false))
        .when(pmod(col("doc_id"), lit(13L)) === 0L, wav(44100L, 2, 16, listChunk = false))
        .when(pmod(col("doc_id"), lit(19L)) === 0L, wav(16000L, 1, 16, listChunk = true))
        .otherwise(wav(16000L, 1, 16, listChunk = false))
    documents(s, d).select(col("doc_id"), payload.as("payload"))
  }

  def audioMeta(s: SparkSession, d: String): DataFrame = {
    val meta = audioPayloads(s, d)
      .select(col("doc_id"), graft.operators.Multimodal.wavMeta(col("payload")).as("m"))
      .select(col("doc_id"),
        col("m.channels").as("channels"),
        col("m.sample_rate").as("sample_rate"),
        col("m.bits").as("bits_per_sample"),
        col("m.n_frames").as("n_frames"))
    val ms = col("n_frames") * 1000L
    meta
      .withColumn("duration_ms",
        ((ms - pmod(ms, col("sample_rate"))) / col("sample_rate")).cast("long"))
      .withColumn("keep",
        when(col("sample_rate").isNotNull &&
            col("sample_rate").between(8000, 48000) &&
            col("duration_ms") >= 500L, 1).otherwise(0))
      .orderBy("doc_id")
  }

  /** Generated oracle for [[audioMeta]]: the arm arithmetic inlined (the
    * payload round trip is pinned engine-side by MultimodalSpec's
    * javax.sound parse, the imageDhash discipline). */
  private[queries] val audioMetaOracleSql: String =
    """WITH arms AS (
         SELECT doc_id,
                CASE WHEN doc_id % 17 = 0 THEN NULL
                     WHEN doc_id % 11 = 0 THEN 1
                     WHEN doc_id % 13 = 0 THEN 2
                     ELSE 1 END AS channels,
                CASE WHEN doc_id % 17 = 0 THEN NULL
                     WHEN doc_id % 11 = 0 THEN 8000
                     WHEN doc_id % 13 = 0 THEN 44100
                     ELSE 16000 END AS sample_rate,
                CASE WHEN doc_id % 17 = 0 THEN NULL
                     WHEN doc_id % 11 = 0 THEN 8
                     ELSE 16 END AS bits_per_sample,
                CASE WHEN doc_id % 17 = 0 THEN NULL
                     ELSE 8000 + (doc_id * 31) % 64000 END AS n_frames
         FROM documents),
       m AS (
         SELECT doc_id,
                CAST(channels AS INTEGER) AS channels,
                CAST(sample_rate AS INTEGER) AS sample_rate,
                CAST(bits_per_sample AS INTEGER) AS bits_per_sample,
                CAST(n_frames AS BIGINT) AS n_frames,
                CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms
         FROM arms)
       SELECT doc_id, channels, sample_rate, bits_per_sample, n_frames, duration_ms,
              CAST(CASE WHEN sample_rate BETWEEN 8000 AND 48000
                          AND duration_ms >= 500 THEN 1 ELSE 0 END AS INTEGER) AS keep
       FROM m ORDER BY doc_id"""

  /** BPE tokenizer training, the step that dominates at corpus scale: the
    * adjacent-symbol-pair count of the first merge iteration (Sennrich et
    * al. 2016 — each iteration merges the argmax pair and re-counts; the
    * loop is driver-side in any real fitter, the COUNT is the distributed
    * work). Plan shape is the 100 TB one: occurrences collapse to
    * (word, count) FIRST — the pair explode then runs over the vocabulary
    * (≈√corpus and sublinear in practice), not over every corpus token,
    * and the first shuffle carries words, the second 2-char pairs.
    * Words shorter than 2 chars contribute nothing (the filter also keeps
    * Spark's sequence() from counting down — the q_chunk regression).
    * Top 50 with a total-order tiebreak (cnt desc, pair asc). */
  def bpeMergePairs(s: SparkSession, d: String): DataFrame = {
    val vocab = documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("word_cnt"))
    vocab
      .select(explode(transform(
          sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"),
        col("word_cnt"))
      .groupBy("pair").agg(sum("word_cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(50)
  }

  /** Canonical Unicode normalization over the raw corpus — the ingest-time
    * transform every training pipeline runs FIRST (two byte-different
    * spellings of one grapheme defeat every downstream fingerprint):
    * NFC-compose, controls→space, collapse space runs, trim — all inside
    * [[graft.expr.NormalizeText]], a codegen-participating expression, so
    * the normalize→length→md5 chain is one WholeStageCodegen span over the
    * scan. The fixture prepends a decomposed `e`+U+0301 / `A`+U+030A pair,
    * a BEL, a VT and DEL plus ragged spacing so the oracle (utf8proc's
    * `nfc_normalize` + the regex spelling) gates every rule, not just the
    * ASCII identity path. Map-only: zero shuffles at any corpus size. */
  def normalizeText(s: SparkSession, d: String): DataFrame = {
    val raw = concat(
      lit("e\u0301 A\u030A\u0007tab  "), col("text"), lit(" \u000B\u007F x  "))
    documents(s, d)
      .select(col("doc_id"), graft.expr.NormalizeText.normalize_text(raw).as("norm"))
      .select(col("doc_id"),
        length(col("norm")).as("n_chars_norm"),
        md5(col("norm")).as("norm_md5"))
      .orderBy("doc_id")
  }

  /** Main-content extraction from raw HTML — the step between the crawl
    * and every text operator above (the trafilatura/resiliparse slot in a
    * CommonCrawl-lineage pipeline). Deterministic wrapper synthesis makes
    * the oracle gate the FULL strip contract: `<script>`/`<style>` blocks
    * (content and all) drop first, remaining tags become spaces, the six
    * standard entities decode (`&amp;` last, as any entity decoder must),
    * whitespace collapses. Regex-only — Java and RE2 agree on every
    * pattern used (no backreferences, which RE2 lacks: script and style
    * strip separately). One map-only scan; the payload never shuffles. */
  def htmlExtract(s: SparkSession, d: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>T</title><style type=\"text/css\">p { color: #333; }" +
        "</style><script>var nav = \"<p>menu</p>\";</script></head>" +
        "<body><h1>Title</h1><p class=\"main\">"),
      col("text"),
      lit("</p><p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>" +
        "<div id=\"footer\"><a href=\"/about\">about</a> | <a href=\"/x\">x</a>" +
        "</div></body></html>"))
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle  = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags   = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = replace(
      replace(
        replace(
          replace(
            replace(
              replace(noTags, lit("&nbsp;"), lit(" ")),
              lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    val clean = trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
    documents(s, d)
      .select(col("doc_id"), clean.as("extracted"))
      .select(col("doc_id"),
        length(col("extracted")).as("n_chars"),
        md5(col("extracted")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Corpus PII audit — the measurement side of the scrubbing step
    * (q_scrub_pii redacts; release gates need the COUNTS: how much PII of
    * which class, per source, before/after). The synthetic corpus is
    * clean, so each doc gets deterministic planted PII (an email, an
    * E.164-ish phone, an IPv4 — every third doc a second email) and the
    * oracle gates detector + rollup end-to-end. Patterns are RE2-safe
    * (no backreferences); counts per class via regexp_count, reduced
    * map-side into a source-cardinality rollup — one scan, the only
    * shuffle carries ≤ |sources| partial rows. */
  def piiStats(s: SparkSession, d: String): DataFrame = {
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com"),
      when(pmod(col("doc_id"), lit(3L)) === 0L,
        concat(lit(" cc admin"), col("doc_id"), lit("@corp.example.org")))
        .otherwise(lit("")),
      lit(" tel +1-555-"), lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
      lit(" host "), pmod(col("doc_id"), lit(256L)), lit("."),
      pmod(col("doc_id") * 7L, lit(256L)), lit(".0.1"))
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val ipRe    = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    documents(s, d)
      .select(col("source"),
        regexp_count(planted, lit(emailRe)).as("e"),
        regexp_count(planted, lit(phoneRe)).as("p"),
        regexp_count(planted, lit(ipRe)).as("i"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("e").as("n_emails"),
        sum("p").as("n_phones"),
        sum("i").as("n_ips"),
        sum(when(col("e") + col("p") + col("i") > 0, 1L).otherwise(0L))
          .as("n_docs_with_pii"))
      .orderBy("source")
  }

  /** Vocabulary coverage / OOV rate — the tokenizer-eval metric that pairs
    * with q_bpe_merges (after fitting a vocab, the question is what
    * fraction of each language's tokens it covers; OOV spikes are how
    * under-represented languages are caught before training). Vocab = the
    * top-1000 corpus words by count (count desc, word asc — total order);
    * per-lang coverage in basis points, integer floor (exact cross-engine
    * parity). Scale shape: the vocab is a bounded top-K off a word count
    * (map-side partials, 2-word-ish shuffle keys), then broadcast back
    * against the exploded corpus — the corpus-sized side joins map-side
    * against 1000 keys and reduces to a per-lang rollup; nothing
    * corpus-sized ever sorts or shuffles wide rows. */
  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val words = documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
    val vocab = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(1000)
      .select("word").withColumn("__in_vocab", lit(1L))
    words.join(broadcast(vocab), Seq("word"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__in_vocab"), lit(0L))).as("n_covered"))
      .select(col("lang"), col("n_tokens"), col("n_covered"),
        floor((col("n_tokens") - col("n_covered")) * lit(10000) / col("n_tokens"))
          .cast("long").as("oov_bp"))
      .orderBy("lang")
  }

  /** The SECOND BPE merge iteration — q_bpe_merges is the count step, this
    * is the loop: take iteration 1's argmax pair (total order: cnt desc,
    * pair asc), MERGE it into every vocabulary word (left-to-right
    * non-overlapping, the BPE contract — `replace` in both engines), and
    * re-count adjacent symbol pairs over the merged words, the merged pair
    * occupying one symbol slot (a sentinel char internally; rendered back
    * with ⟨⟩ marks in the output so the sentinel never leaves the engine).
    * The driver-side step is ONE bounded row (the argmax) — exactly what a
    * real fitter's loop collects per iteration; everything corpus-sized
    * stays the q_bpe_merges shape (occurrences collapse to (word, count)
    * first; pair explode runs over the vocabulary, never corpus tokens). */
  def bpeApply(s: SparkSession, d: String): DataFrame = {
    val vocab = documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("word_cnt"))
    val top = vocab
      .select(explode(transform(
          sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"),
        col("word_cnt"))
      .groupBy("pair").agg(sum("word_cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(1).select("pair").head().getString(0)
    val sentinel = "\u0001"
    val merged = vocab
      .select(replace(col("word"), lit(top), lit(sentinel)).as("w"), col("word_cnt"))
      .filter(length(col("w")) >= 2)
    merged
      .select(explode(transform(
          sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"),
        col("word_cnt"))
      .groupBy("pair").agg(sum("word_cnt").as("cnt"))
      .select(
        replace(col("pair"), lit(sentinel), lit("⟨" + top + "⟩")).as("pair"),
        col("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)
  }

  /** The scalar PREFIX of [[curationV2]] — HTML wrap synthesis → main-
    * content extraction ([[htmlExtract]]'s strip contract) → NFC
    * normalization ([[graft.expr.NormalizeText]]) → rule + language
    * filters — exposed separately so CurationV2Spec can pin that the
    * whole prefix compiles into ONE WholeStageCodegen region over the
    * scan: at 100 TB these per-doc stages must fuse (one pass over the
    * payload, no materialization between them), and the codegen-
    * participating NormalizeText expression is what makes that possible. */
  private[queries] def curationV2Scalar(docs: DataFrame): DataFrame = {
    val html = concat(
      lit("<html><head><title>T</title><style type=\"text/css\">p { color: #333; }" +
        "</style><script>var nav = \"<p>menu</p>\";</script></head>" +
        "<body><h1>Title</h1><p class=\"main\">"),
      col("text"),
      lit("</p><p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>" +
        "<div id=\"footer\"><a href=\"/about\">about</a> | <a href=\"/x\">x</a>" +
        "</div></body></html>"))
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle  = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags   = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = replace(
      replace(
        replace(
          replace(
            replace(
              replace(noTags, lit("&nbsp;"), lit(" ")),
              lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    val extracted = trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
    val norm = graft.expr.NormalizeText.normalize_text(extracted)
    docs
      .select(col("doc_id"), col("lang"), norm.as("norm"))
      .filter(length(col("norm")) >= 20 && wordCount(col("norm")) >= 5)
      .filter(col("lang").isInCollection(Seq("en", "es", "fr", "de")))
  }

  /** END-TO-END curation DAG v2 (VERDICT r11 #6) — the pipeline a real
    * web corpus actually runs, composed from this round's operator
    * surface: html_extract → normalize_text → rule/language filter →
    * exact dedup on the NORMALIZED text (the right key — two
    * byte-different spellings of one grapheme are one document) →
    * domain cap (the q_domain_cap skew discipline: blocklist, hot-host
    * split, WindowGroupLimit-pushable rank for the mega-site, anti-join
    * bypass for the long tail). The scalar prefix is one fused codegen
    * pass ([[curationV2Scalar]], spec-pinned); the only corpus-sized
    * shuffles are the dedup fingerprint hash and the hot-host rank —
    * both 16-byte-key bounded. q_curation (the v1 fingerprint pipeline)
    * stays as the §2-era surface; this is the round-11-operator
    * composition. */
  def curationV2(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = curationV2Scalar(documents(s, d))
      .select(col("doc_id"), col("lang"), md5(col("norm")).as("f"),
        length(col("norm")).as("n_chars"))
    val deduped = base
      .withColumn("__rk",
        row_number().over(Window.partitionBy("f").orderBy("doc_id")))
      .filter(col("__rk") === 1)
      .select("doc_id", "lang", "n_chars")
    val cap = 12
    val host0 = when(pmod(col("doc_id"), lit(16L)) === 0L, lit("spam.biz"))
      .when(pmod(col("doc_id"), lit(16L)) === 8L, lit("ads.example"))
      .when(pmod(col("doc_id"), lit(4L)) =!= 0L, lit("megasite.example"))
      .otherwise(concat(lit("site-"), pmod(col("doc_id"), lit(997L)), lit(".example")))
    val url = concat(lit("https://"), host0, lit("/p/"), col("doc_id"))
    val parsed = deduped
      .withColumn("host", regexp_extract(url, "^https://([^/]+)/", 1))
      .filter(!col("host").isInCollection(Seq("spam.biz", "ads.example")))
    val counts = parsed.groupBy("host").agg(count(lit(1)).as("__n"))
    val hot = broadcast(counts.filter(col("__n") > cap).select("host"))
    val capped = parsed.join(hot, Seq("host"), "left_semi")
      .withColumn("__hk",
        row_number().over(Window.partitionBy("host").orderBy("doc_id")))
      .filter(col("__hk") <= cap)
      .select("doc_id", "host", "lang", "n_chars")
    val tail = parsed.join(hot, Seq("host"), "left_anti")
      .select("doc_id", "host", "lang", "n_chars")
    capped.unionByName(tail).orderBy("doc_id")
  }

  /** BPE tokenizer TRAINING — the K-iteration argmax-merge-recount loop
    * (Sennrich et al. 2016) that [[bpeMergePairs]] (iteration 1) and
    * [[bpeApply]] (iteration 2) hand-unroll, run to K=8 merges on a
    * CAPPED vocabulary (VERDICT r11 #4, on the top-K discipline of #1:
    * the word domain is the top-65536 corpus words, so the per-iteration
    * state is bounded by construction even on adversarial distinct-heavy
    * text where the raw vocabulary is corpus-sized).
    *
    * Loop shape — exactly what a real fitter distributes: per iteration,
    * ONE bounded-row driver collect (the argmax pair, total order cnt
    * desc / pair asc) and one vocabulary-sized map (merge the pair into
    * every word via `replace`, the merged pair occupying one sentinel
    * char — chr(i) for iteration i). Everything corpus-sized happens ONCE
    * (the initial word count; its top-K is a TakeOrdered — per-partition
    * partial top-K, never a full sort). Each iteration's vocab is
    * snapshotted so iteration 8 does not recompute merges 1-7 per
    * reference. Output: the merge table — (iter, pair, cnt) with earlier
    * merges rendered as ⟨j⟩ references (the standard merge-table form:
    * later merges reference earlier ones by index), so no sentinel byte
    * leaves the engine. */
  /** The K-iteration merge loop shared by [[bpeTrain]] (which emits the
    * merge table) and [[bpeTokenize]] (which applies it to the corpus):
    * returns (iter, rawPair, cnt) with rawPair in SENTINEL form (chr(j)
    * stands for merge j's symbol — the form `replace` chains consume).
    * Corpus invariant (ADVICE r12 #5's sibling): sentinel bytes chr(1)..
    * chr(iters) must not occur in corpus words — the driver generator
    * guarantees control-free text, and [[graft.expr.NormalizeText]]
    * (controls→space) enforces it for any pipeline that normalizes
    * first. A word CONTAINING a sentinel byte would conflate with a
    * merged symbol in both engine and oracle (they mirror the
    * convention, so they'd still agree — the invariant guards the
    * SEMANTIC reading of the merge table, not cross-engine parity).
    * Memoized per (dataset, iters, k) like `schemaMemo` (VERDICT r12 #4:
    * train and tokenize used to each re-fit the same 8 merges — 16
    * argmax collects + 16 vocab snapshots where 8 suffice); the fit runs
    * once per JVM per key, losers of the race block on the winner. The
    * loop stops early — keeping the merges found so far — if the capped
    * vocabulary runs dry (no word of length ≥ 2 left: merged words
    * shorter than 2 chars are filtered out), instead of crashing on an
    * empty argmax frame (ADVICE r12 #2). */
  private val mergeMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.CompletableFuture[Seq[(Long, String, Long)]]]()

  /** Fit counter for the memoization spec — counts actual merge-loop runs,
    * not memo hits. */
  private[graft] val bpeFitCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Pass counter for the BATCHED fitter's spec — counts distributed
    * count-select-rewrite passes, the quantity batching exists to shrink. */
  private[graft] val bpeBatchPassCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** The capped (word, word_cnt) vocabulary both fitters start from. */
  private def bpeVocab(s: SparkSession, d: String, k: Int): DataFrame =
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("word_cnt"))
      .orderBy(col("word_cnt").desc, col("w")).limit(k)

  /** The EXACT sequential merge loop over a (w, word_cnt) vocabulary frame
    * — one argmax collect + one rewrite per merge (Sennrich's reference
    * semantics; the declared q_bpe_train/q_bpe_tokenize contract and what
    * their DuckDB oracles mirror). `sentinelOf` renders merge j's symbol;
    * the default chr(j) matches the oracle convention and is safe for the
    * declared iters=8 (control bytes, absent from the corpus) — fits past
    * ~31 merges must pass a private-use-area sentinel instead (chr(32) is
    * the SPACE the corpus splits on, and printable bytes collide with
    * real text). */
  private[graft] def bpeFitWords(words0: DataFrame, iters: Int,
      sentinelOf: Int => String = j => j.toChar.toString): Seq[(Long, String, Long)] = {
    var v = graft.util.Snapshots.snap(words0)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    var it = 1
    var dry = false
    while (it <= iters && !dry) {
      val top = v
        .select(explode(transform(
            sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"),
          col("word_cnt"))
        .groupBy("pair").agg(sum("word_cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect().headOption
      top match {
        case None => dry = true // vocabulary exhausted: stop with what we have
        case Some(row) =>
          val pair = row.getString(0)
          merges += ((it.toLong, pair, row.getLong(1)))
          v = graft.util.Snapshots.snap(
            v.select(replace(col("w"), lit(pair), lit(sentinelOf(it))).as("w"),
                col("word_cnt"))
              .filter(length(col("w")) >= 2))
          it += 1
      }
    }
    merges.toSeq
  }

  /** BATCHED merge selection — the scale path past the exact fitter's
    * one-driver-round-trip-per-merge bound (VERDICT r13 #3: a production
    * 32k-merge vocabulary is 32k Spark jobs under the exact loop). Each
    * pass counts pairs ONCE, collects the top-`batch` candidates, and
    * greedily accepts them in rank order subject to SYMBOL DISJOINTNESS:
    * a candidate sharing any symbol with an already-accepted pair of this
    * pass is deferred to the next pass. Disjointness makes the batch
    * sound, not just fast — merging "ab"→X can neither destroy nor create
    * occurrences of a pair over OTHER symbols (destruction needs a shared
    * symbol; creation would need the replace to make two old symbols
    * adjacent, and it substitutes one new symbol instead), so every
    * accepted pair's count is exactly its pass-start count and the
    * accepted merges commute. The sequence can still differ from the
    * exact fitter's (which re-counts after every merge and may promote a
    * pair involving a just-created symbol — the standard, documented
    * approximation of batched BPE); with `batch = 1` the loop IS the
    * exact fitter, argmax for argmax. All accepted rewrites of a pass
    * apply in ONE distributed job (a replace chain), so driver round
    * trips shrink from `iters` to `iters / E[accepted per pass]`. */
  private[graft] def bpeFitWordsBatched(words0: DataFrame, iters: Int, batch: Int,
      sentinelOf: Int => String = j => j.toChar.toString): Seq[(Long, String, Long)] = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    var v = graft.util.Snapshots.snap(words0)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    var it = 1
    var dry = false
    while (it <= iters && !dry) {
      bpeBatchPassCount.incrementAndGet()
      val m = math.min(batch, iters - it + 1)
      val top = v
        .select(explode(transform(
            sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"),
          col("word_cnt"))
        .groupBy("pair").agg(sum("word_cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(m).collect()
      if (top.isEmpty) dry = true
      else {
        val used = scala.collection.mutable.Set[Char]()
        var rewritten: org.apache.spark.sql.Column = col("w")
        top.foreach { row =>
          val pair = row.getString(0)
          if (!pair.exists(used.contains)) {
            used ++= pair
            merges += ((it.toLong, pair, row.getLong(1)))
            rewritten = replace(rewritten, lit(pair), lit(sentinelOf(it)))
            it += 1
          }
        }
        v = graft.util.Snapshots.snap(
          v.select(rewritten.as("w"), col("word_cnt"))
            .filter(length(col("w")) >= 2))
      }
    }
    merges.toSeq
  }

  /** Private-use-area sentinel for deep fits (merge ids past the control
    * range): U+E000 + j can never collide with corpus text or the space
    * delimiter. */
  private[graft] def puaSentinel(j: Int): String = (0xE000 + j).toChar.toString

  private def bpeMergeList(s: SparkSession, d: String,
                           iters: Int = 8, k: Int = 65536): Seq[(Long, String, Long)] =
    // key scoped by applicationId + the corpus' leaf-file fingerprint
    // (ADVICE r13 #2, matching orcMemo/bucketedStarTables): a long-lived
    // JVM that rewrites documents.parquet under the same path re-fits
    // instead of serving stale merges
    graft.util.Memo.once(mergeMemo,
      s.sparkContext.applicationId + s"|$d|$iters|$k#" +
        graft.util.DataFingerprint.of(documents(s, d))) {
      bpeFitCount.incrementAndGet()
      bpeFitWords(bpeVocab(s, d, k), iters)
    }

  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rendered = bpeMergeList(s, d).map { case (it, p, c) =>
      val r = (1 until it.toInt).foldLeft(p) { (acc, j) =>
        acc.replace(j.toChar.toString, s"⟨$j⟩") }
      (it, r, c)
    }
    rendered.toDF("iter", "pair", "cnt").orderBy("iter")
  }

  /** BPE TOKENIZATION with the trained merges — the application step that
    * completes [[bpeTrain]]'s story (train → tokenize the corpus): every
    * corpus word is tokenized by applying the 8 learned merges in
    * training order (each `replace` collapses one merged pair to one
    * symbol — sentinels count 1, exactly the trainer's convention), and
    * the per-language rollup reports the compression the vocabulary buys
    * (chars = token count at iteration 0; merged symbols shrink it).
    * Driver state: the 8 collected merge pairs (bounded — the same rows
    * q_bpe_train emits), inlined as literals into a map-only replace
    * chain; the corpus pass is one explode + 8 codegen'd replaces + a
    * |langs|-key rollup. Savings in basis points, integer floor. */
  def bpeTokenize(s: SparkSession, d: String): DataFrame = {
    val merges = bpeMergeList(s, d)
    val word = col("word")
    val tokenized = merges.foldLeft(word) { case (acc, (it, p, _)) =>
      replace(acc, lit(p), lit(it.toInt.toChar.toString))
    }
    documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .select(col("lang"), length(word).as("n_chars"),
        length(tokenized).as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum("n_chars").as("n_chars"),
        sum("n_tokens").as("n_tokens"))
      .select(col("lang"), col("n_words"), col("n_chars"), col("n_tokens"),
        floor((col("n_chars") - col("n_tokens")) * lit(10000) / col("n_chars"))
          .cast("long").as("savings_bp"))
      .orderBy("lang")
  }

  /** C4-style EXACT LINE DEDUPLICATION across the corpus (Raffel et al.
    * 2020 §2.2 deduplicate any three-sentence span that occurs more than
    * once; RefinedWeb/Falcon run the same rule at line granularity): the
    * corpus-wide pass that keeps only the FIRST occurrence of every
    * repeated line and reports, per document, how much text survives.
    * The synthetic corpus has no newlines or sentence punctuation, so the
    * "line" here is the aligned 8-word chunk — the operator is agnostic
    * to the splitter, the DAG is what matters:
    *
    *   explode docs into (doc_id, pos, line)        — map-only
    *   row_number over (PARTITION BY line            — shuffle 1, by line
    *                    ORDER BY doc_id, pos) = 1 → keeper
    *   per-doc rollup: n_lines / n_kept / kept_chars — shuffle 2, by doc
    *   + md5 of the kept text (pos-ordered)          — the value witness
    *
    * 100 TB shape: both shuffles are linear in corpus tokens; the line
    * partition key is high-cardinality (no skew beyond natural line
    * repetition, and a pathologically hot line concentrates only ITS
    * copies — the keeper scan is then a per-partition top-1, not a sort
    * of the corpus). The per-doc collect_list is bounded by document
    * length. First occurrence is defined by (doc_id, pos) — a total
    * order, so the result is deterministic under any partitioning; the
    * DuckDB oracle mirrors it with the identical window. */
  def lineDedup(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("line").orderBy("doc_id", "pos")
    val chunks = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), ceil(size(col("ws")) / 8.0).cast("int") - 1),
        i => array_join(slice(col("ws"), i * 8 + 1, lit(8)), " "))))
      .withColumnRenamed("col", "line")
    chunks
      .withColumn("rk", row_number().over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"),
        coalesce(sum(when(col("rk") === 1, length(col("line")))), lit(0L))
          .as("kept_chars"),
        // kept text reassembled in position order; md5 is the
        // cross-engine witness that the SAME text survived
        md5(array_join(transform(
          array_sort(collect_list(when(col("rk") === 1,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), " ").cast("binary")).as("kept_md5"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("kept_chars"),
        when(col("n_kept") > 0, col("kept_md5")).as("kept_md5"))
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_line_dedup"        -> (lineDedup _),
    "q_bpe_train"         -> (bpeTrain _),
    "q_bpe_tokenize"      -> (bpeTokenize _),
    "q_curation_v2"       -> (curationV2 _),
    "q_bpe_apply"         -> (bpeApply _),
    "q_vocab_coverage"    -> (vocabCoverage _),
    "q_pii_stats"         -> (piiStats _),
    "q_normalize_text"    -> (normalizeText _),
    "q_html_extract"      -> (htmlExtract _),
    "q_bpe_merges"        -> (bpeMergePairs _),
    "q_pair_curation"     -> (pairCuration _),
    "q_image_dhash"       -> (imageDhash _),
    "q_audio_meta"        -> (audioMeta _),
    "q_frame_slices"      -> (frameSlices _),
    "q_chunk"             -> (chunkDocs _),
    "q_seq_pack"          -> (seqPack _),
    "q_text_stats"        -> (textStats _),
    "q_token_count"       -> (tokenCounts _),
    "q_ngram_cardinality" -> (ngramCardinality _),
    "q_quality_score"     -> (qualityScore _),
    "q_repetition"        -> (repetitionEntropy _),
    "q_top_words"         -> (topWords _),
    "q_heavy_hitters_sketch" -> (heavyHittersSketch _),
    "q_curation"          -> (curationSurvivors _),
    "q_scrub_pii"         -> (scrubbedDocs _),
    "q_lang_id"           -> (langId _),
    "q_fingerprint"       -> (fingerprints _),
    "q_dedup_exact"       -> (dedupExact _),
    "q_multimodal_meta"   -> (multimodalMeta _),
  )

  /** The q_bpe_train oracle, generated: the 8 merge iterations unroll as
    * CTE triples (p_i pair counts → t_i argmax → v_i merged vocab) over
    * the same capped top-65536 word domain; the final projection renders
    * each iteration's sentinels chr(j) as ⟨j⟩ merge references, exactly
    * the engine's driver-side rendering. */
  private val bpeOracleIters = 8

  /** Shared CTE prefix for the q_bpe_train / q_bpe_tokenize oracles: the
    * capped word domain plus the 8 unrolled merge-iteration triples. */
  private val bpeOracleCtes: String = {
    val head =
      """WITH v0 AS (SELECT word AS w, word_cnt FROM (
             SELECT word, count(*) AS word_cnt
             FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             WHERE length(word) >= 2 GROUP BY word
             ORDER BY word_cnt DESC, word LIMIT 65536))"""
    val iterCtes = (1 to bpeOracleIters).map { it =>
      s"""
         p$it AS (SELECT unnest(list_transform(range(1, length(w)),
                                i -> substr(w, CAST(i AS INT), 2))) AS pair,
                         word_cnt
                  FROM v${it - 1}),
         t$it AS (SELECT pair, CAST(sum(word_cnt) AS BIGINT) AS cnt
                  FROM p$it GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
         v$it AS (SELECT w, word_cnt FROM (
                    SELECT replace(w, (SELECT pair FROM t$it), chr($it)) AS w,
                           word_cnt
                    FROM v${it - 1}) WHERE length(w) >= 2)"""
    }.mkString(",", ",", "")
    head + iterCtes
  }

  private val bpeTrainOracle: String = {
    val rows = (1 to bpeOracleIters).map { it =>
      val render = (1 until it).foldLeft("pair") { (acc, j) =>
        s"replace($acc, chr($j), '⟨$j⟩')"
      }
      s"SELECT CAST($it AS BIGINT) AS iter, $render AS pair, cnt FROM t$it"
    }.mkString("\n UNION ALL ")
    s"$bpeOracleCtes\n$rows\n ORDER BY iter"
  }

  private val bpeTokenizeOracle: String = {
    val applied = (1 to bpeOracleIters).foldLeft("word") { (acc, it) =>
      s"replace($acc, (SELECT pair FROM t$it), chr($it))"
    }
    s"""$bpeOracleCtes,
       wrds AS (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
       tok AS (SELECT lang, length(word) AS n_chars,
                      length($applied) AS n_tokens
               FROM wrds)
     SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
            CAST(sum(n_chars) AS BIGINT) AS n_chars,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            CAST(floor((sum(n_chars) - sum(n_tokens)) * 10000 / sum(n_chars)) AS BIGINT)
              AS savings_bp
     FROM tok GROUP BY lang ORDER BY lang"""
  }

  val oracle: Map[String, String] = Map(
    // C4 line dedup: aligned 8-word chunks, first occurrence by
    // (doc_id, pos) survives; md5 of the pos-ordered kept text is the
    // value witness that BOTH engines kept the same lines
    "q_line_dedup" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         ch AS (SELECT doc_id, CAST(i AS INT) AS pos,
                       array_to_string(w[(i*8+1):(i*8+8)], ' ') AS line
                FROM ws, unnest(range(0, CAST(ceil(len(w)/8.0) AS BIGINT))) AS t(i)),
         r AS (SELECT doc_id, pos, line,
                      row_number() OVER (PARTITION BY line
                                         ORDER BY doc_id, pos) AS rk
               FROM ch)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
              CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              CAST(coalesce(sum(CASE WHEN rk = 1 THEN length(line) END), 0) AS BIGINT) AS kept_chars,
              CASE WHEN sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) > 0
                   THEN md5(string_agg(CASE WHEN rk = 1 THEN line END, ' ' ORDER BY pos))
                   END AS kept_md5
       FROM r GROUP BY doc_id ORDER BY doc_id""",
    "q_bpe_train" -> bpeTrainOracle,
    "q_bpe_tokenize" -> bpeTokenizeOracle,
    // the composed DAG: the q_html_extract strip chain, the
    // q_normalize_text utf8proc NFC mirror, the rule/lang gates, min-id
    // dedup on the normalized md5, then the q_domain_cap
    // blocklist-and-cap — each stage's spelling verbatim from its
    // single-stage oracle so a v2 divergence localizes to composition
    "q_curation_v2" ->
      raw"""WITH h AS (
             SELECT doc_id, lang,
                    '<html><head><title>T</title><style type="text/css">p { color: #333; }' ||
                    '</style><script>var nav = "<p>menu</p>";</script></head>' ||
                    '<body><h1>Title</h1><p class="main">' || text ||
                    '</p><p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>' ||
                    '<div id="footer"><a href="/about">about</a> | <a href="/x">x</a>' ||
                    '</div></body></html>' AS html
             FROM documents),
           s1 AS (SELECT doc_id, lang, regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
           s2 AS (SELECT doc_id, lang, regexp_replace(t, '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
           s3 AS (SELECT doc_id, lang, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s2),
           dch AS (SELECT doc_id, lang,
                          replace(replace(replace(replace(replace(replace(t,
                            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                            '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t
                   FROM s3),
           c AS (SELECT doc_id, lang, trim(regexp_replace(t, '[ \t\n\r]+', ' ', 'g')) AS extracted FROM dch),
           n AS (SELECT doc_id, lang,
                        trim(regexp_replace(regexp_replace(nfc_normalize(extracted),
                             '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g')) AS norm
                 FROM c),
           flt AS (SELECT doc_id, lang, norm FROM n
                   WHERE length(norm) >= 20
                     AND len(string_split(norm, ' ')) >= 5
                     AND lang IN ('en','es','fr','de')),
           ddp AS (SELECT doc_id, lang, md5(norm) AS f, length(norm) AS n_chars FROM flt),
           keep AS (SELECT f, min(doc_id) AS doc_id FROM ddp GROUP BY f),
           surv AS (SELECT d.doc_id, d.lang, d.n_chars
                    FROM ddp d JOIN keep k ON d.doc_id = k.doc_id),
           u AS (SELECT doc_id, lang, n_chars,
                        CASE WHEN doc_id % 16 = 0 THEN 'spam.biz'
                             WHEN doc_id % 16 = 8 THEN 'ads.example'
                             WHEN doc_id % 4 <> 0 THEN 'megasite.example'
                             ELSE 'site-' || (doc_id % 997) || '.example' END AS h0
                 FROM surv),
           p AS (SELECT doc_id, lang, n_chars,
                        regexp_extract('https://' || h0 || '/p/' || doc_id,
                                       '^https://([^/]+)/', 1) AS host
                 FROM u),
           f2 AS (SELECT * FROM p WHERE host NOT IN ('spam.biz', 'ads.example')),
           r AS (SELECT doc_id, host, lang, n_chars,
                        row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rk
                 FROM f2)
         SELECT doc_id, host, lang, n_chars FROM r WHERE rk <= 12 ORDER BY doc_id""",
    // sentinel = chr(1) internally, rendered as chr(10216)/chr(10217)
    // angle marks around the merged pair — byte-identical to the engine
    "q_bpe_apply" ->
      """WITH v AS (SELECT word, count(*) AS word_cnt
                    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
                    WHERE length(word) >= 2 GROUP BY word),
           p1 AS (SELECT unnest(list_transform(range(1, length(word)),
                                               i -> substr(word, CAST(i AS INT), 2))) AS pair,
                         word_cnt
                  FROM v),
           top AS (SELECT pair FROM (SELECT pair, sum(word_cnt) AS cnt FROM p1 GROUP BY pair
                                     ORDER BY cnt DESC, pair LIMIT 1)),
           m AS (SELECT replace(word, (SELECT pair FROM top), chr(1)) AS w, word_cnt FROM v),
           m2 AS (SELECT w, word_cnt FROM m WHERE length(w) >= 2),
           p2 AS (SELECT unnest(list_transform(range(1, length(w)),
                                               i -> substr(w, CAST(i AS INT), 2))) AS pair,
                         word_cnt
                  FROM m2),
           c2 AS (SELECT pair, CAST(sum(word_cnt) AS BIGINT) AS cnt FROM p2 GROUP BY pair)
         SELECT replace(pair, chr(1), chr(10216) || (SELECT pair FROM top) || chr(10217)) AS pair,
                cnt
         FROM c2 ORDER BY cnt DESC, pair LIMIT 20""",
    "q_vocab_coverage" ->
      """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
            v AS (SELECT word FROM (SELECT word, count(*) AS cnt FROM w GROUP BY word
                                    ORDER BY cnt DESC, word LIMIT 1000)),
            j AS (SELECT lang,
                         CASE WHEN word IN (SELECT word FROM v) THEN 1 ELSE 0 END AS c
                  FROM w)
         SELECT lang, count(*) AS n_tokens,
                CAST(sum(c) AS BIGINT) AS n_covered,
                CAST(floor((count(*) - sum(c)) * 10000 / count(*)) AS BIGINT) AS oov_bp
         FROM j GROUP BY lang ORDER BY lang""",
    "q_pii_stats" ->
      raw"""WITH t AS (
             SELECT source,
                    text || ' contact user' || doc_id || '@example.com' ||
                    CASE WHEN doc_id % 3 = 0
                         THEN ' cc admin' || doc_id || '@corp.example.org'
                         ELSE '' END ||
                    ' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                    ' host ' || (doc_id % 256) || '.' || (doc_id * 7 % 256) || '.0.1' AS s
             FROM documents),
           c AS (
             SELECT source,
                    len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
                    len(regexp_extract_all(s, '\+1-555-[0-9]{4}')) AS p,
                    len(regexp_extract_all(s, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS i
             FROM t)
         SELECT source, count(*) AS n_docs,
                CAST(sum(e) AS BIGINT) AS n_emails,
                CAST(sum(p) AS BIGINT) AS n_phones,
                CAST(sum(i) AS BIGINT) AS n_ips,
                CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii
         FROM c GROUP BY source ORDER BY source""",
    // the oracle builds the SAME raw fixture (decomposed combining marks +
    // controls via chr()) and normalizes with utf8proc's nfc_normalize +
    // the regex spelling of strip/collapse/trim — a hash match gates the
    // engine's fused one-pass expression against an independent NFC
    // implementation on every row
    "q_normalize_text" ->
      raw"""WITH t AS (
             SELECT doc_id,
                    'e' || chr(769) || ' A' || chr(778) || chr(7) || 'tab  ' ||
                    text || ' ' || chr(11) || chr(127) || ' x  ' AS raw
             FROM documents),
           n AS (
             SELECT doc_id,
                    trim(regexp_replace(regexp_replace(nfc_normalize(raw),
                         '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g')) AS norm
             FROM t)
         SELECT doc_id, length(norm) AS n_chars_norm, md5(norm) AS norm_md5
         FROM n ORDER BY doc_id""",
    "q_html_extract" ->
      raw"""WITH h AS (
             SELECT doc_id,
                    '<html><head><title>T</title><style type="text/css">p { color: #333; }' ||
                    '</style><script>var nav = "<p>menu</p>";</script></head>' ||
                    '<body><h1>Title</h1><p class="main">' || text ||
                    '</p><p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>' ||
                    '<div id="footer"><a href="/about">about</a> | <a href="/x">x</a>' ||
                    '</div></body></html>' AS html
             FROM documents),
           s1 AS (SELECT doc_id, regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
           s2 AS (SELECT doc_id, regexp_replace(t, '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
           s3 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s2),
           d AS (SELECT doc_id,
                        replace(replace(replace(replace(replace(replace(t,
                          '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                          '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t
                 FROM s3),
           c AS (SELECT doc_id, trim(regexp_replace(t, '[ \t\n\r]+', ' ', 'g')) AS extracted FROM d)
         SELECT doc_id, length(extracted) AS n_chars, md5(extracted) AS text_md5
         FROM c ORDER BY doc_id""",
    "q_bpe_merges" ->
      """WITH v AS (SELECT word, count(*) AS word_cnt
                    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
                    WHERE length(word) >= 2 GROUP BY word),
            p AS (SELECT unnest(list_transform(range(1, length(word)),
                                               i -> substr(word, CAST(i AS INT), 2))) AS pair,
                         word_cnt
                  FROM v)
         SELECT pair, CAST(sum(word_cnt) AS BIGINT) AS cnt
         FROM p GROUP BY pair
         ORDER BY cnt DESC, pair LIMIT 50""",
    // the oracle derives format + dims from the GENERATION rule; the
    // engine parses them back out of the payload bytes (PNG IHDR reads,
    // JPEG marker walk) — a hash match gates the whole synthesize→parse
    // round trip plus every curation predicate, for both formats
    "q_image_dhash" -> imageDhashOracleSql,
    "q_audio_meta" -> audioMetaOracleSql,
    "q_pair_curation" ->
      """WITH p AS (
           SELECT doc_id, lang, text,
                  CASE WHEN doc_id % 17 = 0 THEN NULL
                       WHEN doc_id % 13 = 0 THEN 'jpeg'
                       WHEN doc_id % 19 = 0 THEN 'webp'
                       WHEN doc_id % 23 = 0 THEN 'webp'
                       WHEN doc_id % 29 = 0 THEN 'webp'
                       ELSE 'png' END AS format,
                  CAST(64 + doc_id % 1984 AS INT) AS width,
                  CAST(CASE WHEN doc_id % 13 = 0 THEN 64 + (doc_id * 11) % 1984
                            WHEN doc_id % 19 = 0 THEN 64 + (doc_id * 13) % 1984
                            WHEN doc_id % 23 = 0 THEN 64 + (doc_id * 17) % 1984
                            WHEN doc_id % 29 = 0 THEN 64 + (doc_id * 19) % 1984
                            ELSE 64 + (doc_id * 7) % 1984 END AS INT) AS height
           FROM documents)
         SELECT doc_id, lang, format, width, height,
                len(string_split(text, ' ')) AS n_words,
                length(text) AS n_chars
         FROM p
         WHERE format IS NOT NULL
           AND width >= 128 AND height >= 128
           AND width * 3 >= height AND height * 3 >= width
           AND length(text) >= 20
           AND len(string_split(text, ' ')) >= 5
           AND lang IN ('en','es','fr','de')
         ORDER BY doc_id""",
    "q_chunk" ->
      """WITH ks AS (SELECT doc_id, text,
                unnest(range(0, CAST(floor((greatest(length(text),1) - 1) / 150.0) AS BIGINT) + 1)) AS k
             FROM documents)
         SELECT doc_id, k + 1 AS chunk_id, CAST(k*150 + 1 AS BIGINT) AS chunk_start,
                substr(text, CAST(k*150 + 1 AS INT), 200) AS chunk
         FROM ks ORDER BY doc_id, chunk_id""",
    "q_seq_pack" ->
      raw"""WITH t AS (SELECT doc_id, lang, doc_id % 8 AS shard,
                   len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens
              FROM documents),
           c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id) AS cum
                 FROM t)
         SELECT doc_id, lang, shard, CAST(n_tokens AS INT) AS n_tokens,
                CAST(floor((cum - n_tokens) / 256.0) AS BIGINT) AS seq_id
         FROM c ORDER BY doc_id""",
    "q_text_stats" ->
      """SELECT doc_id, length(text) AS n_chars,
                len(string_split(text, ' ')) AS n_words,
                len(list_distinct(string_split(text, ' '))) AS n_distinct_words
         FROM documents ORDER BY doc_id""",
    "q_token_count" ->
      """SELECT doc_id, len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens
         FROM documents ORDER BY doc_id""",
    "q_ngram_cardinality" ->
      """SELECT doc_id,
                CASE WHEN length(text) < 3 THEN 0
                     ELSE len(list_distinct(list_transform(range(1, length(text) - 1),
                                                           i -> substr(text, i, 3)))) END AS n_3grams
         FROM documents ORDER BY doc_id""",
    "q_quality_score" ->
      """SELECT doc_id,
                CAST(floor(len(list_filter(string_split(text, ' '),
                                           x -> x IN ('the','a','of','and','to'))) * 10000
                           / len(string_split(text, ' '))) AS BIGINT) AS stopword_bp,
                len(string_split(text, ' ')) AS n_words
         FROM documents ORDER BY doc_id""",
    "q_top_words" ->
      """SELECT word, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         GROUP BY word ORDER BY cnt DESC, word LIMIT 20""",
    // the sketch's survivor set re-counted exactly == plain exact counting
    // above the MG guarantee bound (cnt·(k+1) > n, k = 40)
    "q_heavy_hitters_sketch" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         SELECT word, count(*) AS cnt
         FROM w GROUP BY word
         HAVING count(*) * 41 > (SELECT count(*) FROM w)
         ORDER BY cnt DESC, word""",
    "q_scrub_pii" ->
      """SELECT doc_id,
                regexp_replace(
                  regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS scrubbed
         FROM documents ORDER BY doc_id""",
    "q_curation" ->
      """WITH fp AS (SELECT doc_id, lang, text,
                            md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
                     FROM documents),
            keep AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f)
         SELECT d.doc_id, d.lang, len(string_split(d.text, ' ')) AS n_words
         FROM fp d JOIN keep k ON d.doc_id = k.doc_id
         WHERE length(d.text) BETWEEN 20 AND 100000
           AND floor(len(list_filter(string_split(d.text, ' '),
                                     x -> x IN ('the','a','of','and','to'))) * 10000
                     / len(string_split(d.text, ' '))) >= 200
           AND d.lang IN ('en','es','fr','de')
         ORDER BY d.doc_id""",
    // entropy fold mirrors Spark exactly: distinct chars SORTED, then
    // sum(p*ln p) in that order (list_reduce's first-element seed equals
    // aggregate's 0.0+x seed bit-for-bit)
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
                           string_split(text, '') AS cs,
                           CAST(length(text) AS DOUBLE) AS n
                    FROM documents)
         SELECT doc_id,
                CAST(floor((len(w) - len(list_distinct(w))) * 10000 / len(w)) AS BIGINT) AS repetition_bp,
                CAST(CAST(round(
                  CASE WHEN n = 0 THEN 0.0 ELSE
                    -list_reduce(list_transform(list_sort(list_distinct(cs)),
                       c -> (CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / n)
                            * ln(CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / n)),
                       (a,b) -> a + b)
                  END, 6) AS DECIMAL(18,6)) AS DOUBLE) AS char_entropy
         FROM t ORDER BY doc_id""",
    "q_lang_id" ->
      """WITH scored AS (
           SELECT doc_id, lang,
                  len(list_filter(string_split(text,' '), x -> x IN ('the','and','of'))) AS s_en,
                  len(list_filter(string_split(text,' '), x -> x IN ('el','la','de')))  AS s_es,
                  len(list_filter(string_split(text,' '), x -> x IN ('le','la','et')))  AS s_fr,
                  len(list_filter(string_split(text,' '), x -> x IN ('der','die','und'))) AS s_de
           FROM documents)
         SELECT doc_id, lang,
                CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                     WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                     WHEN s_fr >= s_de THEN 'fr'
                     ELSE 'de' END AS lang_guess
         FROM scored ORDER BY doc_id""",
    "q_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
         FROM documents ORDER BY doc_id""",
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keep_doc_id""",
    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS payload_md5
         FROM documents ORDER BY doc_id""",
    // DuckDB 1.0 has no BLOB substring, so the oracle slices the VARCHAR —
    // equivalent to Spark's byte-based frames because the corpus is pure
    // ASCII at every tier (octet_length == length for all docs, checked);
    // a non-ASCII doc would hash-mismatch and surface here, not hide.
    "q_frame_slices" ->
      """WITH f AS (SELECT doc_id, text,
                           unnest(range(1, CAST(greatest(floor((length(text) - 16) / 8) + 1, 0)
                                                AS BIGINT) + 1)) AS frame_idx
                    FROM documents)
         SELECT doc_id, frame_idx,
                md5(substring(text, CAST((frame_idx - 1) * 8 + 1 AS BIGINT), 16)) AS frame_md5
         FROM f ORDER BY doc_id, frame_idx""",
  )
}
