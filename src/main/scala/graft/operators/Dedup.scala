package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines (BASELINE.json north
  * star): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB framing):
  *   - signature computation (MinHash, SimHash) is **map-only**: per-row
  *     array expressions over the shingle set, no explode, no shuffle;
  *   - candidate generation shuffles only on LSH band keys (small keys, high
  *     selectivity), never on raw text;
  *   - verification (exact Jaccard) runs only on candidate pairs — the
  *     classic shingle→minhash→band→bucket-join pipeline;
  *   - exact dedup groups on a 128-bit fingerprint, not the full document,
  *     so the shuffle carries 16 bytes + ids per row.
  */
object Dedup {

  private val Prime: Long = 2147483647L // 2^31 - 1 (Mersenne)

  /** Default signature length / band count (published contract, used by the
    * declared query surface to size its flattened output columns). */
  val defaultNumHashes: Int = 16
  val defaultNumBands: Int = 4

  /** Deterministic (a, b) parameters for the k permutation hashes. */
  private def perms(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((1 + rnd.nextInt(Int.MaxValue - 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Exact dedup on explicit key columns (hash-groupBy). */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Exact dedup by normalized-text fingerprint: survives whitespace and
    * punctuation jitter, shuffles 16-byte keys instead of documents.
    *
    * `keepBy`: columns choosing WHICH duplicate survives (e.g. lowest
    * doc_id) — with it the output is fully deterministic; without it the
    * survivor falls back to monotonically_increasing_id order (deterministic
    * row *count*, partitioning-dependent survivor identity — the same
    * contract as `dropDuplicates`). */
  def exactByFingerprint(df: DataFrame, textCol: String,
                         keepBy: Seq[String] = Seq.empty): DataFrame = {
    val ordered = df
      .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
      .withColumn("__tie", monotonically_increasing_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__fp")
      .orderBy((keepBy.map(col) :+ col("__tie")): _*)
    ordered
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__tie", "__rn")
  }

  /** Per-document MinHash signature (k permutation-mins over word-shingle
    * hashes) — one array column, computed entirely row-local. */
  def withMinhashSignature(df: DataFrame, textCol: String,
                           k: Int = 16, shingleN: Int = 3): DataFrame = {
    val hashes = transform(TextFunctions.wordShingles(col(textCol), shingleN),
      t => pmod(xxhash64(t), lit(Prime)))
    val sig = array(perms(k).map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(Prime))))
    }: _*)
    df.withColumn("minhash_sig", sig)
  }

  /** LSH band keys: k-length signature split into `bands` bands of k/bands
    * rows each; docs sharing any band key are candidate near-duplicates. */
  def withBandKeys(df: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    val r = k / bands
    val bandCols = (0 until bands).map { i =>
      xxhash64(concat_ws(",", slice(col("minhash_sig"), i * r + 1, r)), lit(i))
    }
    df.withColumn("band_keys", array(bandCols: _*))
  }

  /** Full MinHash-LSH near-duplicate pair detection:
    * shingle → minhash → band → bucket-join → exact-Jaccard verify.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold. */
  def minhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                            threshold: Double = 0.7, k: Int = 16,
                            bands: Int = 4, shingleN: Int = 3): DataFrame = {
    // Candidate stage carries ONLY (band, id): the band-key shuffle and the
    // pair-dedup never touch shingle arrays, so at corpus scale the shuffle
    // payload is ids × bands, not documents × bands.
    val sigs = withBandKeys(withMinhashSignature(df, textCol, k, shingleN), k, bands)
      .select(col(idCol).as("id"), col("band_keys"))
    val exploded = sigs.select(col("id"), explode(col("band_keys")).as("band"))
    val a = exploded.select(col("band"), col("id").as("id_a"))
    val b = exploded.select(col("band"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // a pair may collide in several bands; dedup on 16-byte keys
    // Verification stage: join the (rare) candidate pairs back to the corpus
    // once per side for the exact-Jaccard check. Shingle arrays are sorted
    // once per document so each pair verifies with an allocation-free merge.
    val shingles = df.select(col(idCol).as("id"),
      array_sort(TextFunctions.wordShingles(col(textCol), shingleN)).as("shingles"))
    candidates
      .join(shingles.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(shingles.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", TextFunctions.sortedJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Engine-portable MinHash: the xxhash64-based signature above is fastest,
    * but no other engine can reproduce it. This variant hashes each shingle
    * with a plain polynomial char fold — `h = (h*31 + codepoint) mod p` —
    * so the whole signature is expressible in ANSI-ish SQL and the DuckDB
    * oracle checks it value-for-value (see `q_minhash_arith`). Same
    * map-only shape: per-row array expressions, no shuffle.
    *
    * Published permutation constants (prime pairs), part of the contract. */
  val arithPerms: Seq[(Long, Long)] = Seq(
    (1299721L, 7L), (15485863L, 11L), (32452843L, 13L), (49979687L, 17L),
    (67867967L, 19L), (86028121L, 23L), (104395301L, 29L), (122949823L, 31L))

  /** Polynomial hash of a string column: fold code points, (h*31 + code)
    * mod p. Starts at 0, so engines whose fold seeds with the first
    * element agree (0*31 + c1 = c1). Compiled ([[graft.expr.PolyHash]]) —
    * value-identical to the original HOF spelling `aggregate(split(s, ""),
    * 0L, (h, c) => pmod(h*31 + ascii(c), p))`, which allocated a
    * per-character array and paid two interpreted lambdas per character
    * (PolyHashSpec pins the equality on the real corpus). */
  def polyHash(s: Column): Column = graft.expr.PolyHash.poly_hash(s)

  /** One column per permutation: min over shingle poly-hashes. The whole
    * signature comes from TWO compiled passes — [[graft.expr.ShingleHashes]]
    * folds the per-position shingle polyHashes straight off the text (no
    * split/sequence/slice/concat_ws/array_distinct HOF machinery; min is
    * duplicate-insensitive, so the skipped string-level distinct cannot
    * change any signature) and [[graft.expr.MinhashSigs]] folds those
    * hashes into the 8 running minima. The former spelling (regex split +
    * interpreted `transform` building a string per shingle, then the
    * array_distinct hash set, then the hash fold) allocated ~5 objects and
    * paid 2 lambda dispatches per shingle; it dominated the forced
    * map-only rows (q_minhash_arith, q_band_dedup) and q_delta_dedup's
    * signature pass. Values are pinned identical by MinhashSigsSpec and
    * ShingleHashesSpec (r14). */
  def arithMinhashColumns(textCol: Column, shingleN: Int = 3): Seq[Column] = {
    val sigs = graft.expr.MinhashSigs
      .minhash_sigs(graft.expr.ShingleHashes.shingle_hashes(textCol, shingleN))
    arithPerms.indices.map(i => element_at(sigs, i + 1).as(s"sig_$i"))
  }

  /** The pre-r14 HOF spelling of [[arithMinhashColumns]], kept as the
    * value-identity pin for ShingleHashesSpec (and as executable
    * documentation of the contract the compiled pass must honor). */
  private[graft] def arithMinhashColumnsHof(textCol: Column,
                                            shingleN: Int = 3): Seq[Column] = {
    val sigs = graft.expr.MinhashSigs
      .minhash_sigs(TextFunctions.wordShingles(textCol, shingleN))
    arithPerms.indices.map(i => element_at(sigs, i + 1).as(s"sig_$i"))
  }

  /** 64-bit SimHash over word hashes — row-local (array fold, no shuffle).
    * Near-duplicates are pairs within small Hamming distance. Tokens are NOT
    * deduplicated: term frequency is the simhash weight (on low-entropy
    * corpora the distinct word *set* collides across thousands of unrelated
    * docs; the multiset discriminates). */
  def simhash64(textCol: Column): Column = {
    val hashes = transform(split(textCol, " "), t => xxhash64(t))
    val zeros = transform(sequence(lit(0), lit(63)), _ => lit(0L))
    val sums = aggregate(hashes, zeros, (acc, h) =>
      zip_with(acc, sequence(lit(0), lit(63)), (a, bit) =>
        a + when(call_function("shiftright", h, bit).bitwiseAND(lit(1L)) === 1, 1L)
          .otherwise(-1L)))
    aggregate(
      zip_with(sums, sequence(lit(0), lit(63)), (s, bit) =>
        when(s > 0, call_function("shiftleft", lit(1L), bit)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Engine-portable 32-bit SimHash (the arithmetic-hash sibling of
    * [[arithMinhashColumns]]): word hashes via [[polyHash]], frequency-
    * weighted bit sums, sign → bit — `q_simhash_arith` checks it
    * value-for-value in DuckDB. Compiled one-pass [[graft.expr.Simhash32]]
    * (r14): the HOF spelling below paid a fresh 32-element `zip_with`
    * array plus 32 interpreted `when`/shift steps PER WORD; Simhash32Spec
    * pins value equality against it on the real corpus. The xxhash64
    * 64-bit [[simhash64]] stays as the non-portable fast path. */
  def arithSimhash32(textCol: Column): Column =
    graft.expr.Simhash32.simhash32(textCol)

  /** The pre-r14 HOF spelling of [[arithSimhash32]], kept as the
    * value-identity pin for Simhash32Spec. */
  private[graft] def arithSimhash32Hof(textCol: Column): Column = {
    val bits = 32
    val hashes = transform(split(textCol, " "), polyHash(_))
    val zeros = transform(sequence(lit(0), lit(bits - 1)), _ => lit(0L))
    val sums = aggregate(hashes, zeros, (acc, h) =>
      zip_with(acc, sequence(lit(0), lit(bits - 1)), (a, bit) =>
        a + when(call_function("shiftright", h, bit).bitwiseAND(lit(1L)) === 1, 1L)
          .otherwise(-1L)))
    aggregate(
      zip_with(sums, sequence(lit(0), lit(bits - 1)), (s, bit) =>
        when(s > 0, call_function("shiftleft", lit(1L), bit)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs, blocked by the fingerprint's high bytes
    * (cheap LSH analogue: near-identical fingerprints share the prefix;
    * maxHamming ≤ 8 of 64 bits makes a 16-bit-prefix block miss unlikely
    * for true near-dups while slashing the pair space). */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                            maxHamming: Int = 8): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
      .withColumn("block", call_function("shiftright", col("sig"), lit(48)))
    val a = withSig.select(col("block"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = withSig.select(col("block"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Pairwise n-gram (word-set) Jaccard within blocks — cost-based
    * candidate generation ([[PairCandidates]]): while the largest block
    * stays under `autoBlockBound`, per-block all-pairs is the cheapest
    * plan and its pair count is BOUNDED (≤ bound²/2 per block, corpus-
    * size-independent); the moment a block outgrows the bound — the
    * single-language boilerplate-heavy case where block² turns quadratic
    * — candidates come from the lossless PPJoin-style rare-token prefix
    * filter instead, whose candidate count grows ~linearly with block
    * size. Both generators are supersets of the true pair set, so the
    * result is identical either way.
    *
    * Verification, two cheap prunes before the exact merge:
    *   - `J(A,B) ≤ min(|A|,|B|) / max(|A|,|B|)` → a length-ratio prefilter,
    *     spelled as the DIVISION (not `least ≥ t·greatest`): when the
    *     smaller set is contained in the larger, J = min/max computed by
    *     this exact float op, so a boundary pair (J == t) the Jaccard
    *     filter keeps can never be dropped here by a rounding mismatch;
    *   - surviving pairs are scored by [[TextFunctions.sortedJaccard]]: the
    *     word set is sorted ONCE per document, so each candidate costs a
    *     single allocation-free merge scan instead of a hash-set union.
    *
    * Exact-duplicate word SETS collapse to their minimum-id representative
    * before either candidate path (the [[Similarity.collapseExactDuplicates]]
    * discipline) — COST-GATED (VERDICT r8 #1) behind the measured volume
    * model ([[PairCandidates.blockedStatsFor]]): boilerplate families — the
    * dominant redundancy in crawled corpora — would otherwise pay clone²
    * through the candidate stage, but at volume ratio ≈ 1 the collapse's
    * membership joins buy nothing and the direct path wins. The pair list
    * re-expands through the membership map afterward, which is
    * output-invariant: candidates are lossless supersets on both paths,
    * every cross-group score is computed from the identical arrays, and
    * within-group pairs reproduce the identical self-score expression
    * (sortedJaccard(w, w), behind the same n/n length prefilter that
    * excludes empty word sets on both paths). Spec-pinned: the
    * naive-vs-filtered equality fixtures plant exact duplicate texts;
    * DedupSpec additionally pins collapsed ≡ direct.
    *
    * ONE tokenization pass, ONE probe pass (VERDICT r9 #2, measured across
    * r8–r10 at the 1000× cipher tier): tokenize + sort + content-key the
    * corpus exactly once into a materialized (id, block, w, k) projection
    * — every downstream consumer (the skeleton group-agg, the membership
    * join, the pair stage) reads that snapshot, because a tokenize+md5
    * pass at 5 M docs costs hundreds of seconds and paying it per consumer
    * is the dominant regression mode at this tier. The per-(block, k)
    * group SKELETON built from it then serves (a) the gate statistics,
    * (b) both routes' largest-block strategy probes — no separate
    * maxBlockSize jobs — and (c) on the collapse route, the collapse's own
    * group table, so the grouping r9 computed twice (probe + collapse) is
    * computed once (SCALING.md r10 records the tier A/B). EAGER at
    * construction (see [[PairCandidates.blockedStatsFor]]'s documented
    * contract).
    *
    * Collapse keys are md5(block, w) content hashes, not the word arrays
    * themselves, so the group agg and the membership join shuffle scalars
    * — word arrays cross the wire once, inside the materialized projection
    * and the skeleton's rep rows (the module's
    * shuffles-never-carry-documents discipline). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockExpr: Column, threshold: Double,
                   autoBlockBound: Int = 1024): DataFrame = {
    val full = graft.util.Snapshots.snap(
      df.select(col(idCol).as("id"), blockExpr.as("block"),
          array_sort(TextFunctions.words(col(textCol))).as("w"))
        .withColumn("k", jaccardContentKey))
    def buildSkeleton() = graft.util.Snapshots.snap(
      full.groupBy("block", "k").agg(count(lit(1)).as("g"),
        min(col("id")).as("rep_id"), first(col("w")).as("w")))
    val (stats, skel) =
      PairCandidates.blockedStatsFor(full.select("block", "k"), buildSkeleton _)
    if (stats.collapse)
      jaccardPairsCollapsedFrom(full, skel.getOrElse(buildSkeleton()),
        threshold, autoBlockBound, Some(stats.maxBlockReps))
    else
      // the projection is already materialized — call the score stage
      // straight (jaccardPairsDirect's own snap logic exists for callers
      // handing it a LAZY projection, e.g. the spec compat path)
      jaccardScore(full.select("id", "block", "w").withColumn("n", size(col("w"))),
        threshold, autoBlockBound, Some(stats.maxBlockRows))
  }

  /** 16-byte content key of a (block, w) row — the collapse group identity.
    * The PROBE above keys on a serialization-free xxhash64 of the same
    * columns instead ([[Similarity.probeKey]] rationale): a distinct-ratio
    * estimate tolerates 64-bit collisions, the collapse grouping does not. */
  private def jaccardContentKey: Column = md5(to_json(struct(col("block"), col("w"))))

  /** The ≥-threshold scoring stage shared by both strategies, over
    * (id, block, w, n) rows: cost-based candidate generation (bounded
    * all-pairs vs PPJoin prefix filter), length-ratio prefilter, exact
    * sorted-merge Jaccard.
    *
    * Blocked path: ONE self-join carrying the word arrays — no join-back;
    * prefix path: ids-only candidate shuffle, arrays joined back once per
    * side (at scale the candidate stage must never shuffle documents). */
  private def jaccardScore(prepared: DataFrame, threshold: Double,
                           autoBlockBound: Int,
                           maxBlock: Option[Long] = None): DataFrame = {
    val mb = maxBlock.getOrElse(
      PairCandidates.maxBlockSize(prepared.select("id", "block", "w")))
    val paired =
      if (mb <= autoBlockBound) {
        val a = prepared.select(col("block"), col("id").as("id_a"), col("w").as("w_a"), col("n").as("n_a"))
        val b = prepared.select(col("block"), col("id").as("id_b"), col("w").as("w_b"), col("n").as("n_b"))
        a.join(b, Seq("block")).filter(col("id_a") < col("id_b"))
      } else {
        PairCandidates.jaccardPrefixCandidates(prepared.select("id", "block", "w"), threshold)
          .join(prepared.select(col("id").as("id_a"), col("w").as("w_a"), col("n").as("n_a")), Seq("id_a"))
          .join(prepared.select(col("id").as("id_b"), col("w").as("w_b"), col("n").as("n_b")), Seq("id_b"))
      }
    paired
      .filter(least(col("n_a"), col("n_b")).cast("double") / greatest(col("n_a"), col("n_b")) >= lit(threshold))
      .withColumn("jaccard", TextFunctions.sortedJaccard(col("w_a"), col("w_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Direct formulation: every (id, block, w) row feeds the candidate stage
    * itself — the right plan when the collapse can't cut candidate volume.
    * With the largest-block stat precomputed (the skeleton pass), the
    * bounded all-pairs route is ONE action over the lazy projection — the
    * self-join re-tokenizes twice inside a single job, cheaper than a
    * corpus materialization nothing else reads (VERDICT r9 #2) — while the
    * multi-action prefix route (rarity-order collect + candidate stage +
    * two join-backs) snapshots the projection first, keeping the measured
    * one-tokenization-pass discipline (100× cipher A/B: 284 s re-tokenizing
    * per consumer vs 110 s materialized). */
  private[operators] def jaccardPairsDirect(prepared0: DataFrame, threshold: Double,
                                            autoBlockBound: Int,
                                            maxBlock: Option[Long] = None): DataFrame = {
    val mb = maxBlock.getOrElse(
      PairCandidates.maxBlockSize(prepared0.select("id", "block", "w")))
    val base =
      if (mb <= autoBlockBound) prepared0
      else graft.util.Snapshots.snap(prepared0)
    jaccardScore(base.withColumn("n", size(col("w"))), threshold,
      autoBlockBound, Some(mb))
  }

  /** Compatibility entry for specs/probes: build the skeleton from a
    * prepared (id, block, w) projection, then run the collapse core. */
  private[operators] def jaccardPairsCollapsed(prepared0: DataFrame, threshold: Double,
                                               autoBlockBound: Int): DataFrame = {
    val withK = prepared0.withColumn("k", jaccardContentKey)
    val skeleton = graft.util.Snapshots.snap(
      withK.groupBy("block", "k").agg(count(lit(1)).as("g"),
        min(col("id")).as("rep_id"), first(col("w")).as("w")))
    jaccardPairsCollapsedFrom(withK, skeleton, threshold, autoBlockBound, None)
  }

  /** The collapse route's three products, shared by the pair-expanding and
    * edge-emitting consumers: the (id, rep_id) membership map, the
    * rep-level ≥-threshold pairs, and the per-group self-score frame
    * (rep_id, jaccard) — present exactly for the groups whose clones the
    * uncollapsed stage would have paired with each other. */
  private final case class CollapsedStage(members: DataFrame,
                                          repPairs: DataFrame,
                                          selfJ: DataFrame)

  /** Collapse core over the materialized per-(block, k) SKELETON (count,
    * min-id rep, rep word array — every (block, w) in a group is identical,
    * so first() is deterministic in VALUE even though row order is not):
    * pair the reps; consumers expand through the membership map
    * ([[jaccardPairsCollapsedFrom]]) or attach star edges
    * ([[jaccardNearDupEdges]]). The skeleton is the one materialization on
    * this route — it is the group table, the membership join's build side,
    * and the source of the rep projection, so the corpus itself is scanned
    * exactly twice (once into the skeleton, once for the membership ids). */
  private def jaccardCollapsedStage(withK: DataFrame, skeleton: DataFrame,
                                    threshold: Double, autoBlockBound: Int,
                                    maxReps: Option[Long]): CollapsedStage = {
    val members = withK.select(col("id"), col("k"))
      .join(skeleton.select(col("k"), col("rep_id")), Seq("k"))
      .select(col("id"), col("rep_id"))
    val prepared = skeleton.select(col("rep_id").as("id"), col("block"), col("w"))
      .withColumn("n", size(col("w")))
    val repPairs = jaccardScore(prepared, threshold, autoBlockBound, maxReps)
    // clone pairs score sortedJaccard(w, w) — the same expression an
    // uncollapsed in-block pair of identical arrays evaluates — behind the
    // same n/n prefilter (empty sets: NaN, dropped)
    val selfJ = prepared
      .filter(col("n").cast("double") / col("n") >= lit(threshold))
      .withColumn("jaccard", TextFunctions.sortedJaccard(col("w"), col("w")))
      .filter(col("jaccard") >= threshold)
      .select(col("id").as("rep_id"), col("jaccard"))
    CollapsedStage(members, repPairs, selfJ)
  }

  /** Full pair expansion of the collapse route (see
    * [[jaccardCollapsedStage]]). */
  private def jaccardPairsCollapsedFrom(withK: DataFrame, skeleton: DataFrame,
                                        threshold: Double, autoBlockBound: Int,
                                        maxReps: Option[Long]): DataFrame = {
    val st = jaccardCollapsedStage(withK, skeleton, threshold, autoBlockBound, maxReps)
    // cross-group expansion (member ids interleave across groups → the
    // orientation is re-normalized per expanded pair)
    val cross = st.repPairs
      .join(st.members.select(col("rep_id").as("id_a"), col("id").as("xa")), Seq("id_a"))
      .join(st.members.select(col("rep_id").as("id_b"), col("id").as("xb")), Seq("id_b"))
      .select(least(col("xa"), col("xb")).as("id_a"),
        greatest(col("xa"), col("xb")).as("id_b"), col("jaccard"))
    val within = st.selfJ.withColumnRenamed("rep_id", "r")
      .join(st.members.select(col("rep_id").as("r"), col("id").as("xa")), Seq("r"))
      .join(st.members.select(col("rep_id").as("r"), col("id").as("xb")), Seq("r"))
      .filter(col("xa") < col("xb"))
      .select(col("xa").as("id_a"), col("xb").as("id_b"), col("jaccard"))
    cross.unionByName(within)
  }

  /** Near-duplicate graph EDGES for transitive closures ([[Components]]),
    * WITHOUT expanding clone cliques — the word-set analogue of
    * [[Similarity.cosineNearDupEdges]]: rep-level ≥-threshold pairs plus
    * one (rep, member) star edge per non-rep clone. Connectivity of this
    * graph equals the full [[jaccardPairs]] graph's — a clone reaches
    * everything its rep reaches through its star edge, and the star edge
    * exists exactly when the uncollapsed stage would have paired the
    * clones (the selfJ frame: sortedJaccard(w, w) ≥ threshold behind the
    * n/n prefilter; an empty-word-set group passes neither, emits no rep
    * pairs either, and so correctly stays all-singletons on both
    * formulations). A clone-clique of size g costs g−1 edges instead of
    * g²/2 expanded pairs — at the clone-heavy 100× tier the expanded
    * formulation materializes a multi-GiB-per-partition edge snapshot
    * inside [[Components]] and OOMs a 64 g driver; this one closes the
    * same components over an edge set linear in corpus size.
    *
    * Cost-gated like [[jaccardPairs]]: at volume ratio ≈ 1 the direct pair
    * list IS the edge list (star edges degenerate to nothing), so the gate
    * routes there and skips the collapse machinery. */
  def jaccardNearDupEdges(df: DataFrame, idCol: String, textCol: String,
                          blockExpr: Column, threshold: Double,
                          autoBlockBound: Int = 1024): DataFrame = {
    val full = graft.util.Snapshots.snap(
      df.select(col(idCol).as("id"), blockExpr.as("block"),
          array_sort(TextFunctions.words(col(textCol))).as("w"))
        .withColumn("k", jaccardContentKey))
    def buildSkeleton() = graft.util.Snapshots.snap(
      full.groupBy("block", "k").agg(count(lit(1)).as("g"),
        min(col("id")).as("rep_id"), first(col("w")).as("w")))
    val (stats, skel) =
      PairCandidates.blockedStatsFor(full.select("block", "k"), buildSkeleton _)
    if (stats.collapse)
      edgesFromStage(jaccardCollapsedStage(full, skel.getOrElse(buildSkeleton()),
        threshold, autoBlockBound, Some(stats.maxBlockReps)))
    else
      jaccardScore(full.select("id", "block", "w").withColumn("n", size(col("w"))),
        threshold, autoBlockBound, Some(stats.maxBlockRows))
        .select("id_a", "id_b")
  }

  /** Rep pairs + (rep, member) star edges of a collapse stage. */
  private def edgesFromStage(st: CollapsedStage): DataFrame = {
    val star = st.members.filter(col("id") =!= col("rep_id"))
      .join(st.selfJ.select("rep_id"), Seq("rep_id"))
      .select(col("rep_id").as("id_a"), col("id").as("id_b"))
    st.repPairs.select(col("id_a"), col("id_b")).unionByName(star)
  }

  /** Compatibility entry for specs (the fixture-scale twin of
    * [[jaccardNearDupEdges]]'s collapse branch, which the public
    * dispatch's volume floor routes away from on small inputs): build the
    * skeleton from a prepared (id, block, w) projection, then emit the
    * star-edge formulation unconditionally. */
  private[operators] def jaccardNearDupEdgesCollapsed(
      prepared0: DataFrame, threshold: Double, autoBlockBound: Int): DataFrame = {
    val withK = prepared0.withColumn("k", jaccardContentKey)
    val skeleton = graft.util.Snapshots.snap(
      withK.groupBy("block", "k").agg(count(lit(1)).as("g"),
        min(col("id")).as("rep_id"), first(col("w")).as("w")))
    edgesFromStage(jaccardCollapsedStage(withK, skeleton, threshold, autoBlockBound, None))
  }
}
