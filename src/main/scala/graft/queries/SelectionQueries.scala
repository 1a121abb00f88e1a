package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.util.Tables._

/** Training-data SELECTION surface — the step after cleaning/dedup where a
  * corpus is scored, bucketed and split into the actual training mix:
  * retrieval-based relevance scoring (BM25 — the DSIR/data-selection
  * lineage's lexical baseline), exact global quality-quantile binning (the
  * FineWeb/DCLM-style "keep the top deciles at higher rates" recipe), and
  * deterministic train/validation/test split assignment (the audit that
  * the split is a pure function of the document id, not of layout).
  *
  * Float discipline: the ONLY floating-point step anywhere in this module
  * is BM25's one `ln` per distinct query term (model-sized, never
  * corpus-sized), immediately rounded to integer micro-units; everything
  * aggregated afterwards is BIGINT integer arithmetic (`div`, not `/`), so
  * no accumulation order or decimal-scale rule can diverge between engines
  * — the q_lang_mixture / q_ngram_lm discipline.
  */
object SelectionQueries {

  /** BM25 (k1 = 1.2, b = 0.75) relevance of every document against a fixed
    * query-term set, top-50 — the lexical data-selection scorer: given a
    * target domain expressed as query terms, keep the corpus slice that
    * scores highest.
    *
    * Integer-exact scoring: with N docs, T total tokens, per-doc length
    * dl and per-term tf/df,
    *   idf_micro = round(ln((N − df + 0.5)/(df + 0.5) + 1) · 10⁶)
    *   avgdl_milli = (T·1000) div N
    *   contrib = (idf_micro · 2200 · tf)
    *             div (1000·tf + 300 + (900000·dl) div avgdl_milli)
    * which is the BM25 term score scaled by 10⁶ (2200 = 1000·(k1+1);
    * 300 = 1000·k1·(1−b); 900000·dl/avgdl_milli = 1000·k1·b·dl/avgdl).
    * Overflow bound: idf_micro ≤ ~35·10⁶ (ln of any df split), tf ≤ dl, so
    * the widest product is idf_micro·2200·tf ≤ 7.7·10¹⁰·dl — safe through
    * million-token documents.
    *
    * Scale shape: tokenization is map-side; the term stream is filtered to
    * the |Q|-bounded query set BEFORE the only data-sized shuffle (the
    * (doc_id, term) partial-agg — ≤ |Q| rows per doc survive the map side);
    * df/idf/avgdl are |Q|-and-scalar-sized and broadcast back. One more
    * partial-agg rollup per doc, then a global top-50 (TakeOrdered — no
    * full sort). The corpus is scanned once. */
  def bm25(s: SparkSession, d: String): DataFrame = {
    val queryTerms = Seq("spark", "hash", "join", "window", "stream")
    val docs = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).cast("long").as("dl"))
    val totals = docs.agg(count(lit(1)).as("n"), sum("dl").as("t"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("ws")).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = df.crossJoin(broadcast(totals))
      .select(col("term"),
        round(log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
          * 1e6, 0).cast("long").as("idf_micro"))
    val avgdl = totals.select(expr("(t * 1000) div n").as("avgdl_milli"))
    tf.join(broadcast(idf), "term")
      .crossJoin(broadcast(avgdl))
      .withColumn("contrib", expr(
        "(idf_micro * 2200 * tf) div (1000 * tf + 300 + (900000 * dl) div avgdl_milli)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(50)
  }

  /** Exact global quality-DECILE binning with NO global sort: per-decile
    * corpus statistics over an integer quality score (stopword basis
    * points — bounded domain 0..10000). The classic plan for "global
    * ntile" is a single-partition window over the whole corpus — the
    * one-task sort anti-pattern at any scale. This computes the identical
    * answer from (a) a score HISTOGRAM (≤ 10001 rows — bounded by the
    * score DOMAIN, not the data) whose cumulative counts give each score
    * value's global rank offset, and (b) a per-score row_number window
    * (partitioned by score — high-cardinality, data-parallel) for the
    * within-score tie-break by doc_id. global_rank = offset + within-rank,
    * decile = ((global_rank − 1) · 10) div N; the oracle mirrors the same
    * rank with a plain row_number() — equal by construction, proving the
    * distributed plan against the single-sort semantics. */
  def qualityDeciles(s: SparkSession, d: String): DataFrame = {
    val scored = documents(s, d)
      .select(col("doc_id"),
        stopwordRatioBp(col("text")).as("score"),
        wordCount(col("text")).cast("long").as("n_words"))
    val n = scored.agg(count(lit(1)).as("n"))
    // histogram-sized window: ≤ 10001 rows whatever the corpus size
    val hist = scored.groupBy("score").agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum("cnt").over(
          Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("score", "offset")
    val withinW = Window.partitionBy("score").orderBy("doc_id")
    scored
      .withColumn("rw", row_number().over(withinW))
      .join(broadcast(hist), "score")
      .crossJoin(broadcast(n))
      .withColumn("decile", expr("((offset + rw - 1) * 10) div n"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        min("score").as("min_score"), max("score").as("max_score"),
        sum("n_words").as("sum_words"))
      .orderBy("decile")
  }

  /** Deterministic train/validation/test split (98/1/1) as a pure function
    * of doc_id — the affine permutation [[CorpusQueries.langMixture]] and
    * q_sample_stratified use — rolled up per (source, split): the audit
    * table a data-governance pass signs off before training starts (no
    * source may land entirely in one split; token budgets per split are
    * read straight off it). Map-only assignment + one partial-agg over
    * ≤ |sources|·3 groups; re-running on any subset of the corpus assigns
    * every doc identically (no layout, ordering or sampling dependence). */
  def splitAssign(s: SparkSession, d: String): DataFrame = {
    val perm = pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(15485863L) + lit(17L),
      lit(2147483647L)) % 100
    documents(s, d)
      .select(col("source"),
        when(perm < 98, "train").when(perm < 99, "validation")
          .otherwise("test").as("split"),
        wordCount(col("text")).cast("long").as("n_words"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"))
      .orderBy("source", "split")
  }

  /** Source-mixture sampling with epoch upsampling, declared
    * ([[graft.operators.Sampling.mixtureSample]]): resample the corpus to
    * a target LANGUAGE mixture (en 50 %, es 30 %, 6.6 % each remaining
    * lang) under a budget of one corpus-size of rows — the data-recipe
    * step that turns a raw crawl into a training mix. On this corpus the
    * three regimes all fire: en (41 % avail → 50 % target) repeats
    * fractionally (epoch 1 for the selected remainder), es (15 % → 30 %)
    * upsamples through 2 full epochs, the other langs downsample.
    * Deterministic affine-bucket selection, zero data shuffle (one
    * catalog-bounded count agg); output rolled up per (lang, epoch) so
    * the oracle hashes the audit table, not a corpus-sized replica. */
  def mixtureSample(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("lang"))
    val budget = docs.count()
    graft.operators.Sampling
      .mixtureSample(docs, "lang", "doc_id",
        Map("en" -> 500L, "es" -> 300L), defaultPerMille = 66L, budget = budget)
      .groupBy("lang", "epoch")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
      .orderBy("lang", "epoch")
  }

  /** Deterministic global training-order shuffle + sharding AUDIT: every
    * doc gets a pseudo-random POSITION from the MINSTD affine permutation
    * (perm = (id·48271 + 11) mod 2³¹−1 — full-period over the id domain),
    * its shard is perm mod S, and its slot within the shard is the rank of
    * perm there. This is the reproducible "shuffle once, stream shards in
    * order" layout an epoch of training consumes; the audit pins the exact
    * ORDER (not just membership) via a positional checksum
    * Σ pos·(doc_id mod 1000003), so any engine/layout that disagrees on a
    * single slot hashes differently.
    *
    * Scale shape: the permutation is map-only; the within-shard rank is a
    * row_number window partitioned by shard — exactly the S-way shuffle +
    * intra-shard sort a shard WRITER pays, data-parallel across shards (at
    * 100 TB, S is thousands and each task sorts one shard's slice). The
    * audit rollup is S rows. No global sort anywhere. */
  def trainOrder(s: SparkSession, d: String): DataFrame = {
    val perm = pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(48271L) + lit(11L),
      lit(2147483647L))
    val byShard = Window.partitionBy("shard").orderBy(col("perm"), col("doc_id"))
    documents(s, d)
      .select(col("doc_id"), perm.as("perm"))
      .withColumn("shard", col("perm") % 8)
      .withColumn("pos", row_number().over(byShard).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        min("perm").as("first_perm"), max("perm").as("last_perm"),
        sum(expr("pos * (doc_id % 1000003)")).as("order_sum"))
      .orderBy("shard")
  }

  /** Composite C4/Gopher-style RULE filter with per-rule accounting: four
    * integer-exact document rules (too few words; stopword ratio below
    * 3 % — the Gopher "natural language has stopwords" test; word
    * repetition above 60 % — boilerplate; mean word length under 4.5
    * chars — fragment soup), rolled up per source with how many docs each
    * rule rejected and how many survived ALL rules. This is the audit
    * table a filtering pass publishes alongside the kept corpus — per-rule
    * attribution is what lets a recipe owner see WHICH rule is eating a
    * source.
    *
    * Every rule is integer basis-point arithmetic on one map-side pass
    * (shared split(text) subexpression, no UDFs); the only shuffle is the
    * ≤|sources|-group rollup. At 100 TB this is a single corpus scan. */
  def ruleFilter(s: SparkSession, d: String): DataFrame = {
    val w = split(col("text"), " ")
    val n = size(w).cast("long")
    val meanLenDeci = floor(aggregate(w, lit(0), (acc, x) => acc + length(x))
      * lit(10) / size(w)).cast("long")
    documents(s, d)
      .select(col("source"),
        (n < 30).cast("long").as("r_short"),
        (stopwordRatioBp(col("text")) < 300).cast("long").as("r_stop"),
        (repetitionBp(col("text")) > 6000).cast("long").as("r_rep"),
        (meanLenDeci < 45).cast("long").as("r_wordlen"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("r_short").as("n_short"),
        sum("r_stop").as("n_low_stopword"),
        sum("r_rep").as("n_repetitive"),
        sum("r_wordlen").as("n_short_words"),
        sum(when(col("r_short") + col("r_stop") + col("r_rep") + col("r_wordlen") === 0, 1L)
          .otherwise(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): hash every token into
    * B = 4096 buckets, fit two bag-of-hashed-grams unigram models — the
    * TARGET domain (here: lang = 'en' documents, standing in for "looks
    * like the domain we want more of") and the RAW corpus — and score each
    * document by the summed per-token log-likelihood ratio
    * ln p_target(b)/p_raw(b) (add-one smoothing over the B buckets). High
    * weight = target-like; importance RESAMPLING then keeps docs with
    * probability ∝ weight. This is the standard cheap-feature data
    * selection scorer (the hashed-n-gram alternative to training a
    * classifier).
    *
    * Engine portability: the token hash is the [[graft.operators.Dedup
    * .polyHash]] char fold (expressible in DuckDB list_reduce — the
    * q_minhash_arith convention). Float discipline: the ONLY floating
    * step is one ln per OCCUPIED BUCKET (≤ 4096 — model-sized, never
    * corpus-sized), computed as a single ln of a double ratio and floored
    * into integer MICRO-NATS; both smoothed-count products widen to
    * double BEFORE multiplying so no BIGINT overflow exists at any corpus
    * size, and every aggregate after the rounding is BIGINT (the
    * q_ngram_lm discipline).
    *
    * Scale shape: tokenize+hash is map-side; the (doc_id, lang, b) stream
    * is materialized ONCE ([[graft.util.Snapshots.snap]] — eager, same
    * contract as q_ngram_lm's bigram projection) and shared by its two
    * consumers (model fit, scoring). The model is ONE partial-agg shuffle
    * with ≤ B output rows (target and raw counts from the same pass via
    * conditional sums); totals are a 1-row broadcast; scoring joins
    * occurrences to the ≤ 4096-row model (AQE broadcasts it) and rolls up
    * per doc with map-side combine. Two passes over the snapshot, one
    * corpus-sized shuffle (the per-doc rollup). */
  def dsirWeights(s: SparkSession, d: String): DataFrame = {
    val B = 4096L
    val occ0 = documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(filter(split(col("text"), " "), t => length(t) > 0)).as("t"))
      .select(col("doc_id"), col("lang"),
        (graft.operators.Dedup.polyHash(col("t")) % B).as("b"))
    val occ = graft.util.Snapshots.snap(occ0)
    val model = occ.groupBy("b")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
    val tot = model.agg(sum("cr").as("rtot"), sum("ct").as("ttot"))
    val lr = model.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log(((col("ct") + 1).cast("double") * (col("rtot") + B).cast("double"))
          / ((col("cr") + 1).cast("double") * (col("ttot") + B).cast("double"))) * 1e6, 0)
          .cast("long").as("lr_micro"))
    occ.join(lr, Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lr_micro").as("weight_micro"))
      .orderBy("doc_id")
  }

  /** CCNet-style per-language perplexity buckets (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): score every document's fluency under the corpus bigram LM,
    * then split EACH LANGUAGE into exact head / middle / tail terciles by
    * perplexity — the published recipe keeps head+middle and drops (or
    * downweights) the tail, per language, because absolute perplexity is
    * not comparable across languages. Output is the per-(lang, bucket)
    * audit table (doc counts, perplexity range, bigram mass) a curation
    * run signs off before applying the filter.
    *
    * Exactness: the per-doc score is [[CorpusQueries.ngramLmScores]]'s
    * integer micro-nat average, quantized to MILLI-nats (`div 1000`) so
    * the per-lang score domain is bounded (≤ ~40001 values — bounded by
    * the LM's max smoothed nll, not the corpus); terciles then use the
    * grouped form of [[qualityDeciles]]'s no-global-sort plan: a
    * per-(lang, score) HISTOGRAM (≤ |langs|·domain rows) gives each score
    * value's within-lang rank offset, a row_number window partitioned by
    * (lang, score) — fine-grained, data-parallel — breaks ties by doc_id,
    * and bucket = ((offset + rw − 1)·3) div n_lang, identical by
    * construction to a per-lang row_number over (score, doc_id), which is
    * what the oracle runs. Docs with < 2 words have no bigrams and are
    * out of scope on both sides (a length rule catches them first — see
    * [[ruleFilter]]).
    *
    * Scale shape: the LM chain is q_ngram_lm's (one snapshot of the
    * bigram projection, model-sized aggs, model join, per-doc rollup);
    * the lang join prunes documents to (doc_id, lang); the histogram and
    * per-lang counts are bounded broadcasts; the only added corpus-sized
    * ops are one row_number over high-cardinality (lang, score) groups
    * and the final ≤ |langs|·3-group rollup. */
  def pplBuckets(s: SparkSession, d: String): DataFrame =
    // input-size-routed LM (VERDICT r12 #1): small inputs score with the
    // faithful uncapped model this query's oracle gates; past
    // CorpusQueries.LmSmallInputBytes the capped plan feeds the same
    // bucketing machinery (fail-safe direction: capped)
    pplBucketsFrom(s, d, CorpusQueries.ngramLmScoresAuto(s, d))

  /** [[pplBuckets]] over the VOCABULARY-CAPPED LM
    * ([[CorpusQueries.ngramLmScoresCapped]] — top-K words + OOV bucket,
    * the CCNet/KenLM pruning discipline; VERDICT r11 #1): identical
    * bucketing machinery, but the LM state feeding it is bounded by
    * construction, so the decade-tier distinct-vocabulary blowup (36×
    * wall for 10× data on cipher text) cannot occur — adversarial
    * distinct-heavy text collapses into OOV bigrams and the model stays
    * broadcast-sized at any corpus size. */
  def pplBucketsCapped(s: SparkSession, d: String): DataFrame =
    pplBucketsFrom(s, d, CorpusQueries.ngramLmScoresCapped(s, d))

  /** [[pplBuckets]] over the STUPID-BACKOFF LM
    * ([[CorpusQueries.ngramLmScoresBackoff]] — count-pruned bigrams with
    * unigram backoff, Brants et al. 2007; VERDICT r13 #2): the decade-
    * hashable rollup for the backoff path. The per-doc backoff scores are
    * 5 M rows at the decade tier — over the output cap, so their direct
    * evidence was rows-only; this ≤ |langs|·3-row tercile audit is the
    * same machinery q_ppl_buckets_capped uses to stay DuckDB-green at
    * 1000×. State story is the backoff LM's (model tables bounded by the
    * capped vocabulary, pruning shrinks them further) plus the bucketing
    * chain's bounded histogram broadcasts. */
  def pplBucketsBackoff(s: SparkSession, d: String): DataFrame =
    pplBucketsFrom(s, d, CorpusQueries.ngramLmScoresBackoff(s, d))

  private def pplBucketsFrom(s: SparkSession, d: String,
                             scores: DataFrame): DataFrame = {
    // snapshot the scored frame: the histogram and the ranking pass both
    // consume it, and the LM scoring chain downstream of ngramLmScores'
    // own snapshot (model join + per-doc rollup + lang join) would
    // otherwise recompute per reference
    val scored = graft.util.Snapshots.snap(
      scores
        .select(col("doc_id"), col("n_bigrams"),
          expr("avg_micro div 1000").as("ppl_milli"))
        .join(documents(s, d).select("doc_id", "lang"), "doc_id"))
    val hist0 = scored.groupBy("lang", "ppl_milli").agg(count(lit(1)).as("cnt"))
    // per-lang totals from the bounded histogram, not a third corpus pass
    val nLang = hist0.groupBy("lang").agg(sum("cnt").as("n_lang"))
    val hist = hist0
      .withColumn("offset",
        coalesce(sum("cnt").over(
          Window.partitionBy("lang").orderBy("ppl_milli")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("lang", "ppl_milli", "offset")
    val withinW = Window.partitionBy("lang", "ppl_milli").orderBy("doc_id")
    scored
      .withColumn("rw", row_number().over(withinW))
      .join(broadcast(hist), Seq("lang", "ppl_milli"))
      .join(broadcast(nLang), "lang")
      .withColumn("bucket", expr("((offset + rw - 1) * 3) div n_lang"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("ppl_milli").as("min_ppl_milli"),
        max("ppl_milli").as("max_ppl_milli"),
        sum("n_bigrams").as("sum_bigrams"))
      .withColumn("bucket_name",
        when(col("bucket") === 0, "head")
          .when(col("bucket") === 1, "middle").otherwise("tail"))
      .orderBy("lang", "bucket")
  }

  /** Diversity-balanced embedding sampling — the cluster-balanced
    * selection step of embedding-based curation (the SemDeDup/DataComp
    * lineage: after dedup, sample EVENLY across semantic regions so the
    * mix is not dominated by the head cluster). Regions are sign-random-
    * projection buckets (Charikar 2002, SimHash for vectors): R = 6
    * deterministic integer-weight projections give 64 buckets; each
    * bucket gets the same target quota T = (N div 10) div 64 (a 10%
    * budget split evenly), and oversized buckets are downsampled by the
    * shared affine basis-point rule ([[graft.operators.Sampling
    * .mixtureSample]]'s convention) — rank-free, so no per-bucket sort
    * ever happens. Output is the per-bucket audit (population, selected
    * count, selected-id checksum) a curation run reviews before applying
    * the sample.
    *
    * Float discipline: the ONLY float step is the R projection dots —
    * sequential-fold [[graft.expr.SeqDot]] over (float-exact doubles ×
    * small-integer weights), bit-identical cross-engine per the
    * q_cosine_topk precedent; only the SIGN is consumed. Weights are
    * `((a_r·j + b_r) mod 1001) − 500` from the [[graft.operators.Dedup
    * .arithPerms]] constants — integer-exact in both engines.
    *
    * Scale shape: bucket assignment is map-only (R codegen'd dots per
    * row); bucket populations are a 64-group partial-agg broadcast back;
    * selection is a map-side predicate (affine bp threshold); the final
    * rollup has 64 groups. NO corpus-sized shuffle, no window, no sort —
    * the corpus is scanned exactly twice (population pass + selection
    * pass), both scans pruned to (vec_id, embedding). Constructing the
    * frame runs the population pass eagerly (the ≤64 bucket counts are
    * bounded driver state, the ngramLm/decontamBloom convention). */
  def diversitySample(s: SparkSession, d: String): DataFrame = {
    val R = 6
    val M = 2147483647L
    val emb = embeddings(s, d).select(col("vec_id"),
      graft.operators.Similarity.toDouble(col("embedding")).as("ve"))
    val bucket = graft.operators.Dedup.arithPerms.take(R).zipWithIndex
      .map { case ((a, b), r) =>
        val w = transform(sequence(lit(1), size(col("ve"))),
          j => (pmod(lit(a) * j + lit(b), lit(1001L)) - 500L).cast("double"))
        when(graft.operators.Similarity.dot(col("ve"), w) > 0, lit(1L << r))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    val withB = emb.select(col("vec_id"), bucket.as("bucket"))
    // the ≤64 bucket populations are bounded DRIVER state (the centroid/
    // codebook convention): collecting them once gives the quota AND the
    // rebroadcast join side from ONE population pass — the declarative
    // spelling (broadcast(counts) + crossJoin(broadcast(counts.agg)))
    // materialized the bucket-assignment scan once per exchange, three
    // corpus scans x 6 dots/row instead of two
    val countRows = withB.groupBy("bucket").agg(count(lit(1)).as("n_total"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = countRows.map(_._2).sum
    val tB = math.max(n / 10L / 64L, 1L)
    import s.implicits._
    val counts = countRows.toSeq.toDF("bucket", "n_total")
    withB.join(broadcast(counts), "bucket")
      .withColumn("bp",
        pmod(pmod(col("vec_id"), lit(M)) * lit(15485863L) + lit(17L), lit(M)) % 10000L)
      .withColumn("sel", col("bp") * col("n_total") < lit(tB * 10000L))
      .groupBy("bucket", "n_total")
      .agg(sum(col("sel").cast("long")).as("n_selected"),
        sum(when(col("sel"), pmod(col("vec_id"), lit(1000003L))).otherwise(0L))
          .as("sel_checksum"))
      .select(col("bucket"), col("n_total"), col("n_selected"), col("sel_checksum"))
      .orderBy("bucket")
  }

  /** Domain-level curation — the C4/RefinedWeb/FineWeb step the surface
    * lacked: parse the registered host out of each document's URL, drop
    * blocklisted domains, and cap the documents any single domain may
    * contribute (hot-domain caps are how web corpora stop one boilerplate
    * site from dominating the training mix). URLs are synthesized
    * deterministically from doc_id with a REALISTIC domain shape — one
    * mega-site holding ~75% of the corpus plus a ~1000-domain long tail —
    * so the oracle gates the parse round trip, the blocklist, and the cap
    * on both regimes.
    *
    * 100 TB plan shape: a naive `row_number() OVER (PARTITION BY host)`
    * over the full corpus would shuffle everything into window partitions
    * and send 75% of it to the mega-site's single reducer — the canonical
    * skew faceplant. Two defenses here:
    *   1. a catalog-sized count finds the over-cap (hot) hosts —
    *      broadcast; the long tail (under cap by definition of the count)
    *      bypasses the window entirely via a broadcast anti-join — at web
    *      scale that is ~all distinct domains, and none of their rows
    *      enter the rank shuffle;
    *   2. for the hot subset, Spark's own `WindowGroupLimit` rewrite
    *      (the rank-limit pushdown) inserts a PARTIAL per-input-partition
    *      top-cap before the exchange — the same two-level-rank trick a
    *      hand-salted pre-truncate would build (a manual
    *      (host, spark_partition_id) pre-rank was measured to produce one
    *      extra Exchange + Window over this and was deleted) — so the
    *      mega-site's final sort input is ≤ cap·partitions rows, bounded
    *      by the cluster, not the corpus. The spec pins WindowGroupLimit's
    *      presence in the physical plan so a regression (e.g. an
    *      optimizer-disabling config or a non-pushable rank spelling)
    *      fails loudly. */
  def domainCap(s: SparkSession, d: String): DataFrame = {
    val cap = 12
    val host0 = when(pmod(col("doc_id"), lit(16L)) === 0L, lit("spam.biz"))
      .when(pmod(col("doc_id"), lit(16L)) === 8L, lit("ads.example"))
      .when(pmod(col("doc_id"), lit(4L)) =!= 0L, lit("megasite.example"))
      .otherwise(concat(lit("site-"), pmod(col("doc_id"), lit(997L)), lit(".example")))
    val url = concat(lit("https://"), host0, lit("/p/"), col("doc_id"))
    val parsed = documents(s, d)
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        regexp_extract(col("url"), "^https://([^/]+)/", 1).as("host"))
      .filter(!col("host").isInCollection(Seq("spam.biz", "ads.example")))
    val counts = parsed.groupBy("host").agg(count(lit(1)).as("n_docs"))
    val hot = broadcast(counts.filter(col("n_docs") > cap).select("host"))
    val capped = parsed.join(hot, Seq("host"), "left_semi")
      .withColumn("__rk", row_number().over(
        Window.partitionBy("host").orderBy("doc_id")))
      .filter(col("__rk") <= cap)
      .select("doc_id", "host")
    val tail = parsed.join(hot, Seq("host"), "left_anti").select("doc_id", "host")
    capped.unionByName(tail).orderBy("doc_id")
  }

  /** URL canonicalization + dedup — the step upstream of [[domainCap]] in
    * every web-crawl pipeline (CommonCrawl lineage): the same page is
    * crawled under scheme/host case variants, tracking parameters and
    * fragments, and naive exact-URL dedup misses all of them. URLs are
    * synthesized deterministically WITH those variants (upper/lower
    * scheme+host by doc_id parity, interleaved utm_* tracking params, a
    * fragment on every third doc; the path groups by `doc_id div 7` but
    * the RETAINED `page=(doc_id % 3)` parameter splits each 7-doc path
    * group into 2-3 canonical URLs — the group structure is
    * (div 7, % 3), not 7 flat (ADVICE r12 #4); [[urlDedupV2]]'s variant
    * set derives page from the path group so its groups DO collapse
    * whole), and the ENGINE canonicalizes
    * by PARSING the string back: lowercase scheme+host, path kept, query
    * params split and filtered of `utm_*` (order preserved — a HOF filter,
    * no explode), fragment dropped. Survivor = min doc_id per canonical
    * URL. Scale shape: parse + filter are one map-only codegen pass; the
    * only shuffle groups by canonical URL (high-cardinality key, partial
    * agg). */
  def urlDedup(s: SparkSession, d: String): DataFrame = {
    val scheme = when(pmod(col("doc_id"), lit(2L)) === 0L, lit("HTTPS://"))
      .otherwise(lit("https://"))
    val host = when(pmod(col("doc_id"), lit(4L)) < 2L, lit("News.Example.COM"))
      .otherwise(lit("news.example.com"))
    val path = concat(lit("/articles/"), expr("doc_id div 7"))
    val query = concat(
      lit("?utm_source=feed"),
      lit("&page="), pmod(col("doc_id"), lit(3L)),
      lit("&utm_campaign=q"), pmod(col("doc_id"), lit(2L)))
    val frag = when(pmod(col("doc_id"), lit(3L)) === 0L, lit("#section-2"))
      .otherwise(lit(""))
    val url = concat(scheme, host, path, query, frag)
    val parsed = documents(s, d)
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), col("url"),
        lower(regexp_extract(col("url"), "^([A-Za-z]+://[^/?#]+)", 1)).as("sh"),
        regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+([^?#]*)", 1).as("path"),
        regexp_extract(col("url"), "\\?([^#]*)", 1).as("qs"))
      .withColumn("kept_params", expr(
        "filter(split(qs, '&'), p -> p NOT LIKE 'utm_%' AND p != '')"))
      .withColumn("canon_url", concat(col("sh"), col("path"),
        when(size(col("kept_params")) > 0,
          concat(lit("?"), array_join(col("kept_params"), "&")))
          .otherwise(lit(""))))
    parsed
      .groupBy("canon_url")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")
  }

  /** [[urlDedup]] hardened toward the CommonCrawl canonicalization
    * spelling (VERDICT r12 #6) with the three highest-frequency duplicate
    * classes real crawls hit after utm/fragment:
    *
    *   - SORTED query parameters (crawlers see `?a=1&b=2` and
    *     `?b=2&a=1` for the same page) — the kept params are
    *     `array_sort`ed, not order-preserved;
    *   - DEFAULT-PORT strip (`https://h:443/` ≡ `https://h/`,
    *     `http://h:80/` ≡ `http://h/`) — but ONLY default ports: a
    *     synthesized `:8443` variant must survive as its own canonical
    *     URL, pinning that the rule is scheme-aware, not "strip any
    *     port";
    *   - TRAILING-SLASH normalization (`/a/` ≡ `/a`, root `/` kept).
    *
    * URL variants are synthesized to exercise every rule: case-varied
    * scheme+host (parity), `:443`/`:8443`/no port by doc_id mod 5,
    * trailing slash on odd docs, query params in BOTH orders with
    * `page` derived from the PATH group (`(doc_id div 7) mod 3`) so a
    * 7-doc path run collapses except where the kept `:8443` port class
    * honestly splits it. Same scale shape as v1: one map-only
    * parse/normalize pass, one partial-agg shuffle on the
    * high-cardinality canonical key. */
  def urlDedupV2(s: SparkSession, d: String): DataFrame = {
    val scheme = when(pmod(col("doc_id"), lit(2L)) === 0L, lit("HTTPS://"))
      .otherwise(lit("https://"))
    val host = when(pmod(col("doc_id"), lit(4L)) < 2L, lit("News.Example.COM"))
      .otherwise(lit("news.example.com"))
    val port = when(pmod(col("doc_id"), lit(5L)) === 0L, lit(":443"))
      .when(pmod(col("doc_id"), lit(5L)) === 1L, lit(":8443"))
      .otherwise(lit(""))
    val grp = expr("doc_id div 7")
    val pg = pmod(grp, lit(3L))
    val path = concat(lit("/articles/"), grp,
      when(pmod(col("doc_id"), lit(2L)) === 1L, lit("/")).otherwise(lit("")))
    val query = when(pmod(col("doc_id"), lit(2L)) === 0L,
        concat(lit("?page="), pg, lit("&utm_source=feed")))
      .otherwise(concat(lit("?utm_source=feed&page="), pg, lit("&utm_campaign=q")))
    val frag = when(pmod(col("doc_id"), lit(3L)) === 0L, lit("#section-2"))
      .otherwise(lit(""))
    val url = concat(scheme, host, port, path, query, frag)
    val parsed = documents(s, d)
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        lower(regexp_extract(col("url"), "^([A-Za-z]+://[^/?#]+)", 1)).as("sh"),
        regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+([^?#]*)", 1).as("path"),
        regexp_extract(col("url"), "\\?([^#]*)", 1).as("qs"))
      .withColumn("sh_np", regexp_replace(
        regexp_replace(col("sh"), "^(https://[^/:]+):443$", "$1"),
        "^(http://[^/:]+):80$", "$1"))
      .withColumn("path_n",
        when(col("path") === "/", lit("/"))
          .otherwise(regexp_replace(col("path"), "/$", "")))
      .withColumn("kept_params", array_sort(expr(
        "filter(split(qs, '&'), p -> p NOT LIKE 'utm_%' AND p != '')")))
      .withColumn("canon_url", concat(col("sh_np"), col("path_n"),
        when(size(col("kept_params")) > 0,
          concat(lit("?"), array_join(col("kept_params"), "&")))
          .otherwise(lit(""))))
    parsed
      .groupBy("canon_url")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_url_dedup_v2"    -> (urlDedupV2 _),
    "q_domain_cap"      -> (domainCap _),
    "q_url_dedup"       -> (urlDedup _),
    "q_ppl_buckets"     -> (pplBuckets _),
    "q_ppl_buckets_capped" -> (pplBucketsCapped _),
    "q_ppl_buckets_backoff" -> (pplBucketsBackoff _),
    "q_diversity_sample" -> (diversitySample _),
    "q_bm25"            -> (bm25 _),
    "q_quality_deciles" -> (qualityDeciles _),
    "q_split_assign"    -> (splitAssign _),
    "q_mixture_sample"  -> (mixtureSample _),
    "q_train_order"     -> (trainOrder _),
    "q_rule_filter"     -> (ruleFilter _),
    "q_dsir_weights"    -> (dsirWeights _),
  )

  val oracle: Map[String, String] = Map(
    // the oracle is the plain single-window spelling — a hash match proves
    // the skew-bypass + two-level-rank plan is value-identical to it
    "q_domain_cap" ->
      """WITH u AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 16 = 0 THEN 'spam.biz'
                       WHEN doc_id % 16 = 8 THEN 'ads.example'
                       WHEN doc_id % 4 <> 0 THEN 'megasite.example'
                       ELSE 'site-' || (doc_id % 997) || '.example' END AS h
           FROM documents),
         p AS (SELECT doc_id,
                      regexp_extract('https://' || h || '/p/' || doc_id,
                                     '^https://([^/]+)/', 1) AS host
               FROM u),
         f AS (SELECT * FROM p WHERE host NOT IN ('spam.biz', 'ads.example')),
         r AS (SELECT doc_id, host,
                      row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rk
               FROM f)
       SELECT doc_id, host FROM r WHERE rk <= 12 ORDER BY doc_id""",
    // Sign-projection buckets (6 arithPerms integer-weight projections,
    // sequential-fold dots, sign only), equal per-bucket quota
    // T = (N div 10) div 64, affine-bp downsampling, per-bucket audit
    "q_diversity_sample" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
                    FROM embeddings),
         b AS (SELECT vec_id,
                 (CASE WHEN list_reduce(list_transform(range(1, len(ve) + 1),
                        j -> ve[j] * CAST(((1299721 * j + 7) % 1001) - 500 AS DOUBLE)),
                        (a, x) -> a + x) > 0 THEN 1 ELSE 0 END) * 1
               + (CASE WHEN list_reduce(list_transform(range(1, len(ve) + 1),
                        j -> ve[j] * CAST(((15485863 * j + 11) % 1001) - 500 AS DOUBLE)),
                        (a, x) -> a + x) > 0 THEN 1 ELSE 0 END) * 2
               + (CASE WHEN list_reduce(list_transform(range(1, len(ve) + 1),
                        j -> ve[j] * CAST(((32452843 * j + 13) % 1001) - 500 AS DOUBLE)),
                        (a, x) -> a + x) > 0 THEN 1 ELSE 0 END) * 4
               + (CASE WHEN list_reduce(list_transform(range(1, len(ve) + 1),
                        j -> ve[j] * CAST(((49979687 * j + 17) % 1001) - 500 AS DOUBLE)),
                        (a, x) -> a + x) > 0 THEN 1 ELSE 0 END) * 8
               + (CASE WHEN list_reduce(list_transform(range(1, len(ve) + 1),
                        j -> ve[j] * CAST(((67867967 * j + 19) % 1001) - 500 AS DOUBLE)),
                        (a, x) -> a + x) > 0 THEN 1 ELSE 0 END) * 16
               + (CASE WHEN list_reduce(list_transform(range(1, len(ve) + 1),
                        j -> ve[j] * CAST(((86028121 * j + 23) % 1001) - 500 AS DOUBLE)),
                        (a, x) -> a + x) > 0 THEN 1 ELSE 0 END) * 32 AS bucket
               FROM v),
         c AS (SELECT bucket, count(*) AS n_total FROM b GROUP BY bucket),
         t AS (SELECT count(*) AS n FROM b),
         s AS (SELECT b.vec_id, b.bucket, c.n_total,
                      greatest(n // 10 // 64, 1) AS t_b,
                      ((vec_id % 2147483647) * 15485863 + 17) % 2147483647 % 10000 AS bp
               FROM b JOIN c USING (bucket), t)
       SELECT CAST(bucket AS BIGINT) AS bucket, n_total,
              CAST(sum(CASE WHEN bp * n_total < t_b * 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
              CAST(sum(CASE WHEN bp * n_total < t_b * 10000 THEN vec_id % 1000003 ELSE 0 END) AS BIGINT) AS sel_checksum
       FROM s GROUP BY bucket, n_total ORDER BY bucket""",
    // CCNet buckets: the q_ngram_lm CTE chain (same integer micro-nat
    // model), quantized to milli-nats, then a per-lang row_number tercile
    // — the single-sort semantics the engine's histogram plan must equal
    "q_ppl_buckets" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         wf AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 2),
         p0 AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM wf),
         bi AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM p0),
         c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
         c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
         vocab AS (SELECT count(DISTINCT t) AS v
                   FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
         model AS (SELECT w1, w2,
                          CAST(round(-ln((c2 + 1) / CAST(c1 + v AS DOUBLE)) * 1000000)
                               AS BIGINT) AS nll
                   FROM c2 JOIN c1 USING (w1), vocab),
         score AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                          (sum(nll) // count(*)) // 1000 AS ppl_milli
                   FROM bi JOIN model USING (w1, w2) GROUP BY doc_id),
         sl AS (SELECT s.doc_id, s.n_bigrams, s.ppl_milli, d.lang
                FROM score s JOIN documents d USING (doc_id)),
         r AS (SELECT lang, doc_id, ppl_milli, n_bigrams,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY ppl_milli, doc_id) AS rk,
                      count(*) OVER (PARTITION BY lang) AS n_lang
               FROM sl),
         b AS (SELECT lang, ppl_milli, n_bigrams,
                      ((rk - 1) * 3) // n_lang AS bucket FROM r)
       SELECT lang, CAST(bucket AS BIGINT) AS bucket,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(min(ppl_milli) AS BIGINT) AS min_ppl_milli,
              CAST(max(ppl_milli) AS BIGINT) AS max_ppl_milli,
              CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
              CASE WHEN bucket = 0 THEN 'head'
                   WHEN bucket = 1 THEN 'middle' ELSE 'tail' END AS bucket_name
       FROM b GROUP BY lang, bucket ORDER BY lang, bucket""",
    // canonicalization mirror: lower(scheme+host), path, utm_*-filtered
    // query (order preserved), fragment dropped; dedup keeps min doc_id
    "q_url_dedup" ->
      """WITH u AS (
           SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
                  (CASE WHEN doc_id % 4 < 2 THEN 'News.Example.COM' ELSE 'news.example.com' END) ||
                  '/articles/' || (doc_id // 7) ||
                  '?utm_source=feed' || '&page=' || (doc_id % 3) ||
                  '&utm_campaign=q' || (doc_id % 2) ||
                  (CASE WHEN doc_id % 3 = 0 THEN '#section-2' ELSE '' END) AS url
           FROM documents),
         p AS (
           SELECT doc_id,
                  lower(regexp_extract(url, '^([A-Za-z]+://[^/?#]+)', 1)) AS sh,
                  regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
                  regexp_extract(url, '\?([^#]*)', 1) AS qs
           FROM u),
         k AS (
           SELECT doc_id, sh, path,
                  list_filter(string_split(qs, '&'),
                              x -> x NOT LIKE 'utm_%' AND x != '') AS kept
           FROM p),
         c AS (
           SELECT doc_id,
                  sh || path ||
                  (CASE WHEN len(kept) > 0 THEN '?' || list_aggr(kept, 'string_agg', '&')
                        ELSE '' END) AS canon_url
           FROM k)
       SELECT canon_url, CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
              CAST(count(*) AS BIGINT) AS n_copies
       FROM c GROUP BY canon_url ORDER BY keep_doc_id""",
    // v2 mirror: + sorted params, default-port strip (scheme-aware: :8443
    // survives), trailing-slash normalization (root '/' kept)
    "q_url_dedup_v2" ->
      """WITH u AS (
           SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
                  (CASE WHEN doc_id % 4 < 2 THEN 'News.Example.COM' ELSE 'news.example.com' END) ||
                  (CASE WHEN doc_id % 5 = 0 THEN ':443'
                        WHEN doc_id % 5 = 1 THEN ':8443' ELSE '' END) ||
                  '/articles/' || (doc_id // 7) ||
                  (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END) ||
                  (CASE WHEN doc_id % 2 = 0
                        THEN '?page=' || ((doc_id // 7) % 3) || '&utm_source=feed'
                        ELSE '?utm_source=feed&page=' || ((doc_id // 7) % 3) || '&utm_campaign=q' END) ||
                  (CASE WHEN doc_id % 3 = 0 THEN '#section-2' ELSE '' END) AS url
           FROM documents),
         p AS (
           SELECT doc_id,
                  lower(regexp_extract(url, '^([A-Za-z]+://[^/?#]+)', 1)) AS sh,
                  regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
                  regexp_extract(url, '\?([^#]*)', 1) AS qs
           FROM u),
         n AS (
           SELECT doc_id,
                  regexp_replace(regexp_replace(sh, '^(https://[^/:]+):443$', '\1'),
                                 '^(http://[^/:]+):80$', '\1') AS sh_np,
                  CASE WHEN path = '/' THEN '/'
                       ELSE regexp_replace(path, '/$', '') END AS path_n,
                  list_sort(list_filter(string_split(qs, '&'),
                              x -> x NOT LIKE 'utm_%' AND x != '')) AS kept
           FROM p),
         c AS (
           SELECT doc_id,
                  sh_np || path_n ||
                  (CASE WHEN len(kept) > 0 THEN '?' || list_aggr(kept, 'string_agg', '&')
                        ELSE '' END) AS canon_url
           FROM n)
       SELECT canon_url, CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
              CAST(count(*) AS BIGINT) AS n_copies
       FROM c GROUP BY canon_url ORDER BY keep_doc_id""",
    // backoff rollup: q_ngram_lm_backoff's score CTEs (count-pruned model,
    // raw relative frequency, 0.4·cu/N unigram backoff) feeding the
    // q_ppl_buckets_capped bucketing tail verbatim
    "q_ppl_buckets_backoff" ->
      """WITH wc AS (SELECT word, count(*) AS cnt
                     FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
                     WHERE NOT regexp_matches(word, '[\x00-\x1f]')
                     GROUP BY word),
         vocab AS (SELECT word FROM wc ORDER BY cnt DESC, word LIMIT 65536),
         w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         wf AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 2),
         p0 AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM wf),
         bir AS (SELECT doc_id, ws[i] AS r1, ws[i+1] AS r2 FROM p0),
         bi AS (SELECT doc_id,
                       coalesce(va.word, chr(1)) AS w1,
                       coalesce(vb.word, chr(1)) AS w2
                FROM bir LEFT JOIN vocab va ON bir.r1 = va.word
                         LEFT JOIN vocab vb ON bir.r2 = vb.word),
         c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
         c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
         cu AS (SELECT w2, sum(c2) AS cu FROM c2 GROUP BY w2),
         tot AS (SELECT sum(c1) AS n FROM c1),
         m12 AS (SELECT w1, w2,
                        CAST(round(-ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))
                             * 1000000) AS BIGINT) AS nll12
                 FROM c2 JOIN c1 USING (w1) WHERE c2 >= 2),
         m2 AS (SELECT w2,
                       CAST(round(-ln(0.4 * CAST(cu AS DOUBLE) / CAST(n AS DOUBLE))
                            * 1000000) AS BIGINT) AS nll2
                FROM cu, tot),
         score AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                          (sum(coalesce(nll12, nll2)) // count(*)) // 1000 AS ppl_milli
                   FROM bi LEFT JOIN m12 USING (w1, w2) JOIN m2 USING (w2)
                   GROUP BY doc_id),
         sl AS (SELECT s.doc_id, s.n_bigrams, s.ppl_milli, d.lang
                FROM score s JOIN documents d USING (doc_id)),
         r AS (SELECT lang, doc_id, ppl_milli, n_bigrams,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY ppl_milli, doc_id) AS rk,
                      count(*) OVER (PARTITION BY lang) AS n_lang
               FROM sl),
         b AS (SELECT lang, ppl_milli, n_bigrams,
                      ((rk - 1) * 3) // n_lang AS bucket FROM r)
       SELECT lang, CAST(bucket AS BIGINT) AS bucket,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(min(ppl_milli) AS BIGINT) AS min_ppl_milli,
              CAST(max(ppl_milli) AS BIGINT) AS max_ppl_milli,
              CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
              CASE WHEN bucket = 0 THEN 'head'
                   WHEN bucket = 1 THEN 'middle' ELSE 'tail' END AS bucket_name
       FROM b GROUP BY lang, bucket ORDER BY lang, bucket""",
    // capped twin: vocab = top-65536 words (cnt desc, word asc — total
    // order), every other token maps to the chr(1) OOV bucket, smoothing
    // divides by |vocab|+1; the bucketing chain is q_ppl_buckets' verbatim
    "q_ppl_buckets_capped" ->
      """WITH wc AS (SELECT word, count(*) AS cnt
                     FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
                     WHERE NOT regexp_matches(word, '[\x00-\x1f]')
                     GROUP BY word),
         vocab AS (SELECT word FROM wc ORDER BY cnt DESC, word LIMIT 65536),
         vn AS (SELECT CAST(count(*) + 1 AS BIGINT) AS v FROM vocab),
         w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         wf AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 2),
         p0 AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM wf),
         bir AS (SELECT doc_id, ws[i] AS r1, ws[i+1] AS r2 FROM p0),
         bi AS (SELECT doc_id,
                       coalesce(va.word, chr(1)) AS w1,
                       coalesce(vb.word, chr(1)) AS w2
                FROM bir LEFT JOIN vocab va ON bir.r1 = va.word
                         LEFT JOIN vocab vb ON bir.r2 = vb.word),
         c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
         c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
         model AS (SELECT w1, w2,
                          CAST(round(-ln((c2 + 1) / CAST(c1 + v AS DOUBLE)) * 1000000)
                               AS BIGINT) AS nll
                   FROM c2 JOIN c1 USING (w1), vn),
         score AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                          (sum(nll) // count(*)) // 1000 AS ppl_milli
                   FROM bi JOIN model USING (w1, w2) GROUP BY doc_id),
         sl AS (SELECT s.doc_id, s.n_bigrams, s.ppl_milli, d.lang
                FROM score s JOIN documents d USING (doc_id)),
         r AS (SELECT lang, doc_id, ppl_milli, n_bigrams,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY ppl_milli, doc_id) AS rk,
                      count(*) OVER (PARTITION BY lang) AS n_lang
               FROM sl),
         b AS (SELECT lang, ppl_milli, n_bigrams,
                      ((rk - 1) * 3) // n_lang AS bucket FROM r)
       SELECT lang, CAST(bucket AS BIGINT) AS bucket,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(min(ppl_milli) AS BIGINT) AS min_ppl_milli,
              CAST(max(ppl_milli) AS BIGINT) AS max_ppl_milli,
              CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
              CASE WHEN bucket = 0 THEN 'head'
                   WHEN bucket = 1 THEN 'middle' ELSE 'tail' END AS bucket_name
       FROM b GROUP BY lang, bucket ORDER BY lang, bucket""",
    // mixture sampler: per-lang target = budget·w/1000 (integer), full
    // epochs = target // avail, remainder via the shared affine bucket;
    // range(0, n) is empty at n <= 0, dropping unselected rows
    "q_mixture_sample" ->
      """WITH d AS (SELECT doc_id, lang FROM documents),
              st AS (SELECT lang, CAST(count(*) AS BIGINT) AS avail FROM d GROUP BY lang),
              tot AS (SELECT CAST(count(*) AS BIGINT) AS budget FROM d),
              par AS (SELECT lang, avail,
                             (budget * (CASE WHEN lang = 'en' THEN 500
                                             WHEN lang = 'es' THEN 300
                                             ELSE 66 END)) // 1000 AS t
                      FROM st, tot),
              par2 AS (SELECT lang, t // avail AS epochs,
                              ((t % avail) * 10000) // avail AS remrate
                       FROM par),
              sel AS (SELECT doc_id, d.lang,
                             epochs + CASE WHEN (((doc_id % 2147483647) * 15485863 + 17)
                                                 % 2147483647) % 10000 < remrate
                                           THEN 1 ELSE 0 END AS n
                      FROM d JOIN par2 ON d.lang = par2.lang),
              ex AS (SELECT doc_id, lang, unnest(range(0, n)) AS epoch FROM sel)
         SELECT lang, CAST(epoch AS BIGINT) AS epoch,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM ex GROUP BY lang, epoch ORDER BY lang, epoch""",
    "q_bm25" ->
      """WITH dd AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
                            string_split(text, ' ') AS ws
                     FROM documents),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dd),
         tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                FROM (SELECT doc_id, dl, unnest(ws) AS term FROM dd)
                WHERE term IN ('spark','hash','join','window','stream')
                GROUP BY doc_id, dl, term),
         df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         idf AS (SELECT term,
                        CAST(round(ln((n - df + 0.5) / (df + 0.5) + 1.0) * 1000000, 0) AS BIGINT) AS idf_micro
                 FROM df, tot),
         avgd AS (SELECT (t * 1000) // n AS avgdl_milli FROM tot)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
              CAST(sum((idf_micro * 2200 * tf) //
                       (1000 * tf + 300 + (900000 * dl) // avgdl_milli)) AS BIGINT) AS score_micro
       FROM tf JOIN idf USING (term), avgd
       GROUP BY doc_id
       ORDER BY score_micro DESC, doc_id
       LIMIT 50""",
    "q_quality_deciles" ->
      """WITH s AS (SELECT doc_id,
                           CAST(floor(len(list_filter(string_split(text, ' '),
                                                      x -> x IN ('the','a','of','and','to'))) * 10000
                                      / len(string_split(text, ' '))) AS BIGINT) AS score,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
                    FROM documents),
         r AS (SELECT score, n_words,
                      row_number() OVER (ORDER BY score, doc_id) AS grank
               FROM s),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s)
       SELECT ((grank - 1) * 10) // n AS decile,
              CAST(count(*) AS BIGINT) AS n_docs,
              min(score) AS min_score, max(score) AS max_score,
              CAST(sum(n_words) AS BIGINT) AS sum_words
       FROM r, tot
       GROUP BY 1 ORDER BY 1""",
    "q_train_order" ->
      """WITH p AS (SELECT doc_id,
                           ((doc_id % 2147483647) * 48271 + 11) % 2147483647 AS perm
                    FROM documents),
              sh AS (SELECT doc_id, perm, perm % 8 AS shard FROM p),
              o AS (SELECT shard, perm, doc_id,
                           row_number() OVER (PARTITION BY shard ORDER BY perm, doc_id) AS pos
                    FROM sh)
         SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                min(perm) AS first_perm, max(perm) AS last_perm,
                CAST(sum(pos * (doc_id % 1000003)) AS BIGINT) AS order_sum
         FROM o GROUP BY shard ORDER BY shard""",
    "q_rule_filter" ->
      """WITH s AS (SELECT source,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                           len(list_filter(string_split(text, ' '),
                               x -> x IN ('the','a','of','and','to'))) * 10000
                             // len(string_split(text, ' ')) AS sw,
                           (len(string_split(text, ' '))
                             - len(list_distinct(string_split(text, ' ')))) * 10000
                             // len(string_split(text, ' ')) AS rep,
                           (list_sum(list_transform(string_split(text, ' '),
                               x -> len(x))) * 10)
                             // len(string_split(text, ' ')) AS ml
                    FROM documents),
              f AS (SELECT source,
                           CASE WHEN n < 30 THEN 1 ELSE 0 END AS r_short,
                           CASE WHEN sw < 300 THEN 1 ELSE 0 END AS r_stop,
                           CASE WHEN rep > 6000 THEN 1 ELSE 0 END AS r_rep,
                           CASE WHEN ml < 45 THEN 1 ELSE 0 END AS r_wordlen
                    FROM s)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(r_short) AS BIGINT) AS n_short,
                CAST(sum(r_stop) AS BIGINT) AS n_low_stopword,
                CAST(sum(r_rep) AS BIGINT) AS n_repetitive,
                CAST(sum(r_wordlen) AS BIGINT) AS n_short_words,
                CAST(sum(CASE WHEN r_short + r_stop + r_rep + r_wordlen = 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM f GROUP BY source ORDER BY source""",
    // polyHash fold mirrors q_minhash_arith's convention: list_reduce
    // seeds with the first element, which equals Spark's 0-seeded
    // (0*31 + c1) first step; every later step is (h*31 + c) mod p.
    "q_dsir_weights" ->
      """WITH occ AS (
           SELECT doc_id, lang,
                  list_reduce(list_transform(string_split(t, ''),
                                             c -> CAST(ascii(c) AS BIGINT)),
                              (h, c) -> (h * 31 + c) % 2147483647) % 4096 AS b
           FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
                 FROM documents)
           WHERE len(t) > 0),
         m AS (SELECT b, count(*) AS cr,
                      sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
               FROM occ GROUP BY b),
         tot AS (SELECT sum(cr) AS rtot, sum(ct) AS ttot FROM m),
         lr AS (SELECT b,
                       CAST(round(ln((CAST(ct + 1 AS DOUBLE) * CAST(rtot + 4096 AS DOUBLE))
                                   / (CAST(cr + 1 AS DOUBLE) * CAST(ttot + 4096 AS DOUBLE)))
                                  * 1000000, 0) AS BIGINT) AS lr_micro
                FROM m, tot)
         SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(l.lr_micro) AS BIGINT) AS weight_micro
         FROM occ o JOIN lr l USING (b)
         GROUP BY o.doc_id ORDER BY o.doc_id""",
    "q_split_assign" ->
      """WITH a AS (SELECT source,
                           CASE WHEN (((doc_id % 2147483647) * 15485863 + 17) % 2147483647) % 100 < 98 THEN 'train'
                                WHEN (((doc_id % 2147483647) * 15485863 + 17) % 2147483647) % 100 < 99 THEN 'validation'
                                ELSE 'test' END AS split,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
                    FROM documents)
       SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_words) AS BIGINT) AS n_words
       FROM a GROUP BY source, split ORDER BY source, split""",
  )
}
