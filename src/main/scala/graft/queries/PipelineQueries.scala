package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Components, Dedup}
import graft.functions.TextFunctions
import graft.util.Tables._

/** Round-6 training-data-pipeline surface: near-dup CLUSTER resolution
  * (pairs → transitive components → canonical survivor), benchmark
  * decontamination, corpus-statistics term scoring (TF-IDF), and
  * deterministic stratified sampling. Each query has a full DuckDB oracle.
  */
object PipelineQueries {

  /** Near-dup cluster resolution: the near-dup graph (word-set Jaccard
    * ≥ 0.5 inside (lang, length-bucket) blocks — the q_jaccard_pairs
    * machinery) closed into transitive components via alternating
    * large-star/small-star ([[graft.operators.Components]]), every doc
    * assigned its cluster, sized, and the canonical survivor marked
    * (minimum doc_id — the deterministic survivor rule the exact-dedup
    * family already uses). a~b, b~c retires c even when (a,c) was never
    * emitted — the step pair-emitting dedup ops need before any doc can
    * be dropped. The closure consumes [[Dedup.jaccardNearDupEdges]] —
    * rep pairs + star edges, connectivity-identical to the expanded pair
    * list but LINEAR in clone-group size where the expansion is quadratic
    * (the q_semdedup discipline; at the clone-heavy 100× tier the
    * expanded pair graph OOMs the closure's edge snapshot). Shuffles
    * carry (Long, Long) ids only; never documents. */
  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val pairs = Dedup.jaccardNearDupEdges(docs, "doc_id", "text",
        blockExpr = concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long")),
        threshold = 0.5)
    val comp = Components.clusters(docs.select("doc_id"), "doc_id", pairs, "id_a", "id_b")
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("n_members"))
    comp.join(sizes, "component")
      .select(col("doc_id"), col("component"), col("n_members"),
        (col("doc_id") === col("component")).cast("int").as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: flag corpus docs sharing ≥1 distinct word
    * 5-gram with the benchmark set (fixture: doc_id % 20 == 0 plays the
    * benchmark). Shingling is map-side and distinct per doc; the benchmark
    * shingle set is SMALL BY DEFINITION (eval sets are thousands of docs,
    * not billions), so the membership probe is a broadcast semi-join — the
    * corpus never shuffles, matching 100 TB discipline. Joining on
    * unhex(md5(...)) keeps the broadcast 16 binary bytes/shingle rather
    * than the raw string (or md5's 32-char hex). The oracle joins on the
    * hex string — identical equality semantics, same output. */
  def decontam(s: SparkSession, d: String): DataFrame = {
    // distinct 5-gram digests via the compiled byte-range pass (r14,
    // [[graft.expr.SpanMd5s]], distinct mode): identical digest set to
    // explode(wordShinglesStrict) + unhex(md5(...)) — string-level and
    // digest-level dedup coincide under the repo-wide md5-collision-free
    // assumption, and every consumer joins/counts on the digest
    // (SpanMd5sSpec pins the arrays element-for-element)
    val sh = documents(s, d)
      .select(col("doc_id"),
        explode(graft.expr.SpanMd5s.span_md5s(col("text"), 5, distinct = true))
          .as("sh"))
    val bench = sh.filter(col("doc_id") % 20 === 0).select("sh").distinct()
    sh.filter(col("doc_id") % 20 =!= 0)
      .join(broadcast(bench), "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
      .orderBy("doc_id")
  }

  /** Corpus-statistics term scoring: plain TF-IDF (tf · ln(N/df)), top 3
    * terms per doc. Two partial-aggregate shuffles (doc-term counts, then
    * document frequency) + one broadcast-able join on term; N is a driver
    * scalar (one count — bounded). Ranking runs on the ROUND-6-decimal
    * score so the cross-engine ordering never hinges on a libm ulp; ties
    * break on the term string. */
  def tfidfTopTerms(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfq, "term")
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6)
          .cast(DecimalType(18, 6)).cast("double").as("tfidf"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** Deterministic per-stratum Bernoulli sampling: keep a doc iff a seeded
    * affine permutation of its id (mod Mersenne-31 — the arithPerms
    * pattern) lands under the stratum's rate in basis points. Map-only —
    * the predicate pushes into the scan pipeline, zero shuffle — and
    * reproducible under any partitioning or layout, unlike
    * `df.sample(fraction, seed)` whose output changes with partitioning
    * ([[graft.operators.Sampling]] holds the xxhash64 production variants;
    * this declared twin uses arithmetic both engines express). doc_id is
    * reduced mod 2³¹−1 BEFORE the affine multiply: the permutation within
    * the field is preserved, and the product stays ≤ (2³¹−2)·15485863
    * ≈ 3.3e16 ≪ Long.MaxValue, so Spark (wrapping) and DuckDB (erroring)
    * never diverge on huge derived-tier id ranges. */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val bp = pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(15485863L) + lit(17L),
      lit(2147483647L)) % 10000
    val rate = when(col("lang") === "en", 5000)
      .when(col("lang") === "es", 2500)
      .otherwise(1000)
    documents(s, d)
      .filter(bp < rate)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  /** JSONL ingestion round-trip with quarantine accounting (VERDICT r10
    * What's-wrong #1 — the one ingestion family without an oracle gate):
    * the documents table is serialized to a real 4-shard JSONL corpus
    * (shard 0 gzip — the non-splittable codec path; shards 1-3 plain)
    * with DETERMINISTIC corruption injected — every doc_id % 97 == 0 line
    * is truncated mid-JSON, and every doc_id % 101 == 0 doc is followed
    * by a blank separator line (the concatenated-dump shape whose phantom
    * all-null rows the blank-line fix quarantines). The shards are then
    * read back through the REAL ingestion path ([[graft.ops.Extract.readJsonl]]
    * text + from_json with a corrupt-record column, per-shard so the
    * write-side routing is itself under test) and split by
    * [[graft.ops.Extract.jsonlCorrupt]]. Output: per shard, clean and
    * quarantined line counts plus three content pins over the clean rows
    * (char mass, min/max text md5) — the DuckDB oracle derives all six
    * from the parquet table and the same corruption rule, so a parse
    * divergence, a mis-routed line, an un-quarantined blank, or a
    * JSON-escaping round-trip bug all hash-fail.
    *
    * Scale shape: the serialize side is one map-only write per shard
    * (line construction is pure projection; the blank-separator explode
    * is ≤2 rows per doc); the ingest side is [[graft.ops.Extract.readJsonl]]'s
    * 100 TB shape — parallelism by file count, gzip shards one task each
    * — and the rollup is a 1-row aggregate per shard. Nothing data-sized
    * touches the driver; the fixture path is tier-keyed so concurrent
    * tiers don't collide. */
  private val jsonlMemo = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[String]]()

  def jsonlIngest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    // Fixture serialization memoized per (application, dataset) — the
    // orcMemo / binMemo discipline (r14): the 4-shard JSONL corpus is a
    // deterministic function of the dataset, so one JVM writes it once
    // (revalidated via fs.exists, rebuilt if an external cleaner removed
    // it) instead of re-serializing on every invocation; the dir is a
    // fresh TempLayouts-registered temp dir (deleted at JVM exit), which
    // also retires the old FIXED /tmp path two concurrent JVMs on the
    // same dataset could overwrite under each other. Bench note: the
    // q_jsonl_ingest row now measures serialize+ingest on the first run
    // and ingest-only thereafter (median = ingest), exactly like
    // q_orc_ingest/q_binary_ingest — declared in OPTIMIZATION_r14.md.
    val base = graft.util.Memo.onceValid(jsonlMemo,
        s.sparkContext.applicationId + "|" + d)(
        p => graft.util.InputSize.exists(s, p)) {
      val dir = graft.util.TempLayouts.register(
        java.nio.file.Files.createTempDirectory("graft_jsonl_")).toString
      val docs = documents(s, d).select(col("doc_id"), col("text"), col("source"))
      val line = when(col("doc_id") % 97 === 0,
          concat(lit("{\"doc_id\": "), col("doc_id"), lit(", \"text\": ")))
        .otherwise(to_json(struct(col("doc_id"), col("text"), col("source"))))
      val lines = docs.select(col("doc_id"),
        explode(when(col("doc_id") % 101 === 0, array(line, lit("")))
          .otherwise(array(line))).as("value"))
      (0 to 3).foreach { sh =>
        val w = lines.filter(col("doc_id") % 4 === sh).select("value")
          .write.mode("overwrite")
        (if (sh == 0) w.option("compression", "gzip") else w).text(s"$dir/shard$sh")
      }
      dir
    }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("source", StringType)))
    (0 to 3).map { sh =>
      val (clean, quar) =
        graft.ops.Extract.jsonlCorrupt(graft.ops.Extract.readJsonl(s, s"$base/shard$sh", schema))
      clean.agg(count(lit(1)).as("n_clean"),
          sum(length(col("text"))).as("clean_chars"),
          min(md5(col("text").cast("binary"))).as("md5_min"),
          max(md5(col("text").cast("binary"))).as("md5_max"))
        .crossJoin(quar.agg(count(lit(1)).as("n_quarantined"))) // 1-row × 1-row
        .select(lit(sh.toLong).as("shard"), col("n_clean"), col("n_quarantined"),
          col("clean_chars"), col("md5_min"), col("md5_max"))
    }.reduce(_ unionByName _).orderBy("shard")
  }

  /** ORC format-parity round-trip ([[graft.ops.Extract.writeOrc]] /
    * [[graft.ops.Extract.readOrc]]): lineitem's key columns are written
    * to ORC ONCE per (application, dataset) — `Memo.once`, temp dir
    * registered for exit cleanup, the bucketed-star-tables discipline —
    * then read back THROUGH THE ORC SCAN with a pushed filter and a
    * pruned projection, and aggregated with integer-exact sums. The
    * oracle runs the identical aggregate over the PARQUET lineitem, so a
    * hash match proves the ORC writer+reader round-trip loses nothing.
    * The scan-shape claims (PushedFilters on l_returnflag, l_quantity
    * pruned out of ReadSchema) are spec-asserted. */
  private val orcMemo = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[String]]()

  def orcIngest(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(
      "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")
    val key = s.sparkContext.applicationId + "|" + d
    // revalidate the memoized layout (VERDICT r13 #1): a group cleanup or
    // external tmp cleaner that deletes the dir mid-JVM must trigger a
    // rebuild, never a PATH_NOT_FOUND at scan time
    val path = graft.util.Memo.onceValid(orcMemo, key)(
        p => graft.util.InputSize.exists(s, p)) {
      val dir = graft.util.TempLayouts.register(
        java.nio.file.Files.createTempDirectory("graft_orc_")).toString
      graft.ops.Extract.writeOrc(li, s"$dir/lineitem_orc")
      s"$dir/lineitem_orc"
    }
    graft.ops.Extract.readOrc(s, path)
      .filter(col("l_returnflag") === "R")
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_orderkey")).as("key_sum"),
        sum(col("l_linenumber").cast("long")).as("line_sum"))
      .orderBy("l_linestatus")
  }

  /** Binary-file SOURCE ingest — the multimodal ingestion path at corpus
    * scale: images land as one FILE per object (the crawl layout) and
    * Spark's built-in `binaryFile` source reads (path, length, content)
    * distributedly, with `pathGlobFilter` keeping non-image junk out of
    * the scan entirely. The fixture materializes every 97th doc's 9×8 BMP
    * (the [[TextQueries.imageDhash]] synthesis — byte round trip pinned
    * by MultimodalSpec's ImageIO decode) EXECUTOR-SIDE via
    * `foreachPartition` — files never transit the driver — plus a
    * README.txt the glob must exclude; one materialization per
    * (application, dataset), revalidated like every memo-of-layout site.
    * The 1-in-97 sample keeps the file COUNT ingestible at the derived
    * tiers (100× would otherwise mint 500 k inodes) while still growing
    * linearly with the corpus — the sampling is declared here and
    * mirrored in the oracle, not silent. The engine recovers doc_id from
    * the file NAME and the perceptual hash from the file BYTES; the
    * oracle recomputes both from the synthesis arithmetic. */
  private val binMemo = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[String]]()

  def binaryIngest(s: SparkSession, d: String): DataFrame = {
    val key = s.sparkContext.applicationId + "|" + d
    val path = graft.util.Memo.onceValid(binMemo, key)(
        p => graft.util.InputSize.exists(s, p)) {
      val dir = graft.util.TempLayouts.register(
        java.nio.file.Files.createTempDirectory("graft_binfiles_")).toString
      TextQueries.imagePayloads(s, d)
        .filter(col("doc_id") % 97L === 0L)
        .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          rows.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dir, f"img_${r.getLong(0)}%012d.bmp"),
              r.getAs[Array[Byte]](1))
          }
        }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "README.txt"), "not an image\n")
      dir
    }
    s.read.format("binaryFile").option("pathGlobFilter", "*.bmp").load(path)
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.bmp$", 1).cast("long").as("doc_id"),
        col("length").cast("long").as("n_bytes"),
        graft.operators.Multimodal.dhashHex(col("content")).as("dhash"))
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_clusters"    -> (dedupClusters _),
    "q_decontam"          -> (decontam _),
    "q_tfidf"             -> (tfidfTopTerms _),
    "q_sample_stratified" -> (sampleStratified _),
    "q_jsonl_ingest"      -> (jsonlIngest _),
    "q_orc_ingest"        -> (orcIngest _),
    "q_binary_ingest"     -> (binaryIngest _),
  )

  val oracle: Map[String, String] = Map(
    // the engine aggregated these rows from its ORC round-trip; the oracle
    // reads the SAME rows from parquet — a hash match is format parity
    // the engine read these rows back from real files through the
    // binaryFile source; the oracle recomputes the synthesis arithmetic —
    // a hash match proves the write→list→read→parse round trip
    "q_binary_ingest" ->
      s"""WITH ${TextQueries.imageDhashHashesCte}
       SELECT doc_id, CAST(278 AS BIGINT) AS n_bytes, dhash
       FROM hashes WHERE doc_id % 97 = 0 ORDER BY doc_id""",
    "q_orc_ingest" ->
      """SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
              CAST(sum(l_linenumber) AS BIGINT) AS line_sum
       FROM lineitem WHERE l_returnflag = 'R'
       GROUP BY l_linestatus ORDER BY l_linestatus""",
    // transitive closure via recursive CTE — feasible for the oracle because
    // component sizes are bounded at the oracle tiers (reach rows = Σ s²)
    "q_dedup_clusters" ->
      """WITH RECURSIVE docs AS (
           SELECT doc_id, lang || '|' || CAST(CAST(floor(n_chars / 25) AS BIGINT) AS VARCHAR) AS block,
                  list_distinct(string_split(text, ' ')) AS w
           FROM documents),
         prs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM docs a JOIN docs b ON a.block = b.block AND a.doc_id < b.doc_id
           WHERE (len(a.w) + len(b.w) - len(list_distinct(list_concat(a.w, b.w))))
                 / CAST(len(list_distinct(list_concat(a.w, b.w))) AS DOUBLE) >= 0.5),
         edges AS (SELECT id_a AS u, id_b AS v FROM prs
                   UNION SELECT id_b, id_a FROM prs),
         reach(id, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u),
         comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         sz AS (SELECT component, count(*) AS n_members FROM comp GROUP BY component)
       SELECT c.id AS doc_id, c.component, sz.n_members,
              CAST(c.id = c.component AS INTEGER) AS is_canonical
       FROM comp c JOIN sz USING (component)
       ORDER BY doc_id""",
    "q_decontam" ->
      """WITH sh AS (
           SELECT doc_id, md5(unnest(list_distinct(
                    list_transform(range(1, len(w) - 5 + 2),
                                   i -> array_to_string(w[i:i+4], ' '))))) AS sh
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
           WHERE len(w) >= 5),
         bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0)
       SELECT doc_id, count(*) AS n_overlap
       FROM sh JOIN bench USING (sh)
       WHERE doc_id % 20 <> 0
       GROUP BY doc_id ORDER BY doc_id""",
    "q_tfidf" ->
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term),
         dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         scored AS (
           SELECT doc_id, term,
                  CAST(CAST(round(tf * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / df), 6)
                            AS DECIMAL(18,6)) AS DOUBLE) AS tfidf
           FROM tf JOIN dfx USING (term)),
         ranked AS (SELECT doc_id, term, tfidf,
                           row_number() OVER (PARTITION BY doc_id
                                              ORDER BY tfidf DESC, term) AS rank
                    FROM scored)
       SELECT doc_id, rank, term, tfidf FROM ranked WHERE rank <= 3
       ORDER BY doc_id, rank""",
    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
         WHERE (((doc_id % 2147483647) * 15485863 + 17) % 2147483647) % 10000 <
               CASE WHEN lang = 'en' THEN 5000 WHEN lang = 'es' THEN 2500 ELSE 1000 END
         ORDER BY doc_id""",
    // mirrors the deterministic corruption rule from the parquet table:
    // doc_id % 97 == 0 -> truncated (quarantined) line; doc_id % 101 == 0
    // -> one extra blank line in the same shard (also quarantined)
    "q_jsonl_ingest" ->
      """SELECT CAST(doc_id % 4 AS BIGINT) AS shard,
              CAST(count(*) FILTER (WHERE doc_id % 97 <> 0) AS BIGINT) AS n_clean,
              CAST(count(*) FILTER (WHERE doc_id % 97 = 0) +
                   count(*) FILTER (WHERE doc_id % 101 = 0) AS BIGINT) AS n_quarantined,
              CAST(sum(length(text)) FILTER (WHERE doc_id % 97 <> 0) AS BIGINT) AS clean_chars,
              min(md5(text)) FILTER (WHERE doc_id % 97 <> 0) AS md5_min,
              max(md5(text)) FILTER (WHERE doc_id % 97 <> 0) AS md5_max
       FROM documents GROUP BY doc_id % 4 ORDER BY shard""",
  )
}
