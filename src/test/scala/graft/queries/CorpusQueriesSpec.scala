package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Plan + semantics invariants for the round-7 corpus-preparation family
  * beyond the DuckDB hash gate. */
class CorpusQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("para_dedup: first occurrence of a passage is never counted as a dup") {
    // corpus-wide duplicate passages exist iff some doc reports n_dup > 0;
    // whatever the corpus, total dups must be strictly fewer than total
    // passages and every doc's n_dup bounded by its n_passages
    val df = CorpusQueries.paraDedup(spark, sf)
    assert(df.filter(col("n_dup") > col("n_passages")).count() == 0)
    val totals = df.agg(sum("n_passages"), sum("n_dup")).head()
    assert(totals.getLong(0) > totals.getLong(1))
  }

  test("para_dedup: passage shuffle carries hashes and ids, not text") {
    val lines = CorpusQueries.paraDedup(spark, sf).queryExecution.executedPlan
      .toString.linesIterator.toVector
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(exIdx >= 0 && exIdx + 1 < lines.size)
    assert(!lines(exIdx + 1).contains("text#") && !lines(exIdx + 1).contains("ws#"),
      s"passage exchange carries document text:\n${lines(exIdx + 1)}")
  }

  test("substring_dedup: offset-shifted duplicate passage caught; aligned para_dedup misses it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ssd_fixture").toString
    // doc 1: w0..w19; doc 2: one junk word then w0..w9 — the shared
    // passage sits at OFFSET 1 in doc 2, misaligned with its 10-word
    // blocks, so block-aligned para_dedup cannot see it
    val w = (0 until 20).map(i => s"w$i")
    Seq((1L, w.mkString(" ")), (2L, ("x" +: w.take(10)).mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ssd = CorpusQueries.substringDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(ssd(1L) == ((11L, 1L)), "doc 1: 11 sliding grams, w0..w9 duplicated")
    assert(ssd(2L) == ((2L, 1L)), "doc 2: 2 sliding grams, the offset-1 one duplicated")
    val pd = CorpusQueries.paraDedup(spark, dir).collect()
      .map(r => r.getLong(2)).sum
    assert(pd == 0L, "aligned block dedup must NOT see the shifted duplicate")
  }

  test("substring_dedup: gram shuffle carries hashes and ids, not text") {
    val lines = CorpusQueries.substringDedup(spark, sf).queryExecution.executedPlan
      .toString.linesIterator.toVector
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(exIdx >= 0 && exIdx + 1 < lines.size)
    assert(!lines(exIdx + 1).contains("text#") && !lines(exIdx + 1).contains("ws#"),
      s"gram exchange carries document text:\n${lines(exIdx + 1)}")
  }

  test("source_overlap: shared grams counted once per source pair, unrelated sources absent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_so_fixture").toString
    val w = (0 until 12).map(i => s"w$i") // w0..w11
    Seq(
      // srcA doc: w0..w11 → grams at pos 0,1,2
      (1L, w.mkString(" "), "srcA"),
      // srcB doc: junk then w0..w10 → shares grams w0..w9 AND w1..w10
      (2L, ("x" +: w.take(11)).mkString(" "), "srcB"),
      // srcB second doc repeats w0..w9 — must NOT double-count the pair
      (3L, w.take(10).mkString(" "), "srcB"),
      // srcC: unrelated
      (4L, (0 until 10).map(i => s"z$i").mkString(" "), "srcC"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusQueries.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("srcA", "srcB", 2L)),
      s"expected exactly the (srcA, srcB, 2) cell, got ${rows.toSeq}")
  }

  test("decontam_bloom: bloom pre-filter probes inside the corpus scan pipeline") {
    val plan = CorpusQueries.decontamBloom(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a BloomFilterMightContain probe in the plan:\n$plan")
  }

  test("decontam_bloom output is bit-identical to the exact decontam") {
    val exact = PipelineQueries.decontam(spark, sf).collect().toSeq
    val bloom = CorpusQueries.decontamBloom(spark, sf).collect().toSeq
    assert(bloom == exact, "bloom pre-filter changed the decontam result")
  }

  test("lang_mixture: tail languages keep a higher rate than their raw share") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sf)
    val total = docs.count()
    val raw = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = CorpusQueries.langMixture(spark, sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // α=0.5 temperature flattens the mixture: the majority language's share
    // of the SAMPLE must be strictly below its share of the corpus, and
    // every minority language's sampling RATE must beat the majority's
    val (majLang, majCount) = raw.maxBy(_._2)
    val sampleTotal = kept.values.sum
    assert(kept(majLang).toDouble / sampleTotal < majCount.toDouble / total,
      "temperature sampling did not flatten the majority language")
    val majRate = kept(majLang).toDouble / majCount
    raw.filter(_._1 != majLang).foreach { case (l, c) =>
      assert(kept.getOrElse(l, 0L).toDouble / c > majRate,
        s"minority $l sampled at a lower rate than majority $majLang")
    }
  }

  test("lang_mixture: selection is map-only after the broadcast threshold join") {
    val plan = CorpusQueries.langMixture(spark, sf).queryExecution.executedPlan.toString
    // the big side must meet the thresholds via BroadcastHashJoin — an
    // Exchange of `documents` on lang (5 keys) would be a skew disaster
    assert(plan.contains("BroadcastHashJoin"), s"threshold join not broadcast:\n$plan")
    // streamed side renders first: the lines between the join and its first
    // FileScan are the probe side of `documents`, which must not exchange
    // (the tiny 5-row counts agg on the BUILD side shuffles legitimately)
    val lines = plan.linesIterator.toVector
    val joinIdx = lines.indexWhere(_.contains("BroadcastHashJoin"))
    val scanIdx = lines.indexWhere(_.contains("FileScan"), joinIdx)
    assert(joinIdx >= 0 && scanIdx > joinIdx)
    assert(!lines.slice(joinIdx, scanIdx).exists(_.contains("Exchange")),
      s"documents probe side shuffled:\n$plan")
  }

  test("ngram_lm: hand-computed add-one bigram surprisal on a crafted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lm_fixture").toString
    Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // corpus bigrams: (a,b)x3, (b,a)x1; heads: a->3, b->1; vocab {a,b,c} = 3
    // nll(a,b) = -ln(4/6) -> round(405465.108...) = 405465 micro-nats
    // nll(b,a) = -ln(2/4) -> round(693147.180...) = 693147 micro-nats
    val rows = CorpusQueries.ngramLm(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet == Set(1L, 2L), "single-word doc 3 must be excluded")
    assert(rows(1L) == ((3L, 2 * 405465L + 693147L, (2 * 405465L + 693147L) / 3)))
    assert(rows(2L) == ((1L, 405465L, 405465L)))
  }

  test("ngram_lm_backoff: hand-computed fixture exercises OOV, pruning AND backoff") {
    // K=2 caps the vocab to {a, b} (counts a:4, b:3; c/d/e -> OOV ␁);
    // doc 1 "a b a b c a" -> bigrams (a,b)(b,a)(a,b)(b,␁)(␁,a),
    // doc 2 "a b d" -> (a,b)(b,␁), doc 3 single-word -> excluded.
    // c2: (a,b):3 (b,␁):2 (b,a):1 (␁,a):1; c1: a:3 b:3 ␁:1;
    // cu: b:3 ␁:2 a:2; N=7. Pruned model (c2>=2):
    //   nll(a,b) = -ln(3/3) = 0; nll(b,␁) = -ln(2/3) -> 405465
    // Backoff (c2=1 rows fall out of the model): both end in a ->
    //   nll2(a) = -ln(0.4*2/7) = ln(8.75) -> 2169054 micro-nats
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bo_fixture").toString
    Seq((1L, "a b a b c a"), (2L, "a b d"), (3L, "e"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusQueries.ngramLmScoresBackoff(spark, dir, k = 2)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet == Set(1L, 2L), "single-word doc 3 must be excluded")
    val nllBOov = 405465L          // -ln(2/3) in micro-nats, round half-up
    val nll2a = 2169054L           // -ln(0.4*2/7)
    assert(rows(1L) == ((5L, 2L, nllBOov + 2 * nll2a, (nllBOov + 2 * nll2a) / 5)),
      s"doc 1 got ${rows(1L)}")
    assert(rows(2L) == ((2L, 0L, nllBOov, nllBOov / 2)), s"doc 2 got ${rows(2L)}")
  }

  test("ngram_lm: reliable checkpoint mode when a checkpointDir is set (executor-loss safety)") {
    // The Components.snap policy (VERDICT r8 #6): with a checkpointDir the
    // shared (doc_id, w1, w2) materialization must go to STABLE storage —
    // a localCheckpoint'd block dies with its executor and the truncated
    // lineage leaves no recompute path on a multi-hour run. Result must be
    // identical in both modes; reliable mode must actually write rdd-* dirs.
    import spark.implicits._
    val fixture = java.nio.file.Files.createTempDirectory("graft_lm_ckpt_fixture").toString
    Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$fixture/documents.parquet")
    def rows() = CorpusQueries.ngramLm(spark, fixture)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val localMode = rows()
    val sc = spark.sparkContext
    val saved = org.apache.spark.GraftTestBridge.checkpointDir(sc)
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-ckpt").toFile
    try {
      sc.setCheckpointDir(dir.getAbsolutePath)
      val reliableMode = rows()
      assert(reliableMode == localMode, "checkpoint mode changed the result")
      // checkpoint layout: <dir>/<uuid>/rdd-<id>/... — exactly one
      // generation (the shared bi projection) must have been written
      val rddDirs = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(u => Option(u.listFiles()).getOrElse(Array.empty).toSeq)
        .filter(_.getName.startsWith("rdd-"))
      assert(rddDirs.nonEmpty, "reliable mode wrote no checkpoint files")
    } finally {
      org.apache.spark.GraftTestBridge.setCheckpointDir(sc, saved)
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("ngram_lm_backoff: corpus with no multi-word docs yields the empty frame (in-plan N, no NPE)") {
    // r15 folded N into the plan as a 1-row broadcast, retiring the
    // driver-side empty-corpus guard; this pins the behavior the guard
    // protected — no exception, empty result, full 5-column schema.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bo_empty").toString
    Seq((1L, "solo"), (2L, "alone"), (3L, ""))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusQueries.ngramLmScoresBackoff(spark, dir, k = 4)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bigrams", "n_backoff", "nll_micro", "avg_micro"))
    assert(out.count() == 0L)
  }

  test("token_hist: buckets partition the corpus and bounds nest") {
    import spark.implicits._
    val hist = CorpusQueries.tokenHist(spark, sf).collect()
    val total = graft.util.Tables.documents(spark, sf).count()
    assert(hist.map(_.getLong(1)).sum == total, "bucket doc counts must partition the corpus")
    hist.foreach { r =>
      val (digits, minT, maxT) = (r.getInt(0), r.getLong(3), r.getLong(4))
      assert(minT.toString.length == digits && maxT.toString.length == digits,
        s"bucket $digits holds counts outside its digit range: [$minT, $maxT]")
    }
  }

  test("winnow: docs sharing a >=6-word substring share a selected fingerprint") {
    import spark.implicits._
    // the Schleimer et al. guarantee: window W=4 over K=3 grams detects
    // any shared run of W+K-1 = 6 words, at ANY offset in either doc
    val shared = "quick brown foxes jump over lazy"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon"),
      (2L, s"one two three four five six seven $shared"),
      (3L, "totally unrelated words nothing in common here at all"))
      .toDF("doc_id", "text")
    val sel = CorpusQueries.winnowSelections(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](3).toSet).toMap
    assert((sel(1L) intersect sel(2L)).nonEmpty,
      "shared 6-word run must share a selected gram hash")
    assert((sel(1L) intersect sel(3L)).isEmpty)
    // density bounds: one selection can cover at most W windows, and
    // distinct selections never exceed window count
    val rolled = CorpusQueries.winnow(spark, sf).collect()
    rolled.filter(_.getLong(1) >= 4).foreach { r =>
      val (grams, selN) = (r.getLong(1), r.getLong(2))
      val windows = grams - 3
      assert(selN <= windows && selN * 4 >= windows,
        s"doc ${r.getLong(0)}: $selN selections for $windows windows")
    }
  }

  test("winnow: selection plan is map-only — zero exchanges") {
    val plan = CorpusQueries
      .winnowSelections(graft.util.Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"winnowing must not shuffle:\n$plan")
  }

  test("substring_cut: duplicated span cut from BOTH docs, remainder re-spliced") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cut_fx").toString
    val span = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10" // exactly one 10-gram
    val docs = Seq(
      (1L, s"keep1 keep2 $span keep3"),
      (2L, s"$span tail1 tail2 tail3"),
      (3L, "all unique words here nothing repeats in this doc at all"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val res = CorpusQueries.substringCut(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def md5Of(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc 1: the span (positions 2..11) cut -> "keep1 keep2 keep3"
    assert(res(1L) == ((13L, 3L, md5Of("keep1 keep2 keep3"))))
    // doc 2: span at 0..9 cut -> "tail1 tail2 tail3"
    assert(res(2L) == ((13L, 3L, md5Of("tail1 tail2 tail3"))))
    // doc 3: untouched, md5 of the full text
    assert(res(3L)._2 == res(3L)._1 &&
      res(3L)._3 == md5Of("all unique words here nothing repeats in this doc at all"))
  }

  test("winnow_pairs: shared-span pair surfaces; exact clones collapse to the rep") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wp_fx").toString
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val docs = Seq(
      (1L, s"one two three four five $shared aa bb cc dd ee"),
      (2L, s"six seven eight nine ten eleven twelve thirteen $shared"),
      (3L, s"one two three four five $shared aa bb cc dd ee"), // clone of 1
      (4L, "zulu yankee xray whiskey victor uniform tangoX sierraX romeoX quebecX"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = CorpusQueries.winnowPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the 20-word shared span guarantees >=2 shared selections
    assert(pairs.exists { case (a, b, n) => a == 1L && b == 2L && n >= 2L },
      s"shared-span pair missing: ${pairs.mkString(",")}")
    // doc 3 is byte-identical to doc 1 -> collapsed, never appears
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L })
    assert(!pairs.exists { case (a, b, _) => a == 4L || b == 4L })
  }

  test("delta_dedup: planted exact / near / unique deltas classify correctly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_fx").toString
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    // corpus docs (id % 10 != 0); delta docs (id % 10 == 0):
    //   20 = byte-identical to corpus 3 -> exact_dup matched 3
    //   30 = one word changed -> near_dup matched 3 (jac < 1000)
    //   40 = unrelated -> unique
    val docs = Seq(
      (3L, base), (7L, "completely different corpus text with many other words in it"),
      (20L, base),
      (30L, base.replace("lazy", "sleepy")),
      (40L, "zebra xylophone quartz vortex jigsaw plasma nebula prism"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val res = CorpusQueries.deltaDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(res(20L)._1 == "exact_dup" && res(20L)._2 == 3L && res(20L)._3 == 1000L)
    assert(res(30L)._1 == "near_dup" && res(30L)._2 == 3L)
    assert(res(30L)._3 >= 500L && res(30L)._3 < 1000L)
    assert(res(40L) == ("unique", -1L, -1L))
  }

  test("delta_dedup: corpus never shuffles — no exchange carries shingle arrays") {
    val lines = CorpusQueries.deltaDedup(spark, sf).queryExecution.executedPlan
      .toString.linesIterator.toVector
    // the band probe and the jaccard verify are broadcast joins inside
    // the corpus scan: no SHUFFLE exchange may carry the corpus shingle
    // array (csh) — only the delta batch's own dedup shuffles arrays,
    // and that side is batch-sized by design
    lines.zipWithIndex.filter(_._1.contains("Exchange hashpartitioning"))
      .foreach { case (_, i) =>
        if (i + 1 < lines.size) {
          val payload = lines(i + 1)
          assert(!payload.contains("csh#"),
            s"shuffle exchange carries corpus shingles:\n$payload")
        }
      }
    assert(lines.exists(_.contains("BroadcastHashJoin")),
      "delta side must broadcast")
  }

  test("ngram_lm: self-trained model scores every multi-word doc, one row per doc") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("expect"))
      .filter(col("expect") >= 1)
    val scored = CorpusQueries.ngramLm(spark, sf).select("doc_id", "n_bigrams")
    // every bigram occurrence joins the model built from the same corpus,
    // so n_bigrams must equal words-1 exactly, for every multi-word doc
    val mismatches = docs.join(scored, Seq("doc_id"), "full")
      .filter(col("expect").isNull || col("n_bigrams").isNull ||
        col("expect") =!= col("n_bigrams"))
    assert(mismatches.count() == 0)
  }
}
