package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantics + plan invariants for the training-data selection family
  * (BM25 scoring, exact global decile binning, deterministic splits)
  * beyond the DuckDB hash gate. */
class SelectionQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bm25: hand-computed two-doc fixture matches the integer formula") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_fixture").toString
    // doc 1 has 'spark' twice in 4 tokens; doc 2 has no query term in 6
    Seq((1L, "spark a spark b"), (2L, "c d e f g h"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SelectionQueries.bm25(spark, dir).collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L)
    // N=2, T=10, df=1: idf_micro = round(ln((2-1+0.5)/1.5 + 1)*1e6) = ln(2)*1e6
    val idf = math.round(math.log((2 - 1 + 0.5) / 1.5 + 1.0) * 1e6)
    // avgdl_milli = 10000/2 = 5000; dl=4, tf=2
    val contrib = (idf * 2200 * 2) / (1000 * 2 + 300 + (900000L * 4) / 5000)
    assert(rows(0).getLong(2) == contrib, s"expected $contrib")
  }

  test("bm25: term stream is filtered to the query set before the aggregate shuffle") {
    val lines = SelectionQueries.bm25(spark, sf).queryExecution.executedPlan
      .toString.linesIterator.toVector
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(exIdx >= 0)
    // every exchange in the plan carries grouped scalars, never the ws array
    lines.zipWithIndex.filter(_._1.contains("Exchange")).foreach { case (_, i) =>
      if (i + 1 < lines.size)
        assert(!lines(i + 1).contains("ws#"),
          s"exchange carries the token array:\n${lines(i + 1)}")
    }
  }

  test("quality_deciles: histogram+within-score rank equals a global sort rank") {
    import spark.implicits._
    val res = SelectionQueries.qualityDeciles(spark, sf).collect()
    val n = res.map(_.getLong(1)).sum
    // deciles partition the corpus: 10 buckets (or fewer on tiny corpora),
    // sizes within 1 of n/10 when 10 divides into the corpus evenly enough
    assert(res.map(_.getLong(0)).distinct.length == res.length)
    assert(res.map(_.getLong(1)).sum == n)
    val sizes = res.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1,
      s"decile sizes must differ by at most 1: ${sizes.mkString(",")}")
    // score ranges must be non-overlapping and ordered with the decile
    val ordered = res.sortBy(_.getLong(0))
    ordered.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2),
        "decile max_score must not exceed next decile's min_score")
      case _ =>
    }
  }

  test("quality_deciles: no single-partition corpus-sized window in the plan") {
    // the per-score window partitions by score; the only unpartitioned
    // window allowed is the histogram's (bounded by the score domain).
    // Assert the data-sized window operator has a partition key.
    val plan = SelectionQueries.qualityDeciles(spark, sf)
      .queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toVector
    assert(windows.exists(_.contains("score#")),
      "within-score rank window must partition by score")
  }

  test("split_assign: assignment is a pure function of doc_id (subset-stable) and ~98/1/1") {
    import spark.implicits._
    val res = SelectionQueries.splitAssign(spark, sf).collect()
    val bySplit = res.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val n = bySplit.values.sum
    assert(bySplit.keySet == Set("train", "validation", "test"))
    assert(bySplit("train").toDouble / n > 0.95)
    assert(bySplit("validation").toDouble / n < 0.03)
    assert(bySplit("test").toDouble / n < 0.03)
    // subset stability: restricting the corpus to even doc_ids must give
    // exactly the even-doc contribution of the full assignment
    val dir = java.nio.file.Files.createTempDirectory("graft_split_fixture").toString
    graft.util.Tables.documents(spark, sf).filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sub = SelectionQueries.splitAssign(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perm = pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(15485863L) + lit(17L),
      lit(2147483647L)) % 100
    val full = graft.util.Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 0)
      .select(col("source"),
        when(perm < 98, "train").when(perm < 99, "validation").otherwise("test").as("split"))
      .groupBy("source", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sub == full)
  }

  test("train_order: audit is layout-independent and covers the corpus exactly once") {
    val base = SelectionQueries.trainOrder(spark, sf).collect()
    val n = graft.util.Tables.documents(spark, sf).count()
    assert(base.map(_.getLong(1)).sum == n, "every doc lands in exactly one shard slot")
    assert(base.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
    // rewriting the corpus with a different partitioning/row order must not
    // move a single slot (the positional checksum pins the ORDER, not just
    // membership)
    val dir = java.nio.file.Files.createTempDirectory("graft_order_fixture").toString
    graft.util.Tables.documents(spark, sf).repartition(7)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val shuffled = SelectionQueries.trainOrder(spark, dir).collect()
    assert(base.map(_.toSeq).toSeq == shuffled.map(_.toSeq).toSeq)
  }

  test("rule_filter: planted fixture attributes each rule and the kept count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rule_fixture").toString
    val good = ("the " + (1 to 29).map(i => f"word$i%02dx").mkString(" ")) // 30 words, 1 stopword, 6-char words
    val rep = Seq.fill(40)("spark").mkString(" ")                          // repetitive, no stopwords
    Seq((1L, "a b", "s1"), (2L, good, "s1"), (3L, rep, "s2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val res = SelectionQueries.ruleFilter(spark, dir).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long])).toMap
    // s1: "a b" fails short+wordlen; the 30-word doc passes all four rules
    assert(res("s1") == Seq(2L, 1L, 0L, 0L, 1L, 1L))
    // s2: the 40x-repeated doc fails low-stopword and repetition
    assert(res("s2") == Seq(1L, 0L, 1L, 1L, 0L, 0L))
  }

  test("dsir: target-vocabulary docs outscore off-target docs; layout-independent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_fixture").toString
    // target (en) speaks alpha/beta; the raw bulk (de) speaks zeta; two
    // probe docs in a third lang share one vocabulary each — DSIR must
    // rank the alpha/beta probe above the zeta probe
    val docs = Seq.tabulate(20)(i => (100L + i, "alpha beta alpha beta", "en")) ++
      Seq.tabulate(20)(i => (200L + i, "zeta zeta zeta zeta", "de")) ++
      Seq((1L, "alpha beta alpha beta", "xx"), (2L, "zeta zeta zeta zeta", "xx"))
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = SelectionQueries.dsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(1L) > w(2L), s"target-like doc must outscore: ${w(1L)} vs ${w(2L)}")
    // (no sign assertion: with B = 4096 smoothing buckets and a ~50-token
    // fixture, add-one smoothing dominates the absolute log-ratio — only
    // the ORDERING is scale-free)
    // identical results from a different physical layout
    val dir2 = java.nio.file.Files.createTempDirectory("graft_dsir_fixture2").toString
    spark.read.parquet(s"$dir/documents.parquet").repartition(13)
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val w2 = SelectionQueries.dsirWeights(spark, dir2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w == w2)
  }

  test("ann_recall: histogram covers all 64 queries and matches a direct recount") {
    val hist = SimilarityQueries.annRecall(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.values.sum == 64L, "every query appears exactly once")
    assert(hist.keys.forall(h => h >= 0 && h <= 5))
    // recount from the two declared pipelines' own outputs
    val bf = SimilarityQueries.cosineTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityQueries.cosineTopKIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = bf.groupBy(_._1)
      .map { case (q, s) => q -> s.count(ivf.contains).toLong }
      .groupBy(_._2).map { case (h, m) => h -> m.size.toLong }
    assert(hist == expected)
  }

  test("knn_graph: mutual flag is symmetric and edges are each vector's ivf top-5") {
    val edges = SimilarityQueries.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val set = edges.map(e => (e._1, e._2)).toSet
    edges.foreach { case (q, c, m) =>
      assert((m == 1L) == set.contains((c, q)),
        s"mutual flag wrong for ($q,$c)")
    }
    // every vector with a non-empty probe neighborhood appears as a query
    val perQuery = edges.groupBy(_._1).view.mapValues(_.length)
    assert(perQuery.values.forall(_ <= 5))
  }

  test("ppl_buckets: per-lang exact terciles with monotone score boundaries") {
    val rows = SelectionQueries.pplBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val byLang = rows.groupBy(_._1)
    // scored population = docs with >= 2 words (those have bigrams)
    val scored = graft.util.Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 2)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq)
      assert(sorted.map(_._3).sum == scored(lang),
        s"$lang bucket sizes must partition the scored docs")
      // exact terciles: sizes differ by at most one
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang sizes $sizes")
      // rank-ordered buckets: a bucket's max score never exceeds the
      // next bucket's min (equality allowed — ties split at the boundary)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4,
          s"$lang bucket ${a._2} max ${a._5} > bucket ${b._2} min ${b._4}")
        case _ =>
      }
    }
  }

  test("diversity_sample: giant cluster downsampled to quota, singletons all kept") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_divsample_fx").toString
    // 6336 copies of one vector (one bucket) + 64 singleton axes:
    // N = 6400 -> budget 640 -> per-bucket quota T = 10
    def axis(i: Int, s: Float) = Array.tabulate(70)(j => if (j == i) s else 0f)
    val giant = Seq.tabulate(6336)(i => (1000L + i, axis(0, 1f)))
    val singles = (0 until 64).map(i => (i.toLong, axis(i + 1, 1f)))
    (giant ++ singles).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SelectionQueries.diversitySample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).sum == 6400L)
    val (giantBuckets, smallBuckets) = rows.partition(_._2 > 10)
    assert(giantBuckets.map(_._2).sum >= 6336L, "clone family dominates its bucket")
    // undersized buckets keep everything
    smallBuckets.foreach { case (b, n, sel, _) =>
      assert(sel == n, s"bucket $b: kept $sel of $n")
    }
    // oversized buckets: selection is EXACTLY the affine-bp rule — recount
    val M = 2147483647L
    def bp(id: Long) = ((id % M) * 15485863L + 17L) % M % 10000L
    giantBuckets.foreach { case (_, n, sel, _) =>
      val ids = if (n >= 6336L) giant.map(_._1) else Seq.empty
      if (ids.nonEmpty) {
        val expect = ids.count(id => bp(id) * n < 10L * 10000L)
        assert(sel.toInt <= expect + 64 && sel >= 1 && sel < n / 10,
          s"giant bucket kept $sel of $n (rule says ~$expect)")
      }
    }
  }

  test("decontam_embed: planted eval copy is flagged at sim 1, orthogonal is not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_decontam_fx").toString
    // 64 eval vectors on distinct axes; corpus: vec 100 copies eval 7
    // (scaled — cosine ignores magnitude), vec 101 is orthogonal to all
    def axis(i: Int, s: Float) =
      Array.tabulate(70)(j => if (j == i) s else 0f)
    val vecs = (0 until 64).map(i => (i.toLong, axis(i, 1f))) ++
      Seq((100L, axis(7, 3f)), (101L, axis(69, 1f)))
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val res = SimilarityQueries.decontamEmbed(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(res.keySet == Set(100L), s"flagged: ${res.keySet}")
    assert(res(100L)._1 == 7L && res(100L)._2 == 1.0)
  }

  test("domain cap: mega-site capped, tail untouched, blocklist absent") {
    val rows = SelectionQueries.domainCap(spark, sf).collect()
    val byHost = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).sorted).toMap
    assert(!byHost.contains("spam.biz") && !byHost.contains("ads.example"),
      "blocklisted hosts leaked through")
    assert(byHost("megasite.example").length == 12, "hot domain not capped at 12")
    // the cap keeps the LOWEST doc_ids — the deterministic survivor rule
    val expectedMega = graft.util.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(id => id % 16 != 0 && id % 16 != 8 && id % 4 != 0)
      .sorted.take(12).toSeq
    assert(byHost("megasite.example").toSeq == expectedMega)
    // tail domains are under cap and pass wholesale (the sort-bypass side)
    byHost.foreach { case (h, ids) =>
      if (h != "megasite.example") assert(ids.length <= 12, s"$h over cap")
    }
  }

  test("domain cap: rank-limit pushdown bounds the hot host's sort input (WindowGroupLimit present)") {
    // the 100 TB guarantee: the rank filter must push a PARTIAL
    // per-input-partition top-cap below the window's exchange, so the
    // mega-site's reducer sorts <= cap*partitions rows, never the corpus
    val plan = SelectionQueries.domainCap(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing — hot-host sort is corpus-sized:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tail bypass (broadcast anti-join) missing:\n$plan")
  }

  test("domain cap: output is layout-invariant under an adversarial partition count") {
    val base = SelectionQueries.domainCap(spark, sf).collect().toSeq
    val weird = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try SelectionQueries.domainCap(spark, sf).collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(base == weird, "domain cap output depends on partition layout")
  }

  test("url_dedup_v2: every canonicalization rule verified on the real output") {
    val out = SelectionQueries.urlDedupV2(spark, sf).collect()
    val urls = out.map(_.getString(0))
    assert(urls.nonEmpty)
    // default-port strip is scheme-aware: no :443 survives, :8443 MUST
    assert(urls.forall(u => !u.contains(":443/") && !u.endsWith(":443")),
      "default https port survived canonicalization")
    assert(urls.exists(_.contains(":8443")), "non-default port was wrongly stripped")
    // trailing slash normalized (no root-path URL in the synthesized set)
    assert(urls.forall(u => !u.endsWith("/")), "trailing slash survived")
    // trackers + fragments dropped; scheme/host lowercased
    assert(urls.forall(u => !u.contains("utm_") && !u.contains("#")))
    assert(urls.forall(u => u.substring(0, u.indexOf('/', 8)) ==
      u.substring(0, u.indexOf('/', 8)).toLowerCase), "host not lowercased")
    // kept query params are sorted
    urls.filter(_.contains("?")).foreach { u =>
      val ps = u.substring(u.indexOf('?') + 1).split("&").toSeq
      assert(ps == ps.sorted, s"params not sorted in $u")
    }
    // partition of the corpus: copy counts sum to the doc count
    assert(out.map(_.getLong(2)).sum ==
      graft.util.Tables.documents(spark, sf).count())
  }
}
