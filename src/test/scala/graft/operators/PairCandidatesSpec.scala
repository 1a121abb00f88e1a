package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

/** Lossless-ness and scale-shape tests for the sub-quadratic candidate
  * filters that replaced block² pairing (round-3 headline): the filters
  * must find EVERY true pair the naive all-pairs scan finds, and the
  * candidate count must grow ~linearly (not quadratically) when a block
  * doubles. */
class PairCandidatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  /** Naive block² reference: every same-block pair, id_a < id_b. */
  private def allPairs(docs: DataFrame): DataFrame = {
    val a = docs.select(col("block"), col("id").as("id_a"))
    val b = docs.select(col("block"), col("id").as("id_b"))
    a.join(b, Seq("block")).filter(col("id_a") < col("id_b")).select("id_a", "id_b")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // ---- Jaccard prefix filter -------------------------------------------

  /** n docs in ONE block: unrelated docs draw from a shared skewed vocab
    * (so prefixes DO collide sometimes — the realistic case), plus one
    * planted near-dup per 10 docs. */
  private def jaccardCorpus(n: Int): DataFrame = {
    val docs = (0 until n).map { i =>
      if (i % 10 == 9) // near-dup of the previous doc: one word changed
        (i.toLong, jaccardText(i - 1) + " changed")
      else (i.toLong, jaccardText(i))
    }
    docs.toDF("id", "text")
      .select(col("id"), lit("b").as("block"),
        array_sort(TextFunctions.words(col("text"))).as("w"))
  }
  // 25 unique tokens per doc + 3 corpus-wide common tokens: enough unique
  // mass that the common tokens land in the excluded suffix of the rarity
  // ordering (at t=0.2 the prefix keeps ~80% of tokens), so unrelated docs
  // do not collide through "common the and"
  private def jaccardText(i: Int): String =
    (0 until 25).map(j => s"w${i}_$j").mkString(" ") + " common the and"

  test("jaccard prefix candidates contain every true pair (lossless)") {
    val corpus = jaccardCorpus(60)
    val threshold = 0.2
    val truePairs = pairSet(
      allPairs(corpus)
        .join(corpus.select(col("id").as("id_a"), col("w").as("w_a")), Seq("id_a"))
        .join(corpus.select(col("id").as("id_b"), col("w").as("w_b")), Seq("id_b"))
        .filter(TextFunctions.sortedJaccard(col("w_a"), col("w_b")) >= threshold))
    val candidates = pairSet(PairCandidates.jaccardPrefixCandidates(corpus, threshold))
    val missed = truePairs -- candidates
    assert(missed.isEmpty, s"prefix filter lost true pairs: $missed")
  }

  test("jaccard candidate count grows ~linearly when the block doubles") {
    val c1 = PairCandidates.jaccardPrefixCandidates(jaccardCorpus(60), 0.2).count()
    val c2 = PairCandidates.jaccardPrefixCandidates(jaccardCorpus(120), 0.2).count()
    val quad2 = 120L * 119 / 2
    assert(c2 <= 3 * c1 + 10, s"candidate growth not linear: $c1 -> $c2")
    assert(c2 < quad2 / 10, s"candidates ($c2) are within 10x of block-squared ($quad2)")
  }

  test("jaccardPairs through the prefix filter matches the naive all-pairs scan") {
    val n = 50
    val raw = (0 until n).map { i =>
      if (i % 7 == 6) (i.toLong, jaccardText(i - 1)) // exact near-dup
      else (i.toLong, jaccardText(i))
    }.toDF("doc_id", "text")
    // autoBlockBound = 1 forces the PREFIX path even on this small block
    val got = Dedup.jaccardPairs(raw, "doc_id", "text", lit("b"), threshold = 0.2,
        autoBlockBound = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // naive reference: block² + exact Jaccard, no candidate filter
    val prepared = raw.select(col("doc_id").as("id"), lit("b").as("block"),
      array_sort(TextFunctions.words(col("text"))).as("w"))
    val want = allPairs(prepared)
      .join(prepared.select(col("id").as("id_a"), col("w").as("w_a")), Seq("id_a"))
      .join(prepared.select(col("id").as("id_b"), col("w").as("w_b")), Seq("id_b"))
      .withColumn("jaccard", TextFunctions.sortedJaccard(col("w_a"), col("w_b")))
      .filter(col("jaccard") >= 0.2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard"))).toSet
    assert(got == want)
  }

  test("dup-factor probe: ≈1 on all-unique keys, ≈clone multiple on clone-heavy") {
    PairCandidates.invalidateStats()
    val uniq = (0 until 500).map(i => s"u$i").toDF("k")
    val fUniq = PairCandidates.dupFactor(uniq)
    assert(fUniq <= 1.1, s"all-unique probe read $fUniq")
    assert(!PairCandidates.shouldCollapse(uniq))
    val clones = (0 until 500).map(i => s"c${i % 50}").toDF("k")
    val fClones = PairCandidates.dupFactor(clones)
    assert(fClones >= 5.0, s"10x-clone probe read $fClones")
    assert(PairCandidates.shouldCollapse(clones))
    // memoized: a second call over the same plan must hit the cache
    val before = PairCandidates.statsSize
    PairCandidates.dupFactor(clones)
    assert(PairCandidates.statsSize == before)
  }

  test("blocked collapse gate: volume floor keeps fixture-scale corpora direct") {
    PairCandidates.invalidateStats()
    // maximally clone-heavy (one key, one block) but sp2 = 250 000 — far
    // under the 5e6 floor: the collapse's fixed passes can't pay for
    // themselves at this volume, so the gate must route direct
    val tinyClones = (0 until 500).map(_ => ("b", "same")).toDF("block", "k")
    assert(!PairCandidates.shouldCollapseBlocked(tinyClones))
  }

  test("gate routing is pinned on both fixture shapes (VERDICT r9 #5)") {
    PairCandidates.invalidateStats()
    import spark.implicits._
    // clone-light but over the volume floor (one 3000-row block, all keys
    // distinct): sp2 = 9e6 ≥ floor but ratio = 1 < 1.05 → must route DIRECT.
    // A threshold edit that re-introduces the r8 unconditional collapse
    // (or drops the ratio bound) fails here.
    val uniq = (0 until 3000).map(i => ("b", s"u$i", i.toLong)).toDF("block", "k", "id")
    def skel(df: org.apache.spark.sql.DataFrame)() = graft.util.Snapshots.snap(
      df.groupBy("block", "k").agg(count(lit(1)).as("g"), min(col("id")).as("rep_id")))
    val (stUniq, skUniq) = PairCandidates.blockedStatsFor(uniq.select("block", "k"), skel(uniq))
    assert(!stUniq.collapse, "clone-light over-floor corpus must route direct")
    assert(stUniq.maxBlockRows == 3000L && stUniq.maxBlockReps == 3000L)
    assert(skUniq.nonEmpty, "memo miss must hand back the built skeleton")
    // clone-heavy over the floor (same volume, 100 distinct keys):
    // ratio = 9e6 / 1e4 = 900 → must route COLLAPSE. A threshold edit that
    // disables the collapse for genuinely clone-heavy corpora fails here.
    val clones = (0 until 3000).map(i => ("b", s"c${i % 100}", i.toLong)).toDF("block", "k", "id")
    val (stClones, _) = PairCandidates.blockedStatsFor(clones.select("block", "k"), skel(clones))
    assert(stClones.collapse, "clone-heavy over-floor corpus must route collapse")
    assert(stClones.maxBlockRows == 3000L && stClones.maxBlockReps == 100L)
    // memo hit: stats return without rebuilding the skeleton
    val (stAgain, skAgain) = PairCandidates.blockedStatsFor(clones.select("block", "k"),
      () => fail("memo hit must not rebuild the skeleton"))
    assert(stAgain == stClones && skAgain.isEmpty)
    // the LAZY probe variant (no materialization) must read the same stats
    PairCandidates.invalidateStats()
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("block", "k").agg(count(lit(1)).as("g"), min(col("id")).as("rep_id"))
    val pUniq = PairCandidates.blockedStatsProbe(uniq.select("block", "k"), plan(uniq))
    val pClones = PairCandidates.blockedStatsProbe(clones.select("block", "k"), plan(clones))
    assert(pUniq == stUniq && pClones == stClones,
      s"lazy probe diverged from materialized stats: $pUniq / $pClones")
  }

  test("gates route empty inputs direct instead of throwing (ADVICE r9)") {
    PairCandidates.invalidateStats()
    import spark.implicits._
    val emptyK = Seq.empty[String].toDF("k")
    assert(!PairCandidates.shouldCollapse(emptyK)) // was: NPE on null sum
    val emptyBlocked = Seq.empty[(String, String, Long)].toDF("block", "k", "id")
    val (st, _) = PairCandidates.blockedStatsFor(emptyBlocked.select("block", "k"),
      () => graft.util.Snapshots.snap(
        emptyBlocked.groupBy("block", "k").agg(count(lit(1)).as("g"))))
    assert(!st.collapse && st.maxBlockRows == 0L && st.maxBlockReps == 0L)
    // ... and the empty-input similarity operators return empty, not crash
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.cosineNearDuplicates(emptyVecs, 0.5).count() == 0L)
  }

  test("jaccard md5-key collapse is output-invariant vs the direct formulation") {
    // clone-heavy block: 3 families of 10 plus near-dups and singletons —
    // at this fixture volume the blocked gate's floor routes the public
    // dispatch DIRECT (sp2 ≪ 5e6); both formulations are output-equal, so
    // the dispatched result must match whichever strategy runs
    val raw = (0 until 50).map { i =>
      if (i < 30) (i.toLong, jaccardText(1000 + i % 3)) // 3 clone families
      else if (i % 7 == 6) (i.toLong, jaccardText(i - 1) + " changed")
      else (i.toLong, jaccardText(i))
    }.toDF("doc_id", "text")
    val prepared0 = raw.select(col("doc_id").as("id"), lit("b").as("block"),
      array_sort(TextFunctions.words(col("text"))).as("w"))
    def run(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = run(Dedup.jaccardPairsDirect(prepared0, 0.2, 1024))
    val collapsed = run(Dedup.jaccardPairsCollapsed(prepared0, 0.2, 1024))
    assert(direct.nonEmpty)
    // clone families must pair within AND across to their near-dups
    assert(direct.exists { case (a, b, j) => a == 0L && b == 3L && j == 1.0 })
    assert(collapsed == direct,
      s"collapse diverged: only-direct=${direct -- collapsed} only-collapsed=${collapsed -- direct}")
    val dispatched = run(Dedup.jaccardPairs(raw, "doc_id", "text", lit("b"), 0.2))
    assert(dispatched == direct)
  }

  test("auto strategy (blocked path) agrees with the forced prefix path") {
    val raw = (0 until 40).map { i =>
      if (i % 5 == 4) (i.toLong, jaccardText(i - 1) + " changed")
      else (i.toLong, jaccardText(i))
    }.toDF("doc_id", "text")
    def run(bound: Int) =
      Dedup.jaccardPairs(raw, "doc_id", "text", lit("b"), 0.2, autoBlockBound = bound)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(1024) == run(1)) // blocked vs prefix: identical pair set
  }

  // ---- Edit-distance q-gram filter -------------------------------------

  private def randomString(len: Int): String =
    (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  /** One block: random 40-char strings (share only chance bigrams) plus
    * planted 3-edit variants; `withShort` mixes in SHORT strings (the
    * bound-≤-0 path, which deliberately pairs all-with-all among shorts —
    * so the growth test excludes them). */
  private def editCorpus(n: Int, withShort: Boolean): DataFrame = {
    val base = (0 until n).map { i => (i.toLong, randomString(40)) }
    val withDups = base.map { case (i, s) =>
      if (i % 10 == 9) (i, base((i - 1).toInt)._2.updated(5, '#').updated(20, '#').updated(35, '#'))
      else if (withShort && i % 10 == 4) (i, s.take(12)) // short string, no bigram bound
      else (i, s)
    }
    withDups.toDF("id", "s").select(col("id"), lit("b").as("block"), col("s"))
  }

  test("edit-distance candidates contain every true pair, incl. short strings") {
    val corpus = editCorpus(60, withShort = true)
    val truePairs = pairSet(
      allPairs(corpus)
        .join(corpus.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
        .join(corpus.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
        .filter(levenshtein(col("s_a"), col("s_b")) <= 10))
    assert(truePairs.nonEmpty, "fixture should plant at least one true pair")
    val candidates = pairSet(PairCandidates.editDistanceCandidates(corpus, maxDist = 10))
    val missed = truePairs -- candidates
    assert(missed.isEmpty, s"q-gram filter lost true pairs: $missed")
  }

  test("rewriting the data behind the same path re-probes without invalidateStats") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blockstats_").toString
    def blocked = spark.read.parquet(dir)
      .select(col("id"), col("block"))
    (0L until 10L).map(i => (i, "b")).toDF("id", "block")
      .write.mode("overwrite").parquet(dir)
    assert(PairCandidates.maxBlockSize(blocked) == 10L)
    // regenerate LARGER data at the same path — same plan shape, same
    // semanticHash; only the file listing differs. The memo key must see it.
    (0L until 2000L).map(i => (i, "b")).toDF("id", "block")
      .repartition(3).write.mode("overwrite").parquet(dir)
    assert(PairCandidates.maxBlockSize(blocked) == 2000L,
      "stale max-block-size survived a data rewrite at the same path")
  }

  test("strategy-stat memo is bounded and keeps working across flushes") {
    PairCandidates.invalidateStats()
    (0 until PairCandidates.statsCap * 3).foreach { i =>
      PairCandidates.memoizedStat("spec-key-" + i)(i.toLong)
    }
    assert(PairCandidates.statsSize <= PairCandidates.statsCap)
    assert(PairCandidates.memoizedStat("spec-key-again")(42L) == 42L)
  }

  test("passjoin candidates contain every true pair, incl. short and mixed-length strings") {
    // mixed lengths exercise the inventory-pruned probe (l1 < len) and the
    // zero-length-segment degeneration (len < tau+1); the planted DELETION
    // variants (Δ = 4, 9) pin the length-aware shift bound at Δ > 0
    val base60 = editCorpus(60, withShort = true)
    val delVariants = base60.filter(col("id").isin(0L, 11L, 22L))
      .select((col("id") + 1000L).as("id"), col("block"),
        when(col("id") === 22L, expr("substr(s, 10)"))    // 9 leading dels
          .otherwise(expr("substr(s, 1, length(s) - 4)")) // 4 trailing dels
          .as("s"))
    val corpus = base60.unionByName(delVariants)
    val truePairs = pairSet(
      allPairs(corpus)
        .join(corpus.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
        .join(corpus.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
        .filter(levenshtein(col("s_a"), col("s_b")) <= 10))
    assert(truePairs.nonEmpty, "fixture should plant at least one true pair")
    val candidates = PairCandidates.passJoinCandidates(corpus, maxDist = 10)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truePairs -- candidates
    assert(missed.isEmpty, s"passjoin filter lost true pairs: $missed")
  }

  test("passjoin carries the verbatim strings and is far below block-squared") {
    val corpus = editCorpus(200, withShort = false)
    val cand = PairCandidates.passJoinCandidates(corpus, maxDist = 10)
    // strings ride along so the DP needs no join-back
    val byId = corpus.select(col("id"), col("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    cand.collect().foreach { r =>
      assert(r.getString(2) == byId(r.getLong(0)) && r.getString(3) == byId(r.getLong(1)))
    }
    // distinct candidate pairs must stay well under the naive pair space
    val n = cand.select(least(col("id_a"), col("id_b")), greatest(col("id_a"), col("id_b")))
      .distinct().count()
    val quad = 200L * 199 / 2
    assert(n < quad / 10, s"segment filter not selective: $n of $quad pairs")
  }

  test("passjoin plans a hash join — the pair-shaped output is never sorted or spilled") {
    // the 100 TB claim: candidates stream into the DP; a sort-merge join
    // would sort (and under pressure spill) the probe set AND buffer the
    // pair-shaped output through its sorters
    val plan = PairCandidates.passJoinCandidates(editCorpus(60, withShort = false), maxDist = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected a shuffled hash join for the segment match:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"segment match must not sort-merge:\n$plan")
  }

  test("levenshtein query: exact-prefix collapse + 51-id truncation is output-invariant") {
    // documents fixture: a 60-clone prefix family (exercises the 51-id
    // expansion bound — ids 52..60 of the family can never reach a top-50
    // and must be provably absent), a 5-clone family, planted few-edit
    // variants, and unrelated strings. Reference = brute-force all-pairs.
    val prefixes = (0 until 30).map(_ => randomString(40))
    val bigClone = randomString(40)
    val smallClone = randomString(40)
    val variant = bigClone.updated(3, '#').updated(17, '#')
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    (0 until 30).foreach(i => docs += ((i.toLong, prefixes(i))))
    (100 until 160).foreach(i => docs += ((i.toLong, bigClone)))   // 60 clones
    (200 until 205).foreach(i => docs += ((i.toLong, smallClone))) // 5 clones
    docs += ((300L, variant))
    val dir = java.nio.file.Files.createTempDirectory("graft_lev_inv").toString
    val df = docs.toSeq.toDF("doc_id", "p")
      .select(col("doc_id"),
        concat(col("p"), lit(" tail text beyond the prefix")).as("text"),
        lit("en").as("lang"), lit(68).as("n_chars"))
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.SimilarityQueries.levenshteinPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // brute force: every same-block pair (single block here), lev <= 10
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val byId = docs.toSeq.toMap
    val idsAll = docs.map(_._1).sorted
    val want = (for {
      i <- idsAll; j <- idsAll if i < j
      l = lev(byId(i).take(40), byId(j).take(40)) if l <= 10
    } yield (i, j, l)).sortBy(t => (t._3, t._1, t._2)).take(50)
    assert(got == want,
      s"collapse changed the top-50: got=${got.take(5)}… want=${want.take(5)}…")
    // the 60-clone family alone holds >50 lev-0 pairs, so the whole output
    // is lev 0 from ids 100..151 — the truncation bound in action
    assert(got.forall(_._3 == 0) && got.size == 50)

    // second fixture: few enough clones that CROSS-group pairs (clone
    // family × its few-edit variant) must survive expansion + re-normalize.
    // A 9-clone family stays — dup factor 45/33 ≈ 1.36 ≥ the 1.25 bound, so
    // the cost gate still routes this fixture through the collapse path
    // (the expansion machinery is what it exists to pin) — while its 36
    // lev-0 pairs plus the 5-family's 10 leave top-50 room for lev>0.
    val docs2 = docs.filterNot { case (id, _) => id >= 109 && id < 160 }
    val dir2 = java.nio.file.Files.createTempDirectory("graft_lev_inv2").toString
    docs2.toSeq.toDF("doc_id", "p")
      .select(col("doc_id"),
        concat(col("p"), lit(" tail text beyond the prefix")).as("text"),
        lit("en").as("lang"), lit(68).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val got2 = graft.queries.SimilarityQueries.levenshteinPairs(spark, dir2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val ids2 = docs2.map(_._1).sorted
    val want2 = (for {
      i <- ids2; j <- ids2 if i < j
      l = lev(byId(i), byId(j)) if l <= 10
    } yield (i, j, l)).sortBy(t => (t._3, t._1, t._2)).take(50)
    assert(got2 == want2)
    assert(got2.exists(_._3 > 0), "fixture 2 must surface a cross-group pair")
  }

  test("edit-distance candidate count grows ~linearly when the block doubles") {
    val c1 = PairCandidates.editDistanceCandidates(editCorpus(60, withShort = false), maxDist = 10).count()
    val c2 = PairCandidates.editDistanceCandidates(editCorpus(120, withShort = false), maxDist = 10).count()
    val quad2 = 120L * 119 / 2
    assert(c2 <= 3 * c1 + 10, s"candidate growth not linear: $c1 -> $c2")
    assert(c2 < quad2 / 10, s"candidates ($c2) are within 10x of block-squared ($quad2)")
  }
}
