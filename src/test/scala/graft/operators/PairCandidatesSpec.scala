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

  test("edit-distance candidate count grows ~linearly when the block doubles") {
    val c1 = PairCandidates.editDistanceCandidates(editCorpus(60, withShort = false), maxDist = 10).count()
    val c2 = PairCandidates.editDistanceCandidates(editCorpus(120, withShort = false), maxDist = 10).count()
    val quad2 = 120L * 119 / 2
    assert(c2 <= 3 * c1 + 10, s"candidate growth not linear: $c1 -> $c2")
    assert(c2 < quad2 / 10, s"candidates ($c2) are within 10x of block-squared ($quad2)")
  }
}
