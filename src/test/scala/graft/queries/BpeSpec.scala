package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the BPE merge-fit contracts added for VERDICT r12 #4 / ADVICE r12
  * #2: the K-merge fit runs ONCE per (dataset, iters, k) however many of
  * q_bpe_train / q_bpe_tokenize consume it, and a corpus whose capped
  * vocabulary runs dry mid-loop stops with the merges found so far
  * instead of crashing on an empty argmax frame. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDocs(rows: Seq[(Long, String, String)], dir: String): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("the merge fit is memoized: train + tokenize + train = one fit") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_memo").toString
    writeDocs(Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog the the"),
      (2L, "en", "pack my box with five dozen liquor jugs the fox"),
      (3L, "de", "der schnelle braune fuchs springt the fox the")), dir)
    val before = TextQueries.bpeFitCount.get()
    val train1 = TextQueries.bpeTrain(spark, dir).collect()
    val tok = TextQueries.bpeTokenize(spark, dir).collect()
    val train2 = TextQueries.bpeTrain(spark, dir).collect()
    assert(TextQueries.bpeFitCount.get() - before == 1L,
      "three consumers re-ran the merge fit instead of sharing one")
    assert(train1.toSeq == train2.toSeq)
    assert(train1.nonEmpty && tok.nonEmpty)
  }

  test("a vocabulary that runs dry stops the loop with the merges so far") {
    // every word is exactly 2 chars: merge 1 collapses each top pair to a
    // 1-char sentinel, the length>=2 filter then empties the vocabulary,
    // and iteration 2's argmax frame is EMPTY — pre-fix this threw
    // NoSuchElementException from head()
    val dir = java.nio.file.Files.createTempDirectory("bpe_dry").toString
    writeDocs(Seq(
      (1L, "en", "ab ab ab ab"),
      (2L, "en", "ab ab cd")), dir)
    val merges = TextQueries.bpeTrain(spark, dir).collect()
    // "ab" dominates; after merging it only "cd" (count 1) survives round 2,
    // then nothing — strictly fewer than the 8 requested merges, no crash
    assert(merges.nonEmpty && merges.length < 8,
      s"expected an early stop, got ${merges.length} merges")
    assert(merges.head.getString(1) == "ab")
  }

  test("batched fit with batch=1 IS the exact fitter, argmax for argmax") {
    import spark.implicits._
    val words = Seq(("thee", 10L), ("heed", 7L), ("deed", 5L), ("abab", 4L))
      .toDF("w", "word_cnt")
    val exact = TextQueries.bpeFitWords(words, iters = 8)
    val batched = TextQueries.bpeFitWordsBatched(words, iters = 8, batch = 1)
    assert(batched == exact, s"batch=1 diverged:\n$batched\nvs\n$exact")
    assert(exact.nonEmpty)
  }

  test("a batch pass accepts only symbol-disjoint pairs and defers the rest") {
    import spark.implicits._
    // pair counts: "ab"=10, "cd"=8, "ce"=5 — "ce" shares 'c' with the
    // higher-ranked "cd", so pass 1 must accept {ab, cd} and leave "ce"
    // for pass 2; the merge SEQUENCE equals the exact fitter's (each
    // accepted count is provably the pass-start count)
    val words = Seq(("ab", 10L), ("cd", 8L), ("ce", 5L)).toDF("w", "word_cnt")
    val before = TextQueries.bpeBatchPassCount.get()
    val batched = TextQueries.bpeFitWordsBatched(words, iters = 3, batch = 3)
    val passes = TextQueries.bpeBatchPassCount.get() - before
    assert(batched.map(m => (m._1, m._2, m._3)) ==
      Seq((1L, "ab", 10L), (2L, "cd", 8L), (3L, "ce", 5L)))
    assert(passes == 2L, s"expected 2 passes (ab+cd, then ce), got $passes")
    assert(batched == TextQueries.bpeFitWords(words, iters = 3),
      "disjoint-batched sequence diverged from the exact fitter on a " +
        "corpus where every accepted count is the pass-start count")
  }

  test("deep fits use PUA sentinels that cannot collide with text or space") {
    import spark.implicits._
    // 40 distinct dominant pairs — a fit past merge 31 with chr(j)
    // sentinels would emit chr(32) (the SPACE the corpus splits on) and
    // then printable bytes that collide with real text; the PUA sentinel
    // keeps every merge id unambiguous
    val words = (0 until 40).map { i =>
      // 80 distinct symbols → every pair is disjoint from every other, so
      // each pass accepts its full batch and the merge order is the
      // global count order
      val c1 = (0x100 + 2 * i).toChar
      val c2 = (0x100 + 2 * i + 1).toChar
      (s"$c1$c2", (1000 - i).toLong)
    }.toDF("w", "word_cnt")
    val merges = TextQueries.bpeFitWordsBatched(words, iters = 40, batch = 16,
      sentinelOf = TextQueries.puaSentinel)
    assert(merges.length == 40, s"expected 40 merges, got ${merges.length}")
    // counts are strictly the constructed ones — no sentinel collision
    // ever inflated a later pair's count
    assert(merges.map(_._3) == (0 until 40).map(i => (1000 - i).toLong),
      "a sentinel collision perturbed the merge counts")
    assert(merges.map(_._2).distinct.length == 40)
  }
}
