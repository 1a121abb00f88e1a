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
}
