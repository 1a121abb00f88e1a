package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Crafted-duplicate tests for the dedup family — the oracle can't check
  * MinHash/SimHash (no shared hash function with DuckDB), so correctness is
  * pinned here on inputs with known near-duplicate structure. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the river bank today"
  private lazy val docs = Seq(
    (0L, base),
    (1L, base),                                                   // exact dup of 0
    (2L, base.replace("today", "tonight")),                       // near dup of 0/1
    (3L, "completely different content about spark catalyst optimizer rules and physical plans"),
    (4L, "The  quick brown fox, jumps over the lazy dog near the river bank today!") // normalized dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps one row per distinct text") {
    assert(Dedup.exact(docs, Seq("text")).count() == 4) // 0/1 collapse
  }

  test("fingerprint dedup also collapses the punctuation/case/whitespace variant") {
    val kept = Dedup.exactByFingerprint(docs, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.size == 3) // {0,1,4} collapse to one survivor
    assert(kept.contains(3L) && kept.contains(2L))
  }

  test("fingerprint dedup with keepBy keeps the lowest doc_id deterministically") {
    val kept = Dedup.exactByFingerprint(docs, "text", keepBy = Seq("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L, 3L)) // 0 survives its {0,1,4} cluster
  }

  test("minhash signatures are invariant to input partitioning (map-only)") {
    val a = Dedup.withMinhashSignature(docs, "text")
      .select("doc_id", "minhash_sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Dedup.withMinhashSignature(docs.repartition(7), "text")
      .select("doc_id", "minhash_sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }

  test("minhash LSH finds exact and near duplicates, not the unrelated doc") {
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      s"near dup pairs missing from $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"false positive with unrelated doc: $pairs")
  }

  test("identical texts have identical minhash signatures") {
    val sigs = Dedup.withMinhashSignature(docs, "text")
      .select("doc_id", "minhash_sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
  }

  test("simhash: exact dups at hamming 0, near dups close, unrelated far") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(1L)) == 0)
    assert(ham(sigs(0L), sigs(2L)) <= 12, s"near dup too far: ${ham(sigs(0L), sigs(2L))}")
    assert(ham(sigs(0L), sigs(3L)) > 12, s"unrelated too close: ${ham(sigs(0L), sigs(3L))}")
  }

  test("simhash near-dup pairs surface the duplicate cluster") {
    val pairs = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 12)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccard pairs: blocked pairwise similarity ranks near dups first") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", lit(1), threshold = 0.3)
      .orderBy(col("jaccard").desc)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(pairs.head._1 == ((0L, 1L)) && pairs.head._2 == 1.0)
    assert(pairs.map(_._1).contains((0L, 2L)))
  }

  test("jaccard near-dup edges close the same components as the expanded pairs") {
    // clone-planted fixture; the collapsed STAR-EDGE formulation is forced
    // through the spec twin (the public dispatch's volume floor routes a
    // fixture-scale input DIRECT, where edges ≡ pairs trivially — asserted
    // last). The empty docs form their own clone group (words("") = [""],
    // J = 1) that must merge with nothing else.
    val clones = (0L to 39L).map(i => (i, base)) ++
      (40L to 79L).map(i => (i, base.replace("today", "tonight"))) ++
      Seq((80L, "completely different content about catalyst rules"), (81L, ""), (82L, ""))
    val df = clones.toDF("doc_id", "text")
    val prepared0 = df.select(col("doc_id").as("id"), lit("b").as("block"),
      array_sort(graft.functions.TextFunctions.words(col("text"))).as("w"))
    def comps(edges: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Components.clusters(df.select("doc_id"), "doc_id", edges, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPairs = comps(Dedup.jaccardPairs(df, "doc_id", "text", lit(1), 0.3)
      .select("id_a", "id_b"))
    val viaStars = comps(Dedup.jaccardNearDupEdgesCollapsed(prepared0, 0.3, 1024))
    assert(viaStars == viaPairs)
    assert(viaStars(81L) == 81L && viaStars(82L) == 81L) // empty-doc clone pair, isolated
    assert(viaStars(80L) == 80L)                         // unrelated doc: singleton
    assert(viaStars(0L) == 0L && viaStars(79L) == 0L)    // near-dup clones merge
    // the point of the formulation: linear, not quadratic, in clone count
    val nEdges = Dedup.jaccardNearDupEdgesCollapsed(prepared0, 0.3, 1024).count()
    val nPairs = Dedup.jaccardPairs(df, "doc_id", "text", lit(1), 0.3).count()
    assert(nEdges < nPairs / 10, s"edges=$nEdges pairs=$nPairs")
    // fixture-scale dispatch routes direct: the edge list IS the pair list
    val dispatched = Dedup.jaccardNearDupEdges(df, "doc_id", "text", lit(1), 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairSet = Dedup.jaccardPairs(df, "doc_id", "text", lit(1), 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dispatched == pairSet)
  }

  test("minhash near-dup plan shuffles band keys, not raw-text cross joins") {
    val plan = Dedup.minhashNearDuplicates(docs, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      s"dedup must not cross-join:\n$plan")
  }
}
