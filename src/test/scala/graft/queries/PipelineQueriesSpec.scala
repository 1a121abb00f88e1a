package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions
import graft.operators.{Components, Dedup}

/** Crafted-fixture semantics for the round-6 pipeline family — the oracle
  * hash-checks the declared queries on the real tables; here we pin the
  * properties on inputs where the right answer is computable by hand. */
class PipelineQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("strict shingles: short docs contribute zero shingles, not a pseudo-shingle") {
    val df = Seq((1L, "a b c d e f"), (2L, "too short")).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.wordShinglesStrict(col("text"), 5).as("sh"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c d e", "b c d e f"))
    assert(got(2L).isEmpty)
  }

  test("cluster resolution retires transitive members the pair list never connects") {
    // a~b and b~c emitted, a~c NOT emitted: c must still join a's cluster
    val ids = Seq(10L, 11L, 12L, 99L).toDF("doc_id")
    val pairs = Seq((10L, 11L), (11L, 12L)).toDF("id_a", "id_b")
    val comp = Components.clusters(ids, "doc_id", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("decontamination flags exactly the docs sharing a 5-gram with the benchmark") {
    // doc 20 is "benchmark" (doc_id % 20 == 0); doc 1 copies one of its
    // 5-grams verbatim, doc 2 shares only 4-gram-length overlap, doc 3 is
    // disjoint. Fixture mirrors the declared query's shape end-to-end.
    val docs = Seq(
      (20L, "alpha beta gamma delta epsilon zeta"),
      (1L, "intro words alpha beta gamma delta epsilon outro"),
      (2L, "beta gamma delta epsilon different tail here"),
      (3L, "entirely unrelated content with many words")
    ).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      explode(TextFunctions.wordShinglesStrict(col("text"), 5)).as("shingle"))
    val bench = sh.filter(col("doc_id") % 20 === 0).select("shingle").distinct()
    val flagged = sh.filter(col("doc_id") % 20 =!= 0)
      .join(broadcast(bench), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 contains "alpha beta gamma delta epsilon" (and "beta gamma delta
    // epsilon" is only 4 words — no hit for doc 2)
    assert(flagged == Map(1L -> 1L))
  }

  test("stratified sample is reproducible under repartitioning and rate-accurate") {
    val docs = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "es"))
      .toDF("doc_id", "lang")
    def sample(parts: Int): Seq[Long] = {
      val bp = pmod(col("doc_id") * lit(15485863L) + lit(17L), lit(2147483647L)) % 10000
      val rate = when(col("lang") === "en", 5000).otherwise(1000)
      docs.repartition(parts).filter(bp < rate)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    }
    val s1 = sample(1)
    val s64 = sample(64)
    assert(s1 == s64)
    val en = s1.count(_ % 2 == 0) / 2000.0
    val es = s1.count(_ % 2 == 1) / 2000.0
    assert(math.abs(en - 0.5) < 0.05, s"en rate $en")
    assert(math.abs(es - 0.1) < 0.03, s"es rate $es")
  }

  test("tfidf ranks a document's distinguishing term above corpus-wide terms") {
    val d = TestSpark.sf
    val top = PipelineQueries.tfidfTopTerms(spark, d)
    // rank column is dense 1..3 per doc and scores are non-increasing
    val byDoc = top.collect().groupBy(_.getLong(0))
    byDoc.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("dedup clusters: canonical flag marks exactly one survivor per cluster") {
    val d = TestSpark.sf
    val out = PipelineQueries.dedupClusters(spark, d).collect()
    val byComp = out.groupBy(_.getLong(1))
    byComp.foreach { case (compId, rows) =>
      assert(rows.count(_.getInt(3) == 1) == 1, s"component $compId")
      assert(rows.find(_.getInt(3) == 1).get.getLong(0) == compId)
      assert(rows.forall(_.getLong(2) == rows.length))
    }
  }

  test("orc ingest: pushdown and pruning reach the ORC scan; values match parquet") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf
    val df = PipelineQueries.orcIngest(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the filter must be INSIDE the ORC reader, not a post-scan Filter only
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
      s"ORC scan did not receive the pushed filter:\n$plan")
    // the written table carries l_quantity; the query never reads it — the
    // ORC ReadSchema must exclude it (column pruning through the format)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_quantity"),
      s"l_quantity not pruned from the ORC scan: $readSchema")
    // format parity against the parquet-native aggregate, value for value
    val viaParquet = graft.util.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R")
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_orderkey")).as("key_sum"),
        sum(col("l_linenumber").cast("long")).as("line_sum"))
      .orderBy("l_linestatus").collect().toSeq
    assert(df.collect().toSeq == viaParquet && viaParquet.nonEmpty)
  }

  test("binary ingest: files round-trip through the binaryFile source, glob filters junk") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf
    val rows = PipelineQueries.binaryIngest(spark, sf).collect()
    // the 1-in-97 sample of the tier's docs, every file parsed
    val expectIds = graft.util.Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 === 0).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows.map(_.getLong(0)).toSeq == expectIds && expectIds.nonEmpty)
    // README.txt exists on disk but the pathGlobFilter kept it out of the
    // scan: every row parsed as a BMP with the fixed synthesized size
    assert(rows.forall(_.getLong(1) == 278L))
    // file BYTES hash exactly like the in-engine payload column path
    val viaColumn = graft.queries.TextQueries.imagePayloads(spark, sf)
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"),
        graft.operators.Multimodal.dhashHex(col("payload")).as("dhash"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach(r => assert(viaColumn(r.getLong(0)) == r.getString(2),
      s"doc ${r.getLong(0)}: file-byte dhash differs from the column path"))
  }
}
