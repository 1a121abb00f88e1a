package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity
import graft.util.Tables

/** Streaming ANN index maintenance: vectors stream in, get cell-assigned
  * map-only, land in a cell-partitioned layout, and batch queries search
  * it with zero assignment cost — equal to the all-batch pipeline. */
class AnnIndexStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("streamed cell assignment equals batch; searches match inline IVF; scan prunes cells") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    val centroids = emb.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").as("cell_id"), Similarity.toDouble(col("embedding")).as("centroid"))
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()

    val input = MemoryStream[(Long, Array[Float])]
    val outDir = Files.createTempDirectory("graft_ann_index").toString
    val ckpt = Files.createTempDirectory("graft_ann_ckpt").toString
    val q = AnnIndexStream.start(
      input.toDF().toDF("vec_id", "embedding"), centroids, outDir, ckpt)
    // two micro-batches: the index accretes across batches
    val (first, rest) = rows.splitAt(rows.length / 2)
    input.addData(first.toSeq)
    q.processAllAvailable()
    input.addData(rest.toSeq)
    q.processAllAvailable()
    q.stop()

    // partition-directory columns read back as int — restore the long type
    val indexed = spark.read.parquet(outDir)
      .withColumn("cell", col("cell").cast("long"))
    // 1) assignment parity with the batch operator, row for row
    val batch = Similarity.assignCells(emb, centroids)
      .select("candidate_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = indexed.select("candidate_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch, "streamed assignment diverged from batch")

    // 2) searching the streamed index == inline IVF (same cells, queries)
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fromIndex = pairs(Similarity.ivfTopKAssigned(indexed, queries, centroids, k = 5))
    val inline = pairs(Similarity.ivfTopK(emb, queries, k = 5))
    assert(fromIndex == inline, "index search diverged from inline IVF")

    // 3) probing one cell reads only that cell's partition directory
    val oneCell = spark.read.parquet(outDir).filter(col("cell") === streamed.values.head)
    val scan = oneCell.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(cell"),
      s"cell filter not pushed to partition pruning:\n$scan")
  }
}
