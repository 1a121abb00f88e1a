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

  test("ivfTopKIndexed prunes the scan to the probed cells and matches ivfTopKAssigned") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val emb = Tables.embeddings(spark, sf)
    val centroids = emb.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").as("cell_id"), Similarity.toDouble(col("embedding")).as("centroid"))
    val outDir = Files.createTempDirectory("graft_ann_index_batch").toString
    Similarity.assignCells(emb, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(outDir)
    val indexed = spark.read.parquet(outDir)
    val queries = emb.filter(col("vec_id") < 8)

    val result = Similarity.ivfTopKIndexed(indexed, queries, centroids, k = 5, nprobe = 2)

    // result parity with the unpruned assigned-table search (the literal
    // cell filter only removes cells no probe joins with)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val unpruned = Similarity.ivfTopKAssigned(
      indexed.withColumn("cell", col("cell").cast("long")), queries, centroids,
      k = 5, nprobe = 2)
    assert(pairs(result) == pairs(unpruned), "pruned search diverged from assigned search")

    // plan: the index scan carries a LITERAL partition filter on cell and
    // selects strictly fewer than all 16 cell directories — 8 queries ×
    // nprobe=2 probe at most 16 distinct cells but land in fewer
    // sparkPlan, not executedPlan: AQE wraps the executed tree in
    // AdaptiveSparkPlanExec, which hides the scan from collect(); the
    // partition filter is static so the pre-AQE plan carries it already
    val idxScan = result.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
        if f.relation.partitionSchema.fieldNames.contains("cell") => f
    }
    assert(idxScan.nonEmpty, "no cell-partitioned scan in the plan")
    assert(idxScan.head.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"no partition filter on cell: ${idxScan.head.partitionFilters}")
    val selected = idxScan.head.selectedPartitions.partitionCount
    val total = spark.read.parquet(outDir).select("cell").distinct().count()
    assert(selected < total,
      s"partition pruning ineffective: read $selected of $total cell directories")
  }
}
