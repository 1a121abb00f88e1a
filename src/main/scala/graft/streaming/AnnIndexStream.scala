package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Streaming ANN index maintenance — the streaming twin of
  * [[graft.operators.Similarity.assignCells]].
  *
  * Embeddings arriving on a stream are cell-assigned MAP-ONLY (the
  * codegen'd `NearestCells` argmax against a driver-held centroid table —
  * stateless: no watermark, no aggregation state, no shuffle) and appended
  * to a cell-PARTITIONED parquet layout. Query batches then call
  * [[graft.operators.Similarity.ivfTopKAssigned]] against the layout and
  * pay zero assignment cost; probing a cell touches only that cell's
  * partition directory (partition pruning at the scan).
  *
  * At 100 TB this is the shape that keeps an ANN index continuously
  * fresh: ingestion cost is one codegen expression per vector, the index
  * is just parquet files under `cell=<id>/` directories, and exactly-once
  * append comes from the standard checkpoint mechanism — no external
  * index server, no rebuild jobs.
  */
object AnnIndexStream {

  /** Start appending cell-assigned vectors from `stream` (columns:
    * `vec_id`, `embedding array<float>`) to `outDir`, partitioned by
    * `cell`. Centroids are a STATIC table — the coarse quantizer changes
    * rarely and a new one means a new index generation, same as batch. */
  def start(stream: DataFrame, centroids: DataFrame,
            outDir: String, checkpointDir: String,
            idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery =
    Similarity.assignCells(stream, centroids, idCol, vecCol)
      .writeStream
      .format("parquet")
      .partitionBy("cell")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
