package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`; BASELINE.json north star).
  *
  * Numeric discipline: elementwise float→double widening (exact), then a
  * sequential left-fold dot product — `aggregate` evaluates in array order,
  * which keeps results bit-identical to any other engine that folds
  * sequentially (the DuckDB oracle does).
  *
  * Scale design: [[bruteForceTopK]] broadcasts the (small) query set and
  * scans candidates once — the right baseline when queries ≪ candidates.
  * [[ivfTopK]] is the 100 TB path: coarse-quantize candidates into C
  * centroid cells (one shuffle), probe only the nprobe nearest cells per
  * query — candidate work drops by ~C/nprobe while recall stays high.
  */
object Similarity {

  /** Elementwise float→double widening. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm (sequential fold, same ordering guarantees as [[dot]]). */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force cosine top-k: every query against every candidate.
    * Queries are broadcast (they must be small — that's the contract of
    * this baseline); candidates stream through in one scan, and the window
    * per query id is a partial top-k (rank ≤ k filter). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms hoisted to one column per vector: cosine() inline would refold
    // both norms for every (query, candidate) pair — same bits, 2× the work
    val q = broadcast(queries.select(col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv"))))
    val c = candidates.select(col(idCol).as("candidate_id"),
        toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("candidate_id"))
    q.join(c, col("query_id") =!= col("candidate_id"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "candidate_id", "rank", "sim")
  }

  /** K-means centroid refinement for IVF cells: seed with the numCentroids
    * lowest-id vectors (deterministic), then `iters` rounds of
    * assign-to-nearest + per-cell mean via the distributed
    * [[graft.functions.VectorAgg.VectorMean]] aggregator. Each round is one
    * broadcast + one shuffle of (cell, 64-double partial buffers) — scales
    * to any corpus size. Empty cells keep their previous centroid. */
  def kmeansCentroids(vectors: DataFrame, numCentroids: Int, iters: Int,
                      dim: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol).as("__id"), toDouble(col(vecCol)).as("v"))
    var centroids = vectors.orderBy(col(idCol)).limit(numCentroids)
      .select(col(idCol).as("cell_id"), toDouble(col(vecCol)).as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = v.join(broadcast(centroids))
        .withColumn("__csim", cosine(col("v"), col("centroid")))
        .withColumn("__r", row_number().over(
          Window.partitionBy("__id").orderBy(col("__csim").desc, col("cell_id"))))
        .filter(col("__r") === 1)
      val means = assigned.groupBy("cell_id")
        .agg(graft.functions.VectorAgg.vector_mean(dim)(
          transform(col("v"), _.cast("float"))).as("new_centroid"))
      centroids = centroids.join(means, Seq("cell_id"), "left")
        .select(col("cell_id"),
          coalesce(col("new_centroid"), col("centroid")).as("centroid"))
    }
    centroids
  }

  /** IVF-style ANN: coarse-quantize candidates to their nearest centroid
    * (deterministic centroid choice: the numCentroids lowest-id vectors —
    * swap in k-means via [[kmeansCentroids]] for better recall), then search
    * each query only inside its nprobe nearest cells.
    *
    * One shuffle to bucket candidates, one broadcast of centroid probes;
    * at scale the candidate table can be *written bucketed* by cell id so
    * repeated queries skip the assignment pass entirely. */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, k: Int,
              numCentroids: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              centroidsOverride: Option[DataFrame] = None): DataFrame = {
    val centroids = broadcast(centroidsOverride.getOrElse(
      vectors.orderBy(col(idCol)).limit(numCentroids)
        .select(col(idCol).as("cell_id"), toDouble(col(vecCol)).as("centroid"))))

    def nearestCells(df: DataFrame, vec: String, n: Int, out: String): DataFrame = {
      val w = Window.partitionBy("__vid").orderBy(col("__csim").desc, col("cell_id"))
      df.join(centroids)
        .withColumn("__csim", cosine(col(vec), col("centroid")))
        .withColumn("__vid", col(idCol))
        .withColumn("__crank", row_number().over(w))
        .filter(col("__crank") <= n)
        .drop("centroid", "__csim", "__vid", "__crank")
        .withColumnRenamed("cell_id", out)
    }

    val cands = nearestCells(
      vectors.select(col(idCol), toDouble(col(vecCol)).as("cv")), "cv", 1, "cell")
      .select(col("cell"), col(idCol).as("candidate_id"), col("cv"))
    val probes = nearestCells(
      queries.select(col(idCol), toDouble(col(vecCol)).as("qv")), "qv", nprobe, "cell")
      .select(col("cell"), col(idCol).as("query_id"), col("qv"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("candidate_id"))
    probes.withColumn("qn", l2Norm(col("qv")))
      .join(cands.withColumn("cn", l2Norm(col("cv"))), Seq("cell"))
      .filter(col("query_id") =!= col("candidate_id"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select("query_id", "candidate_id", "sim")
      .distinct() // a pair may meet in several probed cells
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "candidate_id", "rank", "sim")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold via cell blocking —
    * the embedding-space cousin of [[Dedup.minhashNearDuplicates]].
    *
    * One side keeps only its primary cell; the other side multi-probes its
    * `nprobe` nearest cells. Without the multi-probe, two near-identical
    * vectors that each seed their own centroid land in different cells and
    * the pair is lost — probing the runner-up cells recovers it. */
  def cosineNearDuplicates(vectors: DataFrame, threshold: Double,
                           numCentroids: Int = 16, nprobe: Int = 2,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = broadcast(
      vectors.orderBy(col(idCol)).limit(numCentroids)
        .select(col(idCol).as("cell_id"), toDouble(col(vecCol)).as("centroid")))
    def assign(n: Int): DataFrame = vectors
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .join(centroids)
      .withColumn("__csim", cosine(col("v"), col("centroid")))
      .withColumn("__r", row_number().over(
        Window.partitionBy("id").orderBy(col("__csim").desc, col("cell_id"))))
      .filter(col("__r") <= n)
      .select(col("cell_id").as("cell"), col("id"), col("v"))
    val a = assign(1).select(col("cell"), col("id").as("id_a"), col("v").as("v_a"))
    val b = assign(nprobe).select(col("cell"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") =!= col("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("v_a"), col("v_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("v_a"), col("v_b")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
