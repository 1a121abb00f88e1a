package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over a pair list — the cluster-resolution
  * step of a near-dup pipeline: LSH/Jaccard emits PAIRS, but dedup survivors
  * must be chosen per transitive CLUSTER (a~b, b~c must retire both b and c
  * even when a~c was never emitted).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", ACM SoCC 2014) — the
  * MapReduce-native formulation that converges in O(log²·n) rounds on ANY
  * graph shape (min-label flooding needs O(diameter) rounds, which a
  * 1000-doc chain turns into 1000 shuffles). Each round is two
  * groupBy-min + join passes; every shuffle carries only (Long, Long)
  * node pairs — never documents — so a 100 TB corpus' near-dup graph
  * (edges ≪ corpus bytes) iterates over id-sized data.
  *
  * No collect_list anywhere: a boilerplate hot node with millions of
  * neighbors would blow a grouped-list formulation; here its neighbor min
  * is a partial-aggregatable `min` and its edge rewrites are a join.
  *
  * Storage lifecycle: each iteration's edge set is snapshotted into a
  * persisted, lineage-truncated RDD (the long-session alternative to
  * `Dataset.localCheckpoint`, which exposes no unpersist handle); the
  * PREVIOUS generation is unpersisted as soon as the next is materialized,
  * so executor storage holds at most two generations at any instant
  * regardless of round count. The returned DataFrame stays backed by the
  * final snapshot; its blocks are reclaimed by Spark's ContextCleaner once
  * the caller drops the result. When `spark.sparkContext.getCheckpointDir`
  * is set the snapshot uses RELIABLE checkpointing (survives executor loss
  * — the right mode for a multi-hour 100 TB run); otherwise it
  * local-checkpoints. Reliable-checkpoint FILES are deleted eagerly by
  * `release()` when a generation retires (Spark itself never deletes them
  * mid-app unless GC-driven `cleanCheckpoints` fires, so a long run would
  * otherwise accumulate O(rounds) edge-set copies on stable storage); the
  * final generation's files are left for the GC-driven cleaner
  * (`spark.cleaner.referenceTracking.cleanCheckpoints`, set in
  * [[graft.util.Sessions]]) since the caller still reads them.
  */
object Components {

  /** One materialized edge-set generation: a DataFrame view plus the RDD
    * handle that owns its storage. */
  private final case class Snap(df: DataFrame, rdd: RDD[(Long, Long)]) {
    def release(): Unit = {
      rdd.unpersist(blocking = false)
      // A retired generation's reliable-checkpoint files are dead weight:
      // by the time release() runs, the NEXT generation has completed its
      // own checkpoint (its first action truncated its lineage), so nothing
      // can re-read this generation. Spark only deletes checkpoint files on
      // GC (cleanCheckpoints) or app exit, so delete deterministically here.
      rdd.getCheckpointFile.foreach { dir =>
        val path = new org.apache.hadoop.fs.Path(dir)
        val fs = path.getFileSystem(rdd.sparkContext.hadoopConfiguration)
        fs.delete(path, true)
      }
    }
  }

  /** Materialize (u, v) edges into a persisted, lineage-truncated snapshot.
    * The checkpoint (and persist) completes during the first action the
    * caller runs over `df` — always the convergence-signature aggregate. */
  private def snap(edges: DataFrame): Snap = {
    val spark = edges.sparkSession
    import spark.implicits._
    val rdd = edges.select(col("u"), col("v")).as[(Long, Long)].rdd
    rdd.setName("graft-cc-snap")
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    if (spark.sparkContext.getCheckpointDir.isDefined) rdd.checkpoint()
    else rdd.localCheckpoint()
    Snap(rdd.toDF("u", "v"), rdd)
  }

  /** Edge-count ceiling for the driver-local closure in
    * [[connectedComponents]]. At ≤1 M canonical edges the collected edge
    * list is ~16 MB of primitive pairs and the vertex→component mapping
    * ≤ ~2 M (Long, Long) rows — tens of MB: BOUNDED driver state well
    * inside both `spark.driver.maxResultSize` (1 GB default) and the size
    * class every downstream consumer can join BROADCAST (guide §3.1: a few
    * hundred MB is fine, the hard cap is 8 GB). Above the bound the
    * alternating-star iteration runs unchanged (the 100 TB path — a
    * clone-heavy derived tier's star graph is millions of edges and must
    * never visit the driver; the 100× tier's 4.7 M-edge graph stays
    * distributed under this bound). The gate rides on the edge COUNT the
    * convergence signature already materializes — no extra probe action.
    *
    * Raised 100 k → 1 M in r14: each distributed round costs several
    * fixed-latency shuffle jobs (snapshot + signature + rewrite — measured
    * ~0.9-1.5 s/round warm on local[32] REGARDLESS of edge count at this
    * scale), and q_dedup_clusters' sf0.1 graph (119 k canonical edges) sat
    * just past the old bound, paying 5 distributed rounds ≈ 5 s where the
    * union-find closes 119 k edges in milliseconds. Route equivalence is
    * spec-pinned (ComponentsSpec runs every fixture on BOTH routes). */
  val LocalClosureBound = 1000000L

  /** Connected components of the undirected graph given by (aCol, bCol)
    * Long pairs. Returns ("id", "component") for every vertex present in
    * the edge list; component = the minimum vertex id of its component.
    *
    * Deterministic for a given edge SET (self-loops and duplicate/reversed
    * edges are normalized away; partitioning never affects the result).
    *
    * Small graphs (≤ `localBound` canonical edges — see
    * [[LocalClosureBound]]) close with a driver-local union-find instead of
    * the O(log² n)-round distributed iteration: each distributed round
    * costs several fixed-latency shuffle jobs (snapshot + signature +
    * rewrite), which on a few-hundred-edge graph is pure machinery tax
    * (measured 4.3 s warm at sf0.1 vs ~0.5 s local). Union always attaches
    * the larger root under the smaller, so the root IS the component
    * minimum — value-identical to the distributed fixed point
    * (spec-pinned on both routes). Pass `localBound = 0` to force the
    * distributed path. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 30,
                          localBound: Long = LocalClosureBound): DataFrame = {
    // canonical directed form: (u, v) with u > v ("u points at a smaller id")
    var cur = snap(edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct())

    def edgeSetSig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    // both directions; centers are every node with ≥1 neighbor
    def sym(df: DataFrame): DataFrame =
      df.union(df.select(col("v").as("u"), col("u").as("v")))

    // large-star: center u attaches each STRICTLY LARGER neighbor to
    // m = min(N(u) ∪ {u}); emitted edges (v, m) keep v > m by construction.
    def largeStar(df: DataFrame): DataFrame = {
      val s = sym(df)
      val mins = s.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      s.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // small-star: center u attaches its smaller neighbors AND itself to
    // m⁻ = min(N⁻(u) ∪ {u}) = min of its smaller neighbors (v < u always
    // holds in canonical form, so N⁻(u) here is exactly the canonical out-
    // neighborhood and m⁻ its min).
    def smallStar(df: DataFrame): DataFrame = {
      val mins = df.groupBy("u").agg(min(col("v")).as("m"))
      val rewired = df.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))   // smaller neighbor -> m
        .union(mins.select(col("u"), col("m").as("v"))) // u itself -> m
        .filter(col("u") =!= col("v"))
        .distinct()
      rewired
    }

    val profile = sys.env.contains("SPARK_GRAFT_PROFILE")
    // Any failure (including the non-convergence require below) must not
    // strand the in-flight generation persisted with no handle for the
    // caller to release — unwind storage before rethrowing.
    try {
      var sig = edgeSetSig(cur.df)
      if (sig._1 <= localBound) {
        // collect through the typed RDD handle: primitive (Long, Long)
        // tuples, not Row objects — at the r14 1 M-edge bound the Row
        // spelling would transiently hold ~80 MB of row wrappers
        val rows = cur.rdd.collect() // ≤ localBound rows — bounded by the gate
        cur.release()
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x
          while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        rows.foreach { case (u, v) =>
          parent.putIfAbsent(u, u); parent.putIfAbsent(v, v)
          val ru = find(u); val rv = find(v)
          if (ru < rv) parent.put(rv, ru)
          else if (rv < ru) parent.put(ru, rv)
        }
        val spark = edges.sparkSession
        import spark.implicits._
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        parent.keySet().forEach(id => out += ((id, find(id))))
        return out.toSeq.toDF("id", "component")
      }
      var converged = false
      var it = 0
      while (!converged && it < maxIter) {
        val t0 = System.nanoTime()
        val next = snap(smallStar(largeStar(cur.df)))
        try {
          val nextSig = edgeSetSig(next.df)
          // The (count, xxhash64-sum) signature could collide across distinct
          // edge sets; a signature match is only a CANDIDATE fixed point.
          // Confirm it once with a set-difference probe (counts already match,
          // so one direction suffices) — runs a single time at convergence.
          converged = nextSig == sig && next.df.except(cur.df).isEmpty
          sig = nextSig
        } catch { case t: Throwable => next.release(); throw t }
        cur.release() // next is checkpointed by the aggregates above — safe
        cur = next
        it += 1
        if (profile) println(String.format(java.util.Locale.ROOT,
          "[cc] round=%d edges=%d sec=%.2f converged=%b",
          Int.box(it), Long.box(sig._1),
          Double.box((System.nanoTime() - t0) / 1e9), Boolean.box(converged)))
      }
      require(converged, s"connectedComponents did not converge in $maxIter rounds")
    } catch { case t: Throwable => cur.release(); throw t }

    // at the fixed point every edge is (member, componentMin); roots map to
    // themselves. Backed by the final snapshot (see class doc for lifecycle).
    cur.df.select(col("u").as("id"), col("v").as("component"))
      .union(cur.df.select(col("v").as("id"), col("v").as("component")).distinct())
      .distinct()
  }

  /** Cluster assignment for a full id universe: every id in `ids` gets the
    * component of the pair graph, or itself when it touches no pair
    * (singleton cluster). Output: (idCol, "component"). */
  def clusters(ids: DataFrame, idCol: String,
               pairs: DataFrame, aCol: String, bCol: String,
               maxIter: Int = 30): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIter)
    ids.select(col(idCol).cast("long").as(idCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("component"))
  }
}
