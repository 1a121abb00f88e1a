package graft.util

import org.apache.spark.sql.DataFrame

/** The repo-wide materialization policy (the [[graft.operators.Components]]
  * snapshot rule, VERDICT r8 #6): when a frame feeds MULTIPLE actions —
  * strategy probes, join sides, membership expansions — materialize it once
  * instead of re-running its subplan per action (ReuseExchange dedups only
  * within one action).
  *
  * RELIABLE checkpoint when `sparkContext.getCheckpointDir` is set — the
  * right default for a multi-hour 100 TB run, where a localCheckpoint'd
  * block dies with its executor and fails the query (lineage is truncated,
  * there is no recompute path) — `localCheckpoint()` otherwise (single-box
  * sessions, where executor loss means JVM loss anyway). Not `persist()`:
  * checkpoint blocks are ContextCleaner-reclaimed as soon as the caller
  * drops the frame (reliable-mode files by the GC cleaner via
  * `spark.cleaner.referenceTracking.cleanCheckpoints`, set in [[Sessions]]),
  * whereas a CacheManager entry would pin executor storage until an
  * explicit unpersist no library caller is contracted to issue. */
object Snapshots {
  def snap(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    // DISK_ONLY, not the MEMORY_AND_DISK default (r10): a memory-leveled
    // snapshot stores partitions as DESERIALIZED VALUE ARRAYS, and a
    // partition that spilled under pressure gets RE-INFLATED into one on
    // every later read (BlockManager.maybeCacheDiskValuesInMemory) — for
    // a corpus-sized snapshot that is a multi-GiB unmanaged allocation
    // per concurrently-reading task, measured as driver-killing heap OOM
    // in q_dedup_clusters at the clone-heavy 100× tier even at 64 g.
    // DISK_ONLY blocks stream serialized from local disk (page-cached in
    // practice), never re-inflate, and pin no storage memory against the
    // jobs running on top of the snapshot.
    else df.localCheckpoint(eager = true,
      org.apache.spark.storage.StorageLevel.DISK_ONLY)
}
