package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Connected components (large-star/small-star): transitivity beyond the
  * emitted pair list is the whole point, so every fixture plants chains the
  * pair set never closes. Brute-force union-find is the in-test oracle. */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // localBound = 0 forces the distributed alternating-star iteration: every
  // spec fixture is under LocalClosureBound, so the iteration-machinery
  // tests must opt out of the driver-local route explicitly
  private def ccDist(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b", localBound = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize: map every node to the min of its component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }.toMap
  }

  test("a chain is one component even though no pair spans it") {
    val chain = (1L until 8L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got == (1L to 8L).map(_ -> 1L).toMap)
  }

  test("self-loops, duplicates and reversed edges normalize away") {
    val got = cc(Seq((5L, 5L), (2L, 1L), (1L, 2L), (2L, 1L), (9L, 8L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("matches union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(150)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .filter(e => e._1 != e._2)
    assert(cc(edges) == unionFind(edges))
  }

  test("long shuffled-id chain converges within the default round budget") {
    // ids deliberately scrambled so min-labels must travel both directions
    val rnd = new scala.util.Random(7)
    val ids = rnd.shuffle((1L to 200L).toList)
    val edges = ids.zip(ids.tail)
    val got = ccDist(edges)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 200L).toSet)
  }

  test("result is invariant under input partitioning") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(80)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2)
    val df1 = edges.toDF("a", "b").repartition(1)
    val df37 = edges.toDF("a", "b").repartition(37)
    val r1 = Components.connectedComponents(df1, "a", "b", localBound = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val r37 = Components.connectedComponents(df37, "a", "b", localBound = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(r1 == r37)
  }

  test("intermediate edge-set snapshots are unpersisted: ≤1 generation survives a call") {
    val sc = spark.sparkContext
    def snapIds: Set[Int] =
      sc.getPersistentRDDs.filter(_._2.name == "graft-cc-snap").keySet.toSet
    val before = snapIds
    // 300-node shuffled chain → many star rounds; a per-iteration leak
    // would strand one snapshot PER ROUND, not ≤1 total
    val rnd = new scala.util.Random(3)
    val ids = rnd.shuffle((1L to 300L).toList)
    val res = Components.connectedComponents(ids.zip(ids.tail).toDF("a", "b"), "a", "b",
      localBound = 0)
    assert(res.collect().length == 300)
    val survivors = snapIds -- before
    assert(survivors.size <= 1, s"leaked snapshot generations: $survivors")
  }

  test("reliable-checkpoint mode: retired generations' files are deleted eagerly") {
    // With a checkpointDir set, every generation writes its edge set to
    // stable storage and Spark itself never deletes those files mid-app —
    // Snap.release() must. A multi-round graph would otherwise leave one
    // rdd-* directory PER ROUND; eager deletion leaves only the final
    // generation's (the caller still reads it).
    val sc = spark.sparkContext
    val saved = org.apache.spark.GraftTestBridge.checkpointDir(sc)
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toFile
    try {
      sc.setCheckpointDir(dir.getAbsolutePath)
      val rnd = new scala.util.Random(13)
      val ids = rnd.shuffle((1L to 300L).toList)
      val res = Components.connectedComponents(ids.zip(ids.tail).toDF("a", "b"), "a", "b",
        localBound = 0)
      assert(res.collect().length == 300)
      // checkpoint layout: <dir>/<uuid>/rdd-<id>/...
      def rddDirs: Seq[java.io.File] = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(u => Option(u.listFiles()).getOrElse(Array.empty).toSeq)
        .filter(_.getName.startsWith("rdd-"))
      val survivors = rddDirs
      assert(survivors.size <= 1, s"leaked checkpoint generations: ${survivors.map(_.getName)}")
    } finally {
      org.apache.spark.GraftTestBridge.setCheckpointDir(sc, saved)
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("driver-local closure equals the distributed fixed point (route pin)") {
    // the routing gate is a pure perf decision: both routes must produce
    // the identical (id, component-min) mapping on any edge set
    val rnd = new scala.util.Random(23)
    val rand = Seq.fill(200)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    val chain = rnd.shuffle((500L to 700L).toList).sliding(2).map(p => (p(0), p(1))).toSeq
    for (edges <- Seq(rand, rand ++ chain)) {
      assert(cc(edges) == ccDist(edges), "local and distributed closures diverged")
    }
  }

  test("clusters assigns singletons to themselves and members to the component min") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((2L, 3L), (3L, 5L)).toDF("id_a", "id_b")
    val got = Components.clusters(ids, "doc_id", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L, 5L -> 2L))
  }

  test("empty pair list yields all-singleton clusters") {
    val ids = Seq(10L, 20L).toDF("doc_id")
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Components.clusters(ids, "doc_id", empty, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 20L -> 20L))
  }
}
