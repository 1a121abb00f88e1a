package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

/** ANN operator tests: brute force is the ground truth; the IVF variant is
  * judged by recall against it (approximate by construction). */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("cosine of identical vectors is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df.filter(col("vec_id") === 1), df, k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(math.abs(top(2L) - 1.0) < 1e-12)
    assert(math.abs(top(3L)) < 1e-12)
  }

  test("brute-force top-k returns exactly k ranked neighbors per query") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, k = 5)
    val byQuery = out.collect().groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to 5))
      val sims = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "sims not descending")
    }
  }

  test("IVF ANN recall@5 >= 0.5 vs brute force on the test embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, emb, k = 5))
    val approx = pairs(Similarity.ivfTopK(emb, queries, k = 5, numCentroids = 16, nprobe = 4))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low (exact=$exact approx=$approx)")
  }

  test("blocked per-cell kernel (ivfTopKGrouped) is bit-identical to the join path") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val c = math.max(16, math.floor(math.sqrt(n.toDouble)).toInt)
    val np = math.max(2, c / 12)
    val refined = Similarity.kmeansCentroidsFixedPoint(emb, c, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._3)).toSeq
    // the knnGraph regime: queries = corpus, √N cells
    val joinPath = rows(Similarity.ivfTopK(emb, emb, k = 5,
      numCentroids = c, nprobe = np, centroidsOverride = Some(refined)))
    val blocked = rows(Similarity.ivfTopKGrouped(emb, emb, k = 5,
      numCentroids = c, nprobe = np, centroidsOverride = Some(refined)))
    assert(blocked == joinPath, {
      val d1 = joinPath.toSet -- blocked.toSet
      val d2 = blocked.toSet -- joinPath.toSet
      s"blocked kernel diverged: only-join=${d1.take(5)} only-blocked=${d2.take(5)}"
    })
    // tie fixture: exact clone vectors force equal sims — the kernel's
    // comparator must break ties exactly like TopKAgg (lowest id first)
    val base = (0L until 24L).map { i =>
      val v = Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat)
      (i, v)
    }
    val clones = Seq((100L, base(3)._2.clone()), (101L, base(3)._2.clone()))
    val tied = (base ++ clones).toDF("vec_id", "embedding")
    val j2 = rows(Similarity.ivfTopK(tied, tied, k = 3, numCentroids = 4, nprobe = 2))
    val b2 = rows(Similarity.ivfTopKGrouped(tied, tied, k = 3, numCentroids = 4, nprobe = 2))
    assert(b2 == j2)
    // plan shape: the corpus-wide kernel must NOT broadcast either side —
    // both shuffle once on cell id into the cogroup (a corpus-sized
    // broadcast is precisely what this kernel exists to avoid)
    val plan = Similarity.ivfTopKGrouped(emb, emb, k = 5,
      numCentroids = c, nprobe = np, centroidsOverride = Some(refined))
      .queryExecution.executedPlan.toString
    assert(plan.contains("CoGroup"), s"expected a cogroup kernel:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"corpus-wide kNN must not broadcast a side:\n$plan")
  }

  test("k-means-refined centroids keep or improve IVF recall") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, emb, k = 5))
    def recall(c: Option[org.apache.spark.sql.DataFrame]) = {
      val approx = pairs(Similarity.ivfTopK(emb, queries, k = 5,
        numCentroids = 16, nprobe = 4, centroidsOverride = c))
      (exact intersect approx).size.toDouble / exact.size
    }
    val seeded = recall(None)
    val refined = recall(Some(
      Similarity.kmeansCentroids(emb, numCentroids = 16, iters = 2, dim = 64)))
    assert(refined >= seeded - 0.11,
      s"kmeans recall $refined collapsed vs seeded $seeded")
    assert(refined > 0.4, s"kmeans recall too low: $refined")
  }

  test("embedding near-duplicate detection finds planted duplicates") {
    import spark.implicits._
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val jit = base.clone(); jit(0) += 0.001f
    val other = Array.tabulate(8)(i => ((i * 37) % 13 - 6).toFloat)
    val df = Seq((1L, base), (2L, jit), (3L, other)).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDuplicates(df, threshold = 0.999, numCentroids = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("declared near-dup shape: exact precision, and multi-probe only adds pairs") {
    val emb = Tables.embeddings(spark, sf)
    val c = math.max(16, math.floor(math.sqrt(emb.count().toDouble)).toInt)
    val pairs = Similarity.cosineNearDuplicates(emb, threshold = 0.4,
      numCentroids = c, nprobe = 2).collect()
    assert(pairs.nonEmpty, "threshold 0.4 must yield pairs on the fixture")
    // precision is exact by construction: every emitted sim is the true
    // cosine of its pair, recomputed here independently, and >= threshold
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    pairs.foreach { r =>
      val (a, b, sim) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b, s"pair ($a,$b) not least/greatest ordered")
      val (va, vb) = (vecs(a), vecs(b))
      val dot = va.indices.foldLeft(0.0)((acc, i) => acc + va(i) * vb(i))
      def nrm(v: Seq[Double]) = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
      val truth = dot / (nrm(va) * nrm(vb))
      assert(truth >= 0.4 && math.abs(truth - sim) < 1e-12,
        s"pair ($a,$b): reported $sim, true cosine $truth")
    }
    // recall mechanism: widening the probe count can only ADD pairs (the
    // single-probe set is a subset) — the multi-probe exists to recover
    // pairs whose members seed different primary cells
    val single = Similarity.cosineNearDuplicates(emb, threshold = 0.4,
      numCentroids = c, nprobe = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.subsetOf(multi), "nprobe=2 lost pairs nprobe=1 found")
  }

  test("brute-force plan broadcasts the query side") {
    val emb = Tables.embeddings(spark, sf)
    val plan = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$plan")
  }

  test("IVF plan: map-only candidate assignment, probes broadcast") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 8)
    val plan = Similarity.ivfTopK(emb, queries, k = 5)
      .queryExecution.executedPlan.toString
    // the only joins are broadcast (probe side); the candidate corpus is
    // never exchanged for assignment
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"candidate side must not shuffle for a join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"probes not broadcast:\n$plan")
    // post-join dedup + top-k ranking are the only exchanges (both run on
    // the already-pruned pair set, not the corpus)
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"corpus-side shuffle crept into assignment ($exchanges):\n$plan")
  }

  test("IVFADC plan: both stages broadcast-join; the corpus is never shuffled") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 8)
    val plan = Similarity.ivfAdcTopK(emb, queries, k = 5, rerank = 16)
      .queryExecution.executedPlan.toString
    // ADC stage joins broadcast probes; exact stage joins broadcast
    // survivors + broadcast queries — the corpus streams through both
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus shuffled for a join:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"expected broadcast joins at both stages:\n$plan")
    // exchanges carry only bounded TopKAgg partials (ADC top-rerank, final
    // top-k) and the final presentation sort — never corpus rows
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(exchanges <= 4, s"corpus-side shuffle crept in ($exchanges):\n$plan")
  }

  test("fixed-point k-means is bit-invariant to partitioning") {
    val emb = Tables.embeddings(spark, sf)
    def centroids(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
      Similarity.kmeansCentroidsFixedPoint(df, numCentroids = 16, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val a = centroids(emb)
    val b = centroids(emb.repartition(13))
    // EXACT equality, not tolerance: long-sum accumulation is order-free
    assert(a == b, "fixed-point refinement changed under repartitioning")
    // and it refines: at least one centroid moved off its seed
    val seeds = emb.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.exists { case (id, c) => c != seeds(id) }, "no centroid moved")
  }

  test("fixed-point Lloyd composes: per-iteration bit-identity under repartition, recall plateaus on planted structure") {
    import spark.implicits._
    // per-iteration bit-identity: every intermediate round's centroids (not
    // just the final ones) must be exactly equal under repartitioning — the
    // fixed-point trick has to survive COMPOSITION for iters>1 to be safe
    // in a declared, oracle-checked query (q_cosine_topk_ivf_kmeans runs 2)
    val emb = Tables.embeddings(spark, sf)
    for (it <- 1 to 3) {
      def cents(df: org.apache.spark.sql.DataFrame) =
        Similarity.kmeansCentroidsFixedPoint(df, numCentroids = 16, iters = it)
          .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(cents(emb) == cents(emb.repartition(11 + it)),
        s"iteration $it centroids differ under repartitioning")
    }
    // planted two-scale structure (the fixture residual encoding uses):
    // more Lloyd rounds must not lose recall — improve or plateau
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian() * 10.0))
    val planted = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.zip(Array.fill(dim)(rnd.nextGaussian() * 0.5)).map {
        case (a, b) => (a + b).toFloat })
    }.toDF("vec_id", "embedding")
    val pQueries = planted.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(pQueries, planted, k = 5))
    def recallAt(it: Int): Double = {
      val cs = Similarity.kmeansCentroidsFixedPoint(planted, numCentroids = 4, iters = it)
      val approx = pairs(Similarity.ivfTopK(planted, pQueries, k = 5,
        numCentroids = 4, nprobe = 1, centroidsOverride = Some(cs)))
      (exact intersect approx).size.toDouble / exact.size
    }
    val r1 = recallAt(1)
    val r2 = recallAt(2)
    val r3 = recallAt(3)
    assert(r2 >= r1 - 1e-9 && r3 >= r2 - 1e-9,
      s"recall regressed across Lloyd iterations: $r1 -> $r2 -> $r3")
    assert(r3 > 0.9, s"converged recall too low on planted structure: $r3")
  }

  test("fixed-point-refined centroids keep or improve IVF recall at equal C/nprobe") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, emb, k = 5))
    def recall(c: Option[org.apache.spark.sql.DataFrame]) = {
      val approx = pairs(Similarity.ivfTopK(emb, queries, k = 5,
        numCentroids = 16, nprobe = 4, centroidsOverride = c))
      (exact intersect approx).size.toDouble / exact.size
    }
    val seeded = recall(None)
    val refined = recall(Some(
      Similarity.kmeansCentroidsFixedPoint(emb, numCentroids = 16, iters = 2)))
    assert(refined >= seeded - 0.1,
      s"fixed-point kmeans recall $refined collapsed vs seeded $seeded")
    assert(refined > 0.4, s"fixed-point kmeans recall too low: $refined")
  }

  test("int8 quantization: bounded range, bounded round-trip error, zero-vector safe") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))) :+
      (99L, Array.fill(16)(0.0f)) // all-zero vector must not divide by zero
    val df = vecs.toDF("vec_id", "embedding")
    val rows = df.select(col("vec_id"),
        Similarity.quantizeInt8(Similarity.toDouble(col("embedding"))).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) =>
      val q = rows(id)
      val amax = v.map(x => math.abs(x.toDouble)).max
      assert(q.forall(x => x >= -127 && x <= 127), s"vec $id out of int8 range: $q")
      if (amax == 0.0) assert(q.forall(_ == 0))
      else {
        val scale = amax / 127.0
        v.zip(q).foreach { case (x, qi) =>
          // round-half-up: |x - q*scale| <= scale/2 (+ half-ulp slack)
          assert(math.abs(x.toDouble - qi * scale) <= scale / 2 + 1e-12,
            s"vec $id: $x quantized to $qi (scale $scale)")
        }
      }
    }
  }

  test("PQ: seed vectors encode to their own codes, invariant to partitioning") {
    val emb = Tables.embeddings(spark, sf)
    val cbs = Similarity.pqCodebooks(emb, m = 8, k = 16, dim = 64)
    assert(cbs.length == 8 && cbs.forall(_.length == 16) && cbs.head.head.length == 8)
    val codes = Similarity.pqEncode(emb.filter(col("vec_id") < 16), cbs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](r.fieldIndex("pq_codes"))).toMap
    // the j-th lowest-id vector IS codebook entry j in every subspace
    val order = emb.filter(col("vec_id") < 16).orderBy("vec_id")
      .select("vec_id").collect().map(_.getLong(0))
    order.zipWithIndex.foreach { case (id, j) =>
      assert(codes(id).forall(_ == j), s"seed vector $id should encode to code $j: ${codes(id)}")
    }
    val again = Similarity.pqEncode(emb.filter(col("vec_id") < 16).repartition(7), cbs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](r.fieldIndex("pq_codes"))).toMap
    assert(again == codes)
  }

  test("PQ Lloyd refinement lowers quantization error") {
    val emb = Tables.embeddings(spark, sf)
    val seeds = Similarity.pqCodebooks(emb, m = 8, k = 16, dim = 64)
    val refined = Similarity.pqRefine(emb, seeds, iters = 3)
    def err(cbs: Seq[Seq[Seq[Double]]]): Double = {
      val rows = Similarity.pqEncode(emb, cbs).select("ve", "pq_codes").collect()
      rows.map { r =>
        val ve = r.getSeq[Double](0)
        val codes = r.getSeq[Int](1)
        codes.zipWithIndex.map { case (c, mi) =>
          (0 until 8).map { j => val d = ve(mi * 8 + j) - cbs(mi)(c)(j); d * d }.sum
        }.sum
      }.sum / rows.length
    }
    val e0 = err(seeds)
    val e1 = err(refined)
    assert(e1 < e0, s"refinement did not lower quantization error: $e0 -> $e1")
  }

  test("PQ ADC search surfaces a planted clone at rank 1") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val clone = emb.filter(col("vec_id") === 5)
      .withColumn("vec_id", lit(100000L))
    val corpus = emb.unionByName(clone)
    val cbs = Similarity.pqCodebooks(corpus, m = 8, k = 16, dim = 64)
    val encoded = Similarity.pqEncode(corpus, cbs)
    val top = Similarity.pqTopK(encoded, corpus.filter(col("vec_id") === 100000L), cbs, topK = 3)
      .orderBy("rank").collect()
    assert(top.head.getLong(1) == 5L, s"clone's source should rank first: ${top.toSeq}")
    assert(top.head.getDouble(3) == 0.0) // identical codes -> ADC distance 0
  }

  test("IVFADC: recall@5 close to brute force, planted clone at rank 1") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val clone = emb.filter(col("vec_id") === 5).withColumn("vec_id", lit(100000L))
    val corpus = emb.unionByName(clone)
    val queries = corpus.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, corpus, k = 5))
    val adc = Similarity.ivfAdcTopK(corpus, queries, k = 5, rerank = 32)
    val recall = (exact intersect pairs(adc)).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVFADC recall $recall too low")
    // the clone's source is query 5's exact nearest neighbor; cell pruning
    // cannot separate identical vectors and ADC distance 0 survives re-rank
    val q5 = adc.filter(col("query_id") === 5).orderBy("rank").collect()
    assert(q5.head.getLong(1) == 100000L, s"clone not at rank 1: ${q5.toSeq}")
    assert(math.abs(q5.head.getDouble(3) - 1.0) < 1e-12)
  }

  test("residual IVFADC: lower quantization error than raw PQ at equal m/K") {
    val emb = Tables.embeddings(spark, sf)
    // raw-vector quantization error (the ivfAdcTopK encode path)
    val rawCbs = Similarity.pqCodebooks(emb, m = 8, k = 16, dim = 64)
    def meanErr(df: org.apache.spark.sql.DataFrame, vecCol: String,
                cbs: Seq[Seq[Seq[Double]]]): Double = {
      val rows = Similarity.pqEncode(df, cbs, "candidate_id", vecCol)
        .select(col("ve"), col("pq_codes")).collect()
      rows.map { r =>
        val ve = r.getSeq[Double](0)
        val codes = r.getSeq[Int](1)
        codes.zipWithIndex.map { case (c, mi) =>
          (0 until 8).map { j => val d = ve(mi * 8 + j) - cbs(mi)(c)(j); d * d }.sum
        }.sum
      }.sum / rows.length
    }
    val raw = emb.select(col("vec_id").as("candidate_id"),
      Similarity.toDouble(col("embedding")).as("v"))
    val rawErr = meanErr(raw, "v", rawCbs)
    // residual path with MEAN centroids (fixed-point Lloyd): the residual
    // claim needs the coarse quantizer to be actual cell means — with raw
    // seed centroids over structureless data, ||v − c||² ≈ ||v||² + ||c||²
    // and residuals are BIGGER than the vectors (measured here: 1.51 vs
    // 0.75 raw). With means, the variance decomposition guarantees the
    // within-cell spread is what's left, and the same codebook budget
    // covers a smaller ball.
    val cells = Similarity.kmeansCentroidsFixedPoint(emb, numCentroids = 16, iters = 2)
    val withRes = Similarity.assignCells(emb, cells)
      .withColumn("rv", zip_with(col("cv"),
        element_at(typedlit(cells.collect().map(r =>
          r.getLong(0) -> r.getSeq[Double](1)).toMap), col("cell")),
        (a, b) => a - b))
    val resCbs = Similarity.pqCodebooks(withRes, m = 8, k = 16, dim = 64, "candidate_id", "rv")
    val resErr = meanErr(withRes, "rv", resCbs)
    assert(resErr < rawErr,
      s"residual encoding did not lower quantization error: raw=$rawErr res=$resErr")
  }

  test("residual IVFADC: exhaustive rerank equals plain IVF; wins on planted two-scale data") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // composition pin: with rerank covering every probed candidate the ADC
    // stage filters nothing and exact re-rank must reproduce plain IVF —
    // same cells, same probes, same final ranking
    val refined = Similarity.kmeansCentroidsFixedPoint(emb, numCentroids = 16, iters = 2)
    val ivf = pairs(Similarity.ivfTopK(emb, queries, k = 5, centroidsOverride = Some(refined)))
    val resAll = pairs(Similarity.ivfAdcResidualTopK(emb, queries, k = 5, rerank = 1000000,
      centroidsOverride = Some(refined)))
    assert(resAll == ivf, "exhaustive-rerank residual IVFADC diverged from plain IVF")
    // NOTE: on this STRUCTURELESS fixture (500 iid near-unit vectors) the
    // residual transform can't help — k-means means shrink toward 0, so
    // residuals ≈ the raw vectors and ADC fidelity differences at small
    // rerank are small-sample noise (measured: raw 32/40 vs res 22/40 of
    // plain-IVF pairs at rerank=16, converging 37 vs 35 at rerank=32). The
    // recall GAIN the encoding exists for needs two-scale structure — pinned
    // strictly on the planted fixture below.

    // planted two-scale fixture: 4 well-separated cluster centers, fine
    // within-cluster structure. Raw PQ spends its 4-entry codebooks spanning
    // the BETWEEN-cluster variance (seeds all sit in cluster 0, ids 0-3), so
    // ADC can't order within a cluster; residuals remove the centers and the
    // same budget resolves the within-cluster offsets.
    val rnd = new scala.util.Random(42)
    val dim = 16
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian() * 10.0))
    val rowsP = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.zip(Array.fill(dim)(rnd.nextGaussian() * 0.5)).map {
        case (a, b) => (a + b).toFloat })
    }
    val planted = rowsP.toDF("vec_id", "embedding")
    // centroids: per-cluster MEANS (ids 0..3 seed one k-means cell per
    // cluster). Means, not the seed points: with point-centroids the
    // codebook seeds' residuals are exactly 0 — a degenerate codebook —
    // and the whole comparison collapses into tie-breaking.
    val plantedCells = Similarity.kmeansCentroidsFixedPoint(planted, numCentroids = 4, iters = 2)
    val pQueries = planted.filter(col("vec_id") < 8)
    val pExact = pairs(Similarity.bruteForceTopK(pQueries, planted, k = 5))
    def pRecall(df: org.apache.spark.sql.DataFrame) =
      (pExact intersect pairs(df)).size.toDouble / pExact.size
    val pRaw = pRecall(Similarity.ivfAdcTopK(planted, pQueries, k = 5,
      numCentroids = 4, nprobe = 1, m = 4, kCodes = 4, dim = dim, rerank = 6,
      centroidsOverride = Some(plantedCells)))
    val pRes = pRecall(Similarity.ivfAdcResidualTopK(planted, pQueries, k = 5,
      numCentroids = 4, nprobe = 1, m = 4, kCodes = 4, dim = dim, rerank = 6,
      centroidsOverride = Some(plantedCells)))
    assert(pRes > pRaw,
      s"residual encoding should win on two-scale data: raw=$pRaw res=$pRes")
  }

  test("IVFADC composition: exhaustive rerank equals plain IVF; cells bound ADC work") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // with rerank covering every probed candidate the ADC stage filters
    // nothing, so exact re-rank must reproduce plain IVF exactly — pins
    // the composition (same cells, same probes, same final ranking)
    val ivf = pairs(Similarity.ivfTopK(emb, queries, k = 5))
    val adcAll = pairs(Similarity.ivfAdcTopK(emb, queries, k = 5, rerank = 1000000))
    assert(adcAll == ivf, "exhaustive-rerank IVFADC diverged from plain IVF")
    // and the ADC stage's pair space is cell-bounded: the worst case
    // (every query probing the 4 largest of 16 cells) stays under the
    // Q*(N-1) pair space pqTopK scores
    val n = emb.count(); val q = queries.count()
    val cents = emb.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").as("cell_id"), Similarity.toDouble(col("embedding")).as("centroid"))
    val cellSizes = Similarity.assignCells(emb, cents)
      .groupBy("cell").count().collect().map(_.getLong(1))
    val worstPerQuery = cellSizes.sorted.takeRight(4).sum
    assert(worstPerQuery * q < q * (n - 1),
      s"cell pruning not cutting work: $worstPerQuery per query vs ${n - 1}")
  }

  test("pre-assigned IVF (the bucketed-write amortization path) matches inline IVF") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 8)
    val centroids = emb.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").as("cell_id"),
        Similarity.toDouble(col("embedding")).as("centroid"))
    val inline = Similarity.ivfTopK(emb, queries, k = 5).collect().toSet
    // round-trip the assignment through parquet, as a bucketed layout would
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.assignCells(emb, centroids).write.mode("overwrite").parquet(dir)
    val preassigned = Similarity.ivfTopKAssigned(
      spark.read.parquet(dir), queries, centroids, k = 5).collect().toSet
    assert(preassigned == inline)
  }

  test("k-means with zero iterations returns the deterministic seed centroids") {
    val emb = Tables.embeddings(spark, sf)
    val seeds = Similarity.kmeansCentroids(emb, numCentroids = 4, iters = 0, dim = 64)
      .collect().map(r => r.getLong(0)).sorted
    assert(seeds.toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("exact-clone collapse is output-invariant vs the direct pair stage") {
    import spark.implicits._
    // clone families with interleaved ids (expansion must re-normalize
    // least/greatest), a zero-vector family (self-sim NaN: no pairs, not
    // even clone-to-clone), near-dup singletons, and unrelated basis vecs
    val a = Array(1f, 0.2f, 0f, 0f, 0f, 0f, 0f, 0f)
    val b = Array(0.9f, 0.5f, 0.1f, 0f, 0f, 0f, 0f, 0f) // cos(a,b) ~0.95
    val c = Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)       // cos(a,c)=0
    val nearC = Array(0.1f, 0f, 0.99f, 0f, 0f, 0f, 0f, 0f) // cos(c,nearC) ~0.99
    val z = Array.fill(8)(0f)
    def basis(d: Int) = Array.tabulate(8)(i => if (i == d) 1f else 0f)
    val rows: Seq[(Long, Array[Float])] = Seq(
      1L -> a, 2L -> b, 4L -> a, 5L -> c, 6L -> b, 8L -> nearC,
      9L -> b, 13L -> z, 17L -> z, 20L -> basis(4), 21L -> basis(5),
      22L -> basis(6), 23L -> basis(7))
    val df = rows.toDF("vec_id", "embedding")
    def collect(p: org.apache.spark.sql.DataFrame) =
      p.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = collect(Similarity.cosineNearDuplicatesDirect(
      df, threshold = 0.4, numCentroids = 4, nprobe = 2))
    val collapsed = collect(Similarity.cosineNearDuplicatesCollapsed(
      df, threshold = 0.4, numCentroids = 4, nprobe = 2))
    assert(direct.nonEmpty, "fixture must yield pairs")
    // clone-clique pairs must be present (family {1,4} and {2,6,9})
    assert(direct.exists { case (x, y, _) => (x, y) == (1L, 4L) })
    assert(direct.exists { case (x, y, _) => (x, y) == (2L, 6L) })
    assert(collapsed == direct,
      s"collapse changed the output: only-direct=${direct -- collapsed} " +
        s"only-collapsed=${collapsed -- direct}")
    // the cost-gated public dispatch must agree whatever branch it picks
    // (this fixture is clone-heavy: 13 rows / 9 distinct ≈ 1.44 → collapse)
    val dispatched = collect(Similarity.cosineNearDuplicates(
      df, threshold = 0.4, numCentroids = 4, nprobe = 2))
    assert(dispatched == direct)
    // zero-vector clones pair with nothing, including each other
    assert(direct.forall { case (x, y, _) => !Set(13L, 17L)(x) && !Set(13L, 17L)(y) })

    // the edge formulation must close into the SAME components as the
    // expanded pair list — that is its whole contract
    val ids = df.select("vec_id")
    def comps(edges: org.apache.spark.sql.DataFrame) =
      Components.clusters(ids, "vec_id", edges, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPairs = comps(Similarity.cosineNearDuplicatesDirect(
      df, 0.4, 4, 2).select("id_a", "id_b"))
    val viaEdges = comps(Similarity.cosineNearDupEdgesCollapsed(df, 0.4, 4, 2))
    assert(viaEdges == viaPairs,
      s"edge graph closes differently: pairs=$viaPairs edges=$viaEdges")
    val viaDispatch = comps(Similarity.cosineNearDupEdges(df, 0.4, 4, 2))
    assert(viaDispatch == viaPairs)
  }

  test("hot-cell guard: a ~90%-dominant cell sub-splits to sub-quadratic candidates") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // degenerate-quantizer fixture: 900 of 1000 vectors share one dominant
    // direction with small DIVERSE jitters (deterministic per id; NOT
    // exact clones, so the collapse cannot absorb them — the realistic
    // low-diversity corpus whose residual structure the guard exploits),
    // the rest spread; handcrafted 2-cell quantizer concentrates
    // everything in cell 0. Planted: an exact-direction clone pair
    // (100,101) and a 1e-6-jitter near pair (200,201) that the guard must
    // keep as candidates (multi-probe sub-cell recovery).
    def jittered(seed: Int, eps: Double): Array[Double] = {
      val r = new scala.util.Random(seed)
      Array(1.0 + eps) ++ Array.fill(7)(0.01 * r.nextDouble())
    }
    val vecs: Seq[(Long, Array[Double])] = (0 until 1000).map { i =>
      val id = i.toLong
      if (i == 101) (id, jittered(100, 0.0))
      else if (i == 201) (id, jittered(200, 1e-6))
      else if (i < 900) (id, jittered(i, 0.0))
      else (id, Array.tabulate(8)(j => if (j == 2 + i % 6) 1.0 else 0.0))
    }
    val withNorms = vecs.toDF("id", "v")
      .withColumn("vn", Similarity.l2Norm(col("v")))
    val cells = Seq(
      (0L, Seq(1.0, 0, 0, 0, 0, 0, 0, 0), 1.0),
      (1L, Seq(0.0, 1, 0, 0, 0, 0, 0, 0), 1.0))
    PairCandidates.invalidateStats()
    val unguarded = Similarity.repPairCandidates(withNorms, cells, nprobe = 2,
      hotBound = Long.MaxValue).count()
    val guarded = Similarity.repPairCandidates(withNorms, cells, nprobe = 2,
      hotBound = 64)
    val guardedN = guarded.count()
    // pop ≈ 1000 in one cell: unguarded is pop²-shaped; the ⌈√pop⌉-way
    // sub-split must cut candidates to ~pop·√pop·nprobe
    assert(unguarded > 900L * 900L, s"fixture not hot: unguarded=$unguarded")
    assert(guardedN < unguarded / 5,
      s"sub-split not sub-quadratic: $unguarded -> $guardedN")
    // planted near-dup pairs survive the sub-split as candidates
    def hasPair(x: Long, y: Long): Boolean =
      guarded.filter((col("id_a") === x && col("id_b") === y) ||
        (col("id_a") === y && col("id_b") === x)).count() > 0
    assert(hasPair(100L, 101L), "exact-direction clone pair lost by the guard")
    assert(hasPair(200L, 201L), "1e-6 near pair lost by the guard")
  }

  test("semdedup: transitive closure retires a chain whose end pair was never emitted") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 60-degree fan: cos(1,2) = cos(2,3) = 0.5 >= 0.4, cos(1,3) = -0.5.
    // 1,2,3 are their own (seed) primary cells; 2 probes cell 1, 3 probes
    // cell 2, so pairs (1,2) and (2,3) surface but (1,3) never can —
    // only the closure puts all three in one cluster.
    def pad(xs: (Float, Float)): Array[Float] =
      Array(xs._1, xs._2) ++ Array.fill(62)(0f)
    def basis(d: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == d) 1f else 0f)
    val vecs = Seq(
      1L -> pad((1f, 0f)),
      2L -> pad((0.5f, 0.8660254f)),
      3L -> pad((-0.5f, 0.8660254f))) ++
      (4L to 19L).map(id => id -> basis(id.toInt + 6))
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup").toString
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val pairs = Similarity.cosineNearDuplicates(
        spark.read.parquet(s"$dir/embeddings.parquet"), threshold = 0.4,
        numCentroids = 16, nprobe = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    assert(!pairs.contains((1L, 3L)), "chain-end pair should not be emitted directly")
    val out = graft.queries.SimilarityQueries.semDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == ((1L, 3L, 1)))
    assert(out(2L) == ((1L, 3L, 0)))
    assert(out(3L) == ((1L, 3L, 0)), "transitive closure must retire vec 3")
    (4L to 19L).foreach(id => assert(out(id) == ((id, 1L, 1)), s"vec $id not a kept singleton"))
  }
}
