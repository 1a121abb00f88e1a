package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: derive a larger benchmark tier from a driver-generated one by
  * replicating each table `copies`× with key columns shifted per copy, so
  * uniqueness and every foreign-key relationship survive (copy c of
  * lineitem joins copy c of orders/part/supplier, etc.). The fixed-size
  * dimension tables region/nation are NOT replicated — true to TPC-H,
  * they are constant at any scale factor, and the unshifted nationkey
  * references stay valid.
  *
  * `events.ts` is normalized to a session-zone microsecond timestamp
  * (whatever the source tier's physical type — see
  * [[graft.util.Tables.normalizeEventTs]]); replicated events share
  * timestamps, which is safe because every order-sensitive query
  * tie-breaks on the (shifted, unique) event_id.
  *
  * With the optional `mutate-docs` flag, each document copy is passed
  * through a per-copy character-substitution cipher (`translate` with a
  * deterministic seeded permutation of [a-z0-9]): within-copy Jaccard and
  * edit distances are EXACTLY the original corpus' (bijective character
  * maps preserve both), cross-copy token overlap drops to chance, and —
  * unlike a token-suffix mutation — the cipher adds NO shared substrings,
  * so gram/token frequency distributions stay isomorphic to the original
  * (a suffix variant was tried first and its shared `_c` grams became
  * boilerplate hot keys that blew up the q-gram equi-join). The true
  * near-dup answer thus grows linearly (copies×) with the corpus instead
  * of quadratically (clone groups of size `copies`) — the
  * controlled-density fixture for measuring candidate-generation scaling:
  * a sub-quadratic candidate stage must track the copies× answer, not the
  * copies²× naive pair space.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <copies>
  *          [mutate-docs] [only=t1,t2,...]
  * `only=` restricts derivation to the named tables — e.g. a cipher tier
  * that differs from the plain tier in `documents` alone need not rewrite
  * the other 16 GB of fact tables (symlink them instead).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val flags = args.drop(3)
    val mutateDocs = flags.contains("mutate-docs")
    val only: Option[Set[String]] = flags.find(_.startsWith("only="))
      .map(_.stripPrefix("only=").split(',').toSet)
    val spark = graft.util.Sessions.build("graft-scaleup",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val stride = 100000000L // larger than any key in the driver tiers
    val keyCols: Seq[(String, Seq[String])] = Seq(
      "region" -> Seq.empty,
      "nation" -> Seq.empty,
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    keyCols.filter { case (t, _) => only.forall(_.contains(t)) }.foreach { case (t, keys) =>
      val raw = spark.read.parquet(s"$src/$t.parquet")
      val base =
        if (t == "events") graft.util.Tables.normalizeEventTs(raw, "ts")
        else raw
      val out = if (keys.isEmpty) base else
        (0 until copies).map { c =>
          val shifted = keys.foldLeft(base)((d, k) => d.withColumn(k, col(k) + lit(c * stride)))
          if (mutateDocs && t == "documents") {
            val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
            val perm = new scala.util.Random(c).shuffle(alphabet.toList).mkString
            // translate preserves length, so n_chars and the length-bucket
            // blocking columns stay valid without recomputation
            shifted.withColumn("text", translate(col("text"), alphabet, perm))
          } else shifted
        }.reduce(_.unionByName(_))
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t -> ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
