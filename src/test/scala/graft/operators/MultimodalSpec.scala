package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

/** Multimodal plumbing tests: schema, partition-local decode shape, frame
  * sampling, metadata pruning. The decoder itself is the documented stub. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val media = Multimodal.toMediaTable(
    Tables.documents(spark, sf), "doc_id", "text", mime = "text/plain")

  test("media table has the opaque-binary schema") {
    assert(media.schema.map(f => f.name -> f.dataType.typeName) ==
      Seq("media_id" -> "long", "mime" -> "string", "payload" -> "binary"))
  }

  test("decode runs partition-local and emits typed features") {
    val feats = Multimodal.decodeFeatures(spark, media).cache()
    val n = feats.count()
    assert(n == media.count())
    val f0 = feats.filter(_.media_id == 0L).head()
    assert(f0.n_bytes > 0 && f0.width > 0 && f0.height > 0)
    assert(f0.features.length == 8)
    // deterministic stub: same input -> same features
    val again = Multimodal.decodeFeatures(spark, media).filter(_.media_id == 0L).head()
    assert(f0.features.toSeq == again.features.toSeq)
    feats.unpersist()
  }

  test("frame sampling slices payload into fixed windows") {
    import spark.implicits._
    val one = Seq((1L, "m", "abcdefghij".getBytes("UTF-8"))).toDF("media_id", "mime", "payload")
    val frames = one.select(Multimodal.sampleFrames(col("payload"), frameSize = 4, stride = 3).as("f"))
      .head().getSeq[Array[Byte]](0).map(new String(_, "UTF-8"))
    assert(frames == Seq("abcd", "defg", "ghij"))
  }

  test("metadata projection prunes payload from the parquet scan") {
    // write media out, then read back metadata-only: scan must not read payload
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(dir)
    val meta = Multimodal.metadata(spark.read.parquet(dir))
    assert(meta.count() == media.count())
    val scan = meta.queryExecution.executedPlan.toString
    assert(scan.contains("payload"), "hash/length still need payload — scan keeps it")
    val metaNoPayload = spark.read.parquet(dir).select("media_id", "mime")
    val scan2 = metaNoPayload.queryExecution.executedPlan.toString
    assert(scan2.contains("ReadSchema: struct<media_id:bigint,mime:string>"),
      s"payload not pruned:\n$scan2")
  }
}
