package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Batch CSV source (SURVEY §2.1 S1-S4; reference `extract.py:29-119`). */
object Extract {

  /** S1: sampled schema inference — a schema-only pass over the file
    * (`extract.py:51-57`). Prefer [[graft.schema.CallDataSchema.csvSchema]]
    * for deterministic production runs; this exists for inference parity. */
  def inferSchema(spark: SparkSession, path: String, sampleRatio: Double = 0.01): StructType =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("samplingRatio", sampleRatio.toString)
      .csv(path)
      .schema

  /** S2+S3: typed CSV read with malformed-row drop (`extract.py:61-73`).
    *
    * `maxRows`: the reference sets a `maxRows` CSV option that Spark silently
    * ignores (SURVEY §2.9.1) — we implement the *intent* with `limit(n)`.
    * nullValue/nanValue "" make empty fields NULL, which the downstream fill
    * rules depend on. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              maxRows: Option[Int] = None): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .option("encoding", "UTF-8")
      .option("nullValue", "")
      .option("nanValue", "")
      .csv(path)
    maxRows.fold(df)(df.limit)
  }

  /** S1+S2 composed, the reference's two-pass flow (`safe_extract`). */
  def extract(spark: SparkSession, path: String,
              sampleRatio: Double = 0.01, maxRows: Option[Int] = None): DataFrame =
    readCsv(spark, path, inferSchema(spark, path, sampleRatio), maxRows)

  /** S4: disk-only persist (`extract.py:76`). Deviation from the reference
    * documented in SURVEY §3.1: the raw-scan persist there still recomputes
    * the whole 12-step transform chain per star-table write. Callers of the
    * full pipeline should persist *post-transform* instead (see
    * [[Load.saveStarSchema]]), which this helper also serves. */
  def persistDiskOnly(df: DataFrame): DataFrame = df.persist(StorageLevel.DISK_ONLY)

  /** P8/P9 (`extract.py:121-147`): data-quality validation. Note the
    * reference defines but never calls this from main (SURVEY §5) — we wire
    * it into the pipeline for real. */
  def validate(df: DataFrame, requiredColumns: Seq[String]): Unit = {
    require(!df.isEmpty, "extracted DataFrame is empty")
    val missing = requiredColumns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
  }
}
