package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.CurationPipeline

/** Streaming twin of the batch curation pipeline: the same quality gates
  * applied per micro-batch over an unbounded document stream, with
  * content-fingerprint dedup as BOUNDED streaming state.
  *
  * State discipline (100 TB framing): `dropDuplicatesWithinWatermark`
  * keys the state store on the 16-byte fingerprint and evicts entries
  * once the watermark passes — without the watermark the fingerprint set
  * would grow with the corpus forever. Quality and language gates are
  * stateless row filters; everything else (near-dup LSH, sampling) stays
  * batch-side where a global view exists.
  */
object CurationStream {

  /** @param docs   streaming DataFrame with `tsCol` (event time), `text`,
    *               `lang` columns
    * @param cfg    the batch pipeline's gate configuration (shared — the
    *               two paths must agree on what "clean" means)
    * @param watermark dedup-state horizon: a duplicate arriving later than
    *               this past the max event time may be re-admitted */
  def curate(docs: DataFrame,
             cfg: CurationPipeline.Config = CurationPipeline.Config(),
             tsCol: String = "ts",
             watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .withColumn("__fp", TextFunctions.fingerprint(col("text")))
      .dropDuplicatesWithinWatermark("__fp")
      .filter(length(col("text")).between(cfg.minChars, cfg.maxChars))
      .filter(TextFunctions.stopwordRatioBp(col("text")) >= cfg.minStopwordBp)
      .filter(col("lang").isInCollection(cfg.keepLangs))
      .drop("__fp")
}
