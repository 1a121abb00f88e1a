package graft.schema

import org.apache.spark.sql.types._

/** Schema/data-model constants for the Seattle 911 CAD call workload
  * (SURVEY §1; reference `ETL_Pipeline_Batch/`).
  *
  * The reference infers its CSV schema from a 1% sample
  * (`extract.py:51-57`); we also ship the hand-declared `StructType`
  * (preferred for determinism, SURVEY §1.3) reconstructed from every column
  * the reference code touches (FIXTURES.md §1).
  */
object CallDataSchema {

  /** `transform.py:119-128` — exact normalization order matters:
    * "(s)" → "s", spaces → "_", lowercase, "-" → "_". */
  def toSnakeCase(name: String): String =
    name.replace("(s)", "s").replace(" ", "_").toLowerCase.replace("-", "_")

  /** `transform.py:43-58` — the 14 raw timestamp columns, in reference order. */
  val timestampColumns: Seq[String] = Seq(
    "CAD Event Original Time Queued",
    "CAD Event Arrived Time",
    "Call Sign Dispatch Time",
    "First CARE Call Sign At Scene Time",
    "First CARE Call Sign Dispatch Time",
    "First Co-Response Call Sign At Scene Time",
    "First Co-Response Call Sign Dispatch Time",
    "First SPD Call Sign at Scene Time",
    "First SPD Call Sign Dispatch Time",
    "Last CARE Call Sign In-Service Time",
    "Last Co-Response Call Sign In-Service Time",
    "Last SPD Call Sign In-Service Time",
    "Call Sign at Scene Time",
    "Call Sign In-Service Time")

  /** `transform.py:101-108` — agency pair + geo columns dropped post-merge. */
  val columnsToDrop: Seq[String] = Seq(
    "First SPD Call Sign at Scene Time", "First CARE Call Sign At Scene Time",
    "First SPD Call Sign Dispatch Time", "First CARE Call Sign Dispatch Time",
    "Last SPD Call Sign In-Service Time", "Last CARE Call Sign In-Service Time",
    "CARE Call Sign Total Service Time (s)", "SPD Call Sign Total Service Time (s)",
    "First CARE Call Sign Dispatch Delay Time (s)", "First SPD Call Sign Dispatch Delay Time (s)",
    "First CARE Call Sign Response Time (s)", "First SPD Call Sign Response Time (s)",
    "Dispatch Longitude", "Dispatch Latitude", "Dispatch Reporting Area")

  /** `transform.py:73-95` — (target, spd/care source pair) coalesce merges. */
  val responseMerges: Seq[(String, String, String)] = Seq(
    ("first_response_at_scene_time", "First SPD Call Sign at Scene Time", "First CARE Call Sign At Scene Time"),
    ("first_response_dispatch_time", "First SPD Call Sign Dispatch Time", "First CARE Call Sign Dispatch Time"),
    ("last_response_in_service_time", "Last SPD Call Sign In-Service Time", "Last CARE Call Sign In-Service Time"),
    ("total_service_time_s", "CARE Call Sign Total Service Time (s)", "SPD Call Sign Total Service Time (s)"),
    ("dispatch_delay_time_s", "First CARE Call Sign Dispatch Delay Time (s)", "First SPD Call Sign Dispatch Delay Time (s)"),
    ("first_response_time_s", "First CARE Call Sign Response Time (s)", "First SPD Call Sign Response Time (s)"))

  /** Declared CSV schema (raw Title-Case headers; timestamps arrive as AM/PM
    * strings, `(s)` duration columns as ints — what inferSchema yields). */
  val csvSchema: StructType = {
    def s(n: String) = StructField(n, StringType, nullable = true)
    def i(n: String) = StructField(n, IntegerType, nullable = true)
    def d(n: String) = StructField(n, DoubleType, nullable = true)
    StructType(Seq(
      StructField("CAD Event Number", LongType, nullable = true),
      s("CAD Event Clearance Description"),
      s("Call Type"),
      i("Priority"),
      s("Initial Call Type"),
      s("Final Call Type"),
      s("CAD Event Response Category"),
      s("Call Type Received Classification"),
      s("Call Type Indicator"),
      s("CAD Event Original Time Queued"),
      s("CAD Event Arrived Time"),
      i("CAD Event First Response Time (s)"),
      s("Call Sign Dispatch ID"),
      s("Call Sign Dispatch Time"),
      s("Call Sign at Scene Time"),
      s("Call Sign In-Service Time"),
      i("Call Sign Dispatch Delay Time (s)"),
      i("Call Sign Response Time (s)"),
      i("Call Sign Total Service Time (s)"),
      s("First SPD Call Sign at Scene Time"),
      s("First SPD Call Sign Dispatch Time"),
      s("Last SPD Call Sign In-Service Time"),
      i("SPD Call Sign Total Service Time (s)"),
      i("First SPD Call Sign Dispatch Delay Time (s)"),
      i("First SPD Call Sign Response Time (s)"),
      s("First CARE Call Sign At Scene Time"),
      s("First CARE Call Sign Dispatch Time"),
      s("Last CARE Call Sign In-Service Time"),
      i("CARE Call Sign Total Service Time (s)"),
      i("First CARE Call Sign Dispatch Delay Time (s)"),
      i("First CARE Call Sign Response Time (s)"),
      s("First Co-Response Call Sign At Scene Time"),
      s("First Co-Response Call Sign Dispatch Time"),
      s("Last Co-Response Call Sign In-Service Time"),
      i("First Co-Response Call Sign Dispatch Delay Time (s)"),
      i("First Co-Response Call Sign Response Time (s)"),
      s("Dispatch Precinct"),
      s("Dispatch Sector"),
      s("Dispatch Beat"),
      s("Dispatch Neighborhood"),
      d("Dispatch Longitude"),
      d("Dispatch Latitude"),
      s("Dispatch Reporting Area")))
  }

  /** `load.py:99-173` — the six star-schema projections (exact column lists). */
  val starTables: Seq[(String, Seq[String])] = Seq(
    "fact_call" -> Seq(
      "call_sign_dispatch_time", "call_sign_dispatch_delay_time_s",
      "call_sign_response_time_s", "call_sign_total_service_time_s",
      "dim_care_spd_id", "dim_co_response_id", "dim_cad_event_id",
      "dim_location_id", "dim_call_sign_id"),
    "dim_care_spd" -> Seq(
      "call_sign_dispatch_id", "dim_care_spd_id",
      "first_response_dispatch_time", "last_response_in_service_time",
      "first_response_time_s", "dispatch_delay_time_s",
      "first_response_at_scene_time"),
    "dim_co_response" -> Seq(
      "call_sign_dispatch_id", "dim_co_response_id",
      "first_co_response_call_sign_at_scene_time",
      "first_co_response_call_sign_dispatch_time",
      "last_co_response_call_sign_in_service_time",
      "first_co_response_call_sign_dispatch_delay_time_s",
      "first_co_response_call_sign_response_time_s"),
    "dim_cad_event" -> Seq(
      "call_sign_dispatch_id", "dim_cad_event_id", "priority",
      "cad_event_number", "cad_event_clearance_description", "call_type",
      "initial_call_type", "final_call_type", "cad_event_response_category",
      "cad_event_original_time_queued", "call_type_received_classification",
      "cad_event_arrived_time", "call_type_indicator", "unit_id",
      "cad_event_first_response_time_s"),
    "dim_location" -> Seq(
      "call_sign_dispatch_id", "dim_location_id", "dispatch_precinct",
      "dispatch_sector", "dispatch_beat", "dispatch_neighborhood"),
    "dim_call_sign" -> Seq(
      "call_sign_dispatch_id", "dim_call_sign_id", "call_sign_dispatch_time",
      "call_sign_at_scene_time", "call_sign_in_service_time"))

  /** `extract.py:136-140` — required raw columns for validation. */
  val requiredRawColumns: Seq[String] = Seq("CAD Event Number", "Call Type", "Priority")

  /** `transform.py:226-234` — post-transform required columns. */
  val requiredTransformedColumns: Seq[String] = Seq(
    "call_sign_dispatch_id", "call_sign_dispatch_time",
    "dim_care_spd_id", "dim_co_response_id", "dim_cad_event_id",
    "dim_location_id", "dim_call_sign_id")
}
