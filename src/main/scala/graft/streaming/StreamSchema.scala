package graft.streaming

import org.apache.spark.sql.types._

/** The stream's fixed 45-field schema (`consumer_cassandra.py:18-82`),
  * declared field-for-field including the reference's deliberate quirks
  * (SURVEY §1.3, §2.9.6): API field names are snake_case with a
  * trailing-underscore `_s_` convention for duration fields; many numerics
  * arrive as strings and are cleaned/cast later (E8); four SPD/CARE time
  * fields are typed String here though their twins are Timestamp.
  */
object StreamSchema {

  val schema: StructType = StructType(Seq(
    StructField("cad_event_number", StringType),
    StructField("cad_event_clearance_description", StringType),
    StructField("call_type", StringType),
    StructField("priority", StringType),
    StructField("initial_call_type", StringType),
    StructField("final_call_type", StringType),
    StructField("cad_event_original_time_queued", TimestampType),
    StructField("cad_event_arrived_time", TimestampType),
    StructField("dispatch_precinct", StringType),
    StructField("dispatch_sector", StringType),
    StructField("dispatch_beat", StringType),
    StructField("dispatch_longitude", StringType),
    StructField("dispatch_latitude", StringType),
    StructField("dispatch_reporting_area", StringType),
    StructField("cad_event_response_category", StringType),
    StructField("call_sign_dispatch_id", StringType),
    StructField("call_sign_dispatch_time", TimestampType),
    StructField("first_care_call_sign_at_scene_time", TimestampType),
    StructField("first_care_call_sign_dispatch_time", TimestampType),
    StructField("first_co_response_call_sign_at_scene_time", TimestampType),
    StructField("first_co_response_call_sign_dispatch_time", TimestampType),
    StructField("first_spd_call_sign_at_scene_time", StringType),   // sic — string, not ts
    StructField("first_spd_call_sign_dispatch_time", StringType),   // sic
    StructField("last_care_call_sign_in_service_time", StringType), // sic
    StructField("last_co_response_call_sign_in_service_time", TimestampType),
    StructField("last_spd_call_sign_in_service_time", TimestampType),
    StructField("care_call_sign_total_service_time_s_", StringType),
    StructField("co_response_call_sign_total_service_time_s_", StringType),
    StructField("spd_call_sign_total_service_time_s_", StringType),
    StructField("call_sign_total_service_time_s_", StringType),
    StructField("first_care_call_sign_dispatch_delay_time_s_", StringType),
    StructField("first_care_call_sign_response_time_s_", StringType),
    StructField("first_co_response_call_sign_dispatch_delay_time_s_", StringType),
    StructField("first_co_response_call_sign_response_time_s_", StringType),
    StructField("first_spd_call_sign_dispatch_delay_time_s_", StringType),
    StructField("first_spd_call_sign_response_time_s_", StringType),
    StructField("call_sign_dispatch_delay_time_s_", StringType),
    StructField("call_sign_response_time_s_", StringType),
    StructField("call_sign_at_scene_time", TimestampType),
    StructField("cad_event_first_response_time_s_", StringType),
    StructField("call_sign_in_service_time", TimestampType),
    StructField("call_type_indicator", StringType),
    StructField("dispatch_neighborhood", StringType),
    StructField("call_type_received_classification", StringType),
    StructField("processed_at", StringType)))

  /** E8 (`consumer_cassandra.py:165-196`): the 13 dirty duration columns. */
  val durationColumns: Seq[String] = Seq(
    "care_call_sign_total_service_time_s_",
    "co_response_call_sign_total_service_time_s_",
    "spd_call_sign_total_service_time_s_",
    "call_sign_total_service_time_s_",
    "first_care_call_sign_dispatch_delay_time_s_",
    "first_care_call_sign_response_time_s_",
    "first_co_response_call_sign_dispatch_delay_time_s_",
    "first_co_response_call_sign_response_time_s_",
    "first_spd_call_sign_dispatch_delay_time_s_",
    "first_spd_call_sign_response_time_s_",
    "call_sign_dispatch_delay_time_s_",
    "call_sign_response_time_s_",
    "cad_event_first_response_time_s_")
}
