package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run (SURVEY §5.1) —
  * mirrors Verify/Bench session config exactly. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // catalog tables (bucketing tests) go to a throwaway warehouse — a
      // persistent ./spark-warehouse leaks LOCATION_ALREADY_EXISTS across
      // JVMs (fresh in-memory metastore, surviving directory)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
