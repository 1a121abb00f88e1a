package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** MERGE semantics truth table: update, insert, survive — and the
  * null-update case coalesce-based merges get wrong. */
class UpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("source updates matched keys, inserts new keys, target survives otherwise") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val source = Seq((2L, "B"), (4L, "D")).toDF("k", "v")
    val got = Upsert.upsert(target, source, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D"))
  }

  test("a matched source row can update a column TO null") {
    import spark.implicits._
    val target = Seq((1L, Some("a"))).toDF("k", "v")
    val source = Seq((1L, None: Option[String])).toDF("k", "v")
    val got = Upsert.upsert(target, source, Seq("k")).collect().head
    assert(got.isNullAt(1), "null update must overwrite, not fall back to target")
  }

  test("mismatched schemas are rejected") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    val source = Seq((1L, "a", "x")).toDF("k", "v", "extra")
    intercept[IllegalArgumentException] {
      Upsert.upsert(target, source, Seq("k"))
    }
  }
}
