package graft.tools

/** SQL entry point: registers the testdata tables as temp views and runs the
  * given SQL with the graft extensions active (`to_24h` etc.).
  *
  * Usage: runMain graft.tools.RunSql <sfDir> "<sql>" ["<sql>"...]
  */
object RunSql {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunSql <sfDir> <sql> [<sql>...]")
    val sfDir = args.head
    val spark = graft.util.Sessions.build("graft-sql")
    try {
      graft.util.Tables.all(spark, sfDir).foreach { case (name, df) =>
        df.createOrReplaceTempView(name)
      }
      args.drop(1).foreach { sql =>
        println(s"\n[sql] $sql")
        spark.sql(sql).show(20, truncate = false)
      }
    } finally spark.stop()
  }
}
