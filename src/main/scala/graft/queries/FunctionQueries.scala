package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.util.Tables._

/** Scalar-function family coverage (string / date / math / conditional /
  * array) — the breadth a migrating user expects, each family as one
  * composite oracle-checked query. */
object FunctionQueries {

  /** String family: concat, upper/lower, trim variants, lpad, substring,
    * replace, length, reverse, split-element access. */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(
        col("p_partkey"),
        concat_ws("::", upper(col("p_brand")), lower(col("p_type"))).as("tagged"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        substring(col("p_name"), 1, 5).as("prefix"),
        translate(col("p_name"), " ", "_").as("underscored"),
        reverse(col("p_brand")).as("rev_brand"),
        length(col("p_type")).as("type_len"),
        split(col("p_name"), " ").getItem(0).as("first_word"))
      .orderBy("p_partkey")

  /** Date family: year/month/day, date_add, last_day, months_between-free
    * date arithmetic, quarter. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due_date"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy("o_orderkey")

  /** Math family on exact integer/decimal arithmetic: abs, mod, ceil/floor,
    * sign, greatest/least, integer power. */
  def mathFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_linenumber") - 4).as("abs_off"),
        pmod(col("l_orderkey"), lit(7)).as("mod7"),
        ceil(col("l_quantity") / 10).cast("long").as("qty_decile_hi"),
        floor(col("l_quantity") / 10).cast("long").as("qty_decile_lo"),
        signum(col("l_quantity") - 25).cast("int").as("sign_off"),
        greatest(col("l_linenumber"), lit(3)).as("gmax"),
        least(col("l_linenumber"), lit(3)).as("lmin"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Conditional/null family: nullif, ifnull-style coalesce, nvl2 shape,
    * CASE over ranges. */
  def conditionalFuncs(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(
        col("c_custkey"),
        expr("nullif(c_mktsegment, 'BUILDING')").as("seg_nb"),
        coalesce(expr("nullif(c_mktsegment, 'BUILDING')"), lit("WAS_BUILDING")).as("seg_filled"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_band"))
      .orderBy("c_custkey")

  /** Array family over real arrays (embeddings) and split text: size,
    * element access, slice, contains, sort, distinct count. */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).cast(DecimalType(18, 6)).cast("double").as("first"),
        round(element_at(col("embedding"), -1).cast("double"), 6).cast(DecimalType(18, 6)).cast("double").as("last"),
        round(aggregate(slice(col("embedding"), 1, 4),
          lit(0.0), (acc, x) => acc + x.cast("double")), 6).cast(DecimalType(18, 6)).cast("double").as("head4_sum"),
        round(array_max(transform(col("embedding"), x => x.cast("double"))), 6)
          .cast(DecimalType(18, 6)).cast("double").as("vmax"))
      .orderBy("vec_id")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs"      -> (stringFuncs _),
    "q_date_funcs"        -> (dateFuncs _),
    "q_math_funcs"        -> (mathFuncs _),
    "q_conditional_funcs" -> (conditionalFuncs _),
    "q_array_funcs"       -> (arrayFuncs _),
  )

  val oracle: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey,
                upper(p_brand) || '::' || lower(p_type) AS tagged,
                lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
                substr(p_name, 1, 5) AS prefix,
                replace(p_name, ' ', '_') AS underscored,
                reverse(p_brand) AS rev_brand,
                length(p_type) AS type_len,
                string_split(p_name, ' ')[1] AS first_word
         FROM part ORDER BY p_partkey""",
    "q_date_funcs" ->
      """SELECT o_orderkey,
                year(o_orderdate) AS y, month(o_orderdate) AS m,
                day(o_orderdate) AS dom, quarter(o_orderdate) AS q,
                strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
                strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
         FROM orders ORDER BY o_orderkey""",
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
                abs(l_linenumber - 4) AS abs_off,
                l_orderkey % 7 AS mod7,
                CAST(ceil(l_quantity / 10) AS BIGINT) AS qty_decile_hi,
                CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile_lo,
                CAST(sign(l_quantity - 25) AS INTEGER) AS sign_off,
                greatest(l_linenumber, 3) AS gmax,
                least(l_linenumber, 3) AS lmin
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_conditional_funcs" ->
      """SELECT c_custkey,
                nullif(c_mktsegment, 'BUILDING') AS seg_nb,
                coalesce(nullif(c_mktsegment, 'BUILDING'), 'WAS_BUILDING') AS seg_filled,
                CASE WHEN c_acctbal < 0 THEN 'neg'
                     WHEN c_acctbal < 5000 THEN 'low'
                     ELSE 'high' END AS bal_band
         FROM customer ORDER BY c_custkey""",
    "q_array_funcs" ->
      """SELECT vec_id,
                len(embedding) AS dim,
                CAST(CAST(round(CAST(embedding[1] AS DOUBLE), 6) AS DECIMAL(18,6)) AS DOUBLE) AS first,
                CAST(CAST(round(CAST(embedding[-1] AS DOUBLE), 6) AS DECIMAL(18,6)) AS DOUBLE) AS last,
                CAST(CAST(round(list_reduce(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)),
                                       (a,b) -> a + b), 6) AS DECIMAL(18,6)) AS DOUBLE) AS head4_sum,
                CAST(CAST(round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS DECIMAL(18,6)) AS DOUBLE) AS vmax
         FROM embeddings ORDER BY vec_id""",
  )
}
