package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.Det._
import graft.sql.{DetSql => D}

/** Scalar-function operators (SURVEY.md §2.B "Scalar functions").
  * String/date/math/array/json/map expression coverage. Cross-engine
  * traps handled: regexes stay in the POSIX-common subset; ROUND only
  * on decimals (both engines round half-away-from-zero there — DuckDB's
  * decimal->decimal CAST truncates, so casts must stay lossless);
  * FLOOR/CEIL exported as BIGINT (DuckDB returns DOUBLE); timestamps
  * exported as epoch BIGINT. */
object Scalars {

  def qFnString(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey"),
      upper(col("p_name")).as("up_name"),
      lower(col("p_type")).as("lo_type"),
      length(col("p_name")).cast("int").as("len_name"),
      substring(col("p_type"), 1, 5).as("sub_type"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_us"),
      element_at(split(col("p_name"), " "), 1).as("first_tok"),
      regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"),
    ).orderBy("p_partkey")

  def qFnDate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      dayofmonth(col("o_orderdate")).cast("long").as("d"),
      unix_timestamp(date_trunc("month", col("o_orderdate"))).as("month_epoch"),
      unix_timestamp(expr("o_orderdate + INTERVAL 30 DAYS")).as("plus30_epoch"),
      expr("unix_timestamp(o_orderdate) DIV 86400").as("epoch_day"),
    ).orderBy("o_orderkey")

  def qFnMath(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_quantity") - 25.0).as("abs_q"),
      floor(col("l_extendedprice") / 100.0).as("floor_p"),
      ceil(col("l_extendedprice") / 100.0).as("ceil_p"),
      (col("l_orderkey") % 7).as("mod_ok"),
      pow(col("l_linenumber"), 2).as("pow_ln"),
      round(dec(col("l_extendedprice")), 0).cast("long").as("round_p"),
      // sort covers the independent output columns: (l_orderkey,
      // l_linenumber) is non-unique in the generated lineitem
      // (round-8 10x sweep fix, see Scans); mod_ok/pow_ln are
      // functions of the key columns, ceil/round follow from the
      // price as floor does except at exact boundaries — include them
    ).orderBy("l_orderkey", "l_linenumber", "abs_q", "floor_p",
              "ceil_p", "round_p")

  /** ArrayType + Generator (posexplode): per-dimension stats over the
    * first 8 embedding dims. */
  def qFnArray(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .filter(col("pos") < 8)
      .groupBy((col("pos") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
           sum(decf(col("x"))).cast("double").as("sum_x"),
           min(col("x")).as("min_x"),
           max(col("x")).as("max_x"))
      .orderBy("dim")

  def qFnJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
              get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"),
           max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** MapType round-trip: build map(event_type -> value), read back
    * keys/values. Oracle mirrors with DuckDB MAP functions. */
  def qFnMap(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
              map(col("event_type"), col("value")).as("m"))
      .select(col("event_id"),
              element_at(map_keys(col("m")), 1).as("k"),
              element_at(map_values(col("m")), 1).as("v"))
      .orderBy("event_id")

  /** StructType round-trip: pack columns into nested structs, compare
    * structs field-order-lexicographically (Catalyst struct ordering)
    * to pick one, then read fields back out flat. Structs stay
    * unserialized inside whole-stage codegen — this is the typed-row
    * surface, not a UDF. */
  def qFnStruct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
              struct(col("o_custkey").as("ck"),
                     col("o_orderpriority").as("pri")).as("os"),
              struct(col("o_totalprice").as("tp"),
                     col("o_orderdate").as("dt")).as("pd"))
      .select(col("o_orderkey"),
              col("os.ck").as("ck"),
              col("os.pri").as("pri"),
              // struct comparison: (tp, dt) vs a pinned constant struct,
              // Catalyst orders field-by-field like SQL row comparison
              (col("pd") > struct(lit(100000.0).as("tp"),
                 lit("1995-01-01").cast("timestamp").as("dt")))
                .as("big_late"),
              col("pd.tp").as("tp"),
              unix_timestamp(col("pd.dt")).as("dt_epoch"))
      .filter(col("ck") % 50 === 0)
      .orderBy("o_orderkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_struct" -> (qFnStruct _),
    "q_fn_string" -> (qFnString _),
    "q_fn_date" -> (qFnDate _),
    "q_fn_math" -> (qFnMath _),
    "q_fn_array" -> (qFnArray _),
    "q_fn_json" -> (qFnJson _),
    "q_fn_map" -> (qFnMap _),
  )

  val oracle: Map[String, String] = Map(
    "q_fn_struct" ->
      """SELECT o_orderkey, o_custkey AS ck, o_orderpriority AS pri,
        |  (o_totalprice > 100000.0 OR (o_totalprice = 100000.0
        |     AND o_orderdate > TIMESTAMP '1995-01-01')) AS big_late,
        |  o_totalprice AS tp,
        |  CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS dt_epoch
        |FROM orders WHERE o_custkey % 50 = 0 ORDER BY o_orderkey""".stripMargin,
    "q_fn_string" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS up_name,
        |  LOWER(p_type) AS lo_type,
        |  CAST(LENGTH(p_name) AS INTEGER) AS len_name,
        |  SUBSTRING(p_type, 1, 5) AS sub_type,
        |  p_brand || '#' || p_type AS brand_type,
        |  REPLACE(p_name, ' ', '_') AS name_us,
        |  SPLIT_PART(p_name, ' ', 1) AS first_tok,
        |  REGEXP_EXTRACT(p_brand, '[0-9]+') AS brand_num
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_fn_date" ->
      """SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS BIGINT) AS y,
        |  CAST(MONTH(o_orderdate) AS BIGINT) AS m,
        |  CAST(DAY(o_orderdate) AS BIGINT) AS d,
        |  CAST(FLOOR(EPOCH(DATE_TRUNC('month', o_orderdate))) AS BIGINT) AS month_epoch,
        |  CAST(FLOOR(EPOCH(o_orderdate + INTERVAL 30 DAY)) AS BIGINT) AS plus30_epoch,
        |  CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) // 86400 AS epoch_day
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fn_math" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ABS(l_quantity - 25.0) AS abs_q,
         |  CAST(FLOOR(l_extendedprice / 100.0) AS BIGINT) AS floor_p,
         |  CAST(CEIL(l_extendedprice / 100.0) AS BIGINT) AS ceil_p,
         |  l_orderkey % 7 AS mod_ok,
         |  POW(l_linenumber, 2) AS pow_ln,
         |  CAST(ROUND(${D.dec("l_extendedprice")}, 0) AS BIGINT) AS round_p
         |FROM lineitem
         |ORDER BY l_orderkey, l_linenumber, abs_q, floor_p, ceil_p,
         |  round_p""".stripMargin,
    "q_fn_array" ->
      s"""SELECT i AS dim, COUNT(*) AS n,
         |  CAST(SUM(${D.decf("embedding[i]")}) AS DOUBLE) AS sum_x,
         |  MIN(embedding[i]) AS min_x,
         |  MAX(embedding[i]) AS max_x
         |FROM embeddings, GENERATE_SERIES(1, 8) AS g(i)
         |GROUP BY i ORDER BY dim""".stripMargin,
    "q_fn_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS min_k,
        |  MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_fn_map" ->
      """SELECT event_id,
        |  MAP_KEYS(MAP([event_type], [value]))[1] AS k,
        |  MAP_VALUES(MAP([event_type], [value]))[1] AS v
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
