package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2 B.8): string / date / math /
  * array (incl. higher-order) / json / cast+case.
  *
  * Everything here is built-in `org.apache.spark.sql.functions` — fully
  * codegen'd, Catalyst-visible (no UDF opacity), vectorizable. Type
  * alignment with DuckDB is explicit where engines' return types differ
  * (Spark length->INT vs DuckDB BIGINT, Spark ceil->BIGINT vs DuckDB
  * DOUBLE, etc.) — the oracle SQL carries the normalizing casts.
  */
object Funcs {

  def qStrFuncs(s: SparkSession, sf: String): DataFrame =
    Tables.part(s, sf)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        substring(col("p_name"), 1, 5).as("sub5"),
        length(col("p_name")).as("len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        size(split(col("p_name"), " ")).as("n_words"),
        levenshtein(col("p_name"), lower(col("p_type"))).as("lev_name_type"))
      .orderBy("p_partkey")

  def qDateFuncs(s: SparkSession, sf: String): DataFrame =
    // orderBy first: lanes run post-sort in parallel (see qMathFuncs)
    Tables.orders(s, sf)
      .orderBy("o_orderkey")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus30"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_95"),
        last_day(col("o_orderdate")).as("eom"))

  def qMathFuncs(s: SparkSession, sf: String): DataFrame =
    // orderBy BEFORE the lanes: the Project stays above the Sort, so the
    // per-row lanes run in the parallel post-exchange stage instead of
    // fusing into the one-task scan of the unsplittable input (the sort
    // keys are base columns, so rows, values and output order are
    // identical either way)
    Tables.lineitem(s, sf)
      .orderBy("l_orderkey", "l_linenumber")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") * lit(-1)).as("abs_price"),
        ceil(col("l_extendedprice")).as("ceil_price"),
        floor(col("l_extendedprice")).as("floor_price"),
        sqrt(col("l_extendedprice")).as("sqrt_price"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"))

  /** Higher-order functions over the embedding vector — the whole point:
    * vector math stays inside codegen'd Catalyst expressions, no UDF. */
  def qArrayFuncs(s: SparkSession, sf: String): DataFrame =
    Tables.embeddings(s, sf)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        col("embedding").getItem(0).cast("double").as("first_comp"),
        element_at(col("embedding"), -1).cast("double").as("last_comp"),
        array_max(col("embedding")).cast("double").as("max_comp"),
        array_min(col("embedding")).cast("double").as("min_comp"),
        expr("size(filter(embedding, x -> x > 0))").as("n_pos"),
        expr("aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("sq_norm"))
      .orderBy("vec_id")

  /** Schema'd JSON parse + aggregate: props parsed ONCE with from_json
    * into a typed struct (single pass over the payload, single shuffle —
    * no per-field get_json_object re-parse, no redundant re-aggregation). */
  def qJsonMap(s: SparkSession, sf: String): DataFrame =
    Tables.events(s, sf)
      .withColumn("k", expr("from_json(props, 'k INT').k"))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).cast("long").as("sum_k"))
      .orderBy("user_id", "event_type")

  /** Schema'd JSON round-trip (SURVEY.md §2 B.8, the reference's A2/A7
    * parse/format analogue): from_json to a typed struct AND a MapType,
    * field access on both, then to_json back out. */
  def qJsonRoundtrip(s: SparkSession, sf: String): DataFrame =
    // orderBy first: the two from_json parses and the to_json formats run
    // post-sort in parallel (see qMathFuncs)
    Tables.events(s, sf)
      .orderBy("event_id")
      .withColumn("j", expr("from_json(props, 'k INT')"))
      .withColumn("m", expr("from_json(props, 'map<string,int>')"))
      .select(
        col("event_id"),
        col("j.k").as("k"),
        element_at(col("m"), "k").as("k_from_map"),
        to_json(col("j")).as("js"),
        to_json(expr("named_struct('k', j.k * 2)")).as("js_doubled"))

  def qCastCase(s: SparkSession, sf: String): DataFrame =
    // orderBy first: lanes run post-sort in parallel (see qMathFuncs)
    Tables.lineitem(s, sf)
      .orderBy("l_orderkey", "l_linenumber")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity")).cast("int").as("qty_int"),
        col("l_orderkey").cast("string").as("key_str"),
        col("l_shipdate").cast("date").as("ship_date"),
        col("l_shipdate").cast("date").cast("string").as("ship_str"),
        when(col("l_returnflag") === "R",
          when(col("l_quantity") >= 25, "big_return").otherwise("small_return"))
          .otherwise(when(col("l_linestatus") === "O", "open").otherwise("closed"))
          .as("status_class"))

  /** MapType function surface over schema'd JSON: keys/values access and
    * the map higher-order functions (transform_values, map_filter) —
    * flattened to scalars for cross-engine comparability. */
  def qMapFuncs(s: SparkSession, sf: String): DataFrame =
    // orderBy first: the map parse + HOFs run post-sort in parallel (see
    // qMathFuncs)
    Tables.events(s, sf)
      .orderBy("event_id")
      .withColumn("m", expr("from_json(props, 'map<string,int>')"))
      .select(
        col("event_id"),
        expr("array_join(map_keys(m), ',')").as("keys"),
        expr("element_at(map_values(m), 1)").as("first_val"),
        expr("element_at(transform_values(m, (k, v) -> v * 2), 'k')").as("doubled"),
        expr("size(map_filter(m, (k, v) -> v > 50))").as("n_big"))

  /** ANSI-safe arithmetic: try_divide / try_add / try_cast return NULL
    * where strict ANSI mode would raise (division by zero, long overflow,
    * malformed cast) — the semantics a pipeline wants for dirty data.
    * Every capture kind exercises BOTH lanes on deterministic slices
    * (zero divisor where quantity = 25; overflow and bad-cast on the
    * l_orderkey % 100 = 0 slice). The failure lane is exception-backed
    * per row (~15-20 µs/row measured at sf0.1), so the dirty slice is
    * 1% — an expression whose try_ fails on EVERY row is a data bug
    * upstream, not a workload, and benching one distorts the board
    * (the pre-fix shape cost 30 s under honest materialization). */
  def qTryArith(s: SparkSession, sf: String): DataFrame =
    // orderBy first: the exception-backed try_ lanes run post-sort in
    // parallel (see qMathFuncs)
    Tables.lineitem(s, sf)
      .orderBy("l_orderkey", "l_linenumber")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(l_extendedprice, floor(l_quantity) - 25)").as("div_maybe0"),
        expr("try_add(l_orderkey, CASE WHEN l_orderkey % 100 = 0 " +
          "THEN CAST(9223372036854775807 AS BIGINT) " +
          "ELSE CAST(1000000 AS BIGINT) END)").as("add_ovf"),
        expr("try_cast(CASE WHEN l_orderkey % 100 = 0 THEN l_returnflag " +
          "ELSE CAST(l_linenumber AS STRING) END AS INT)").as("cast_bad"),
        expr("try_cast(cast(l_orderkey AS STRING) AS INT)").as("cast_ok"))

  /** Null-preserving generator: explode_outer keeps a row (with NULL) for
    * documents whose filtered token list is empty — the LEFT-JOIN-shaped
    * generator semantics a plain explode silently drops (an enrichment
    * pipeline that explodes and re-aggregates would lose those parents
    * entirely). Oracled by replacing the empty list with [NULL] before
    * DuckDB's unnest. */
  def qExplodeOuter(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> length(t) > 12)").as("lt"))
      .select(col("doc_id"), explode_outer(col("lt")).as("tok"))
      .orderBy(col("doc_id"), col("tok").asc_nulls_first)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_explode_outer" -> qExplodeOuter _,
    "q_try_arith" -> qTryArith _,
    "q_str_funcs" -> qStrFuncs _,
    "q_date_funcs" -> qDateFuncs _,
    "q_math_funcs" -> qMathFuncs _,
    "q_array_funcs" -> qArrayFuncs _,
    "q_json_map" -> qJsonMap _,
    "q_json_roundtrip" -> qJsonRoundtrip _,
    "q_map_funcs" -> qMapFuncs _,
    "q_cast_case" -> qCastCase _,
  )

  val oracle: Map[String, String] = Map(
    "q_explode_outer" ->
      """WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 12) AS lt FROM documents)
        |SELECT doc_id, unnest(CASE WHEN len(lt) = 0 THEN [NULL] ELSE lt END) AS tok
        |FROM d ORDER BY doc_id, tok NULLS FIRST""".stripMargin,
    "q_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice / nullif(floor(l_quantity) - 25, 0) AS div_maybe0,
        |       CASE WHEN l_orderkey % 100 = 0
        |            THEN (CASE WHEN l_orderkey > 0 THEN CAST(NULL AS BIGINT)
        |                       ELSE 9223372036854775807 END)
        |            ELSE l_orderkey + 1000000 END AS add_ovf,
        |       TRY_CAST(CASE WHEN l_orderkey % 100 = 0 THEN l_returnflag
        |                     ELSE CAST(l_linenumber AS VARCHAR) END AS INT) AS cast_bad,
        |       TRY_CAST(CAST(l_orderkey AS VARCHAR) AS INT) AS cast_ok
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_str_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up, substring(p_name, 1, 5) AS sub5,
        |       CAST(length(p_name) AS INT) AS len,
        |       concat_ws('-', p_brand, p_type) AS brand_type,
        |       replace(p_name, ' ', '_') AS snake,
        |       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |       trim('  ' || p_name || '  ') AS trimmed,
        |       CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
        |       CAST(levenshtein(p_name, lower(p_type)) AS INT) AS lev_name_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       CAST(dayofmonth(o_orderdate) AS INT) AS dom,
        |       date_trunc('month', o_orderdate) AS month_start,
        |       o_orderdate + INTERVAL 30 DAY AS plus30,
        |       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_95,
        |       last_day(o_orderdate) AS eom
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_extendedprice * -1) AS abs_price,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |       sqrt(l_extendedprice) AS sqrt_price,
        |       l_quantity * l_quantity AS qty_sq,
        |       round(ln(l_extendedprice), 6) AS ln_price,
        |       greatest(l_discount, l_tax) AS max_rate,
        |       least(l_discount, l_tax) AS min_rate,
        |       l_orderkey % 7 AS key_mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS INT) AS dim,
        |       CAST(embedding[1] AS DOUBLE) AS first_comp,
        |       CAST(embedding[-1] AS DOUBLE) AS last_comp,
        |       CAST(list_max(embedding) AS DOUBLE) AS max_comp,
        |       CAST(list_min(embedding) AS DOUBLE) AS min_comp,
        |       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |       list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_json_map" ->
      """SELECT user_id, event_type, count(*) AS cnt,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,
    // NOTE: this oracle (and q_json_roundtrip's) hardcodes the single-key
    // {"k": <int>} shape of events.props — the literal 'k' AS keys and the
    // positional map_values access are only equivalent to the Spark map
    // functions under that shape. The invariant is pinned by InvariantSpec
    // ("events.props is always exactly {\"k\": int}"), so a testdata
    // generator change breaks THAT test, not silently this oracle.
    "q_map_funcs" ->
      """SELECT event_id,
        |       'k' AS keys,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS first_val,
        |       CAST(json_extract_string(props, '$.k') AS INT) * 2 AS doubled,
        |       CAST(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50 THEN 1 ELSE 0 END AS INT) AS n_big
        |FROM events ORDER BY event_id""".stripMargin,
    "q_json_roundtrip" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k_from_map,
        |       '{"k":' || json_extract_string(props, '$.k') || '}' AS js,
        |       '{"k":' || CAST(CAST(json_extract_string(props, '$.k') AS INT) * 2 AS VARCHAR) || '}' AS js_doubled
        |FROM events ORDER BY event_id""".stripMargin,
    "q_cast_case" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(floor(l_quantity) AS INT) AS qty_int,
        |       CAST(l_orderkey AS VARCHAR) AS key_str,
        |       CAST(l_shipdate AS DATE) AS ship_date,
        |       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str,
        |       CASE WHEN l_returnflag = 'R'
        |            THEN CASE WHEN l_quantity >= 25 THEN 'big_return' ELSE 'small_return' END
        |            ELSE CASE WHEN l_linestatus = 'O' THEN 'open' ELSE 'closed' END
        |       END AS status_class
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
