package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Row-level transforms and the scalar-function surface (SURVEY.md §2.2 +
 * §2.8): fused project+filter (reference `CommonExecCalc`), CASE /
 * COALESCE / NULLIF conditionals, the string / math / temporal /
 * collection function families (reference `FlinkSqlOperatorTable` +
 * `BuiltInFunctionDefinitions`), lateral explode (reference
 * `CommonExecCorrelate` table-function join), literal VALUES relations,
 * and JSON field extraction.
 *
 * Scale notes: all of these are narrow per-row transforms — they fuse
 * into one WholeStageCodegen stage with the scan and push filters into
 * the parquet reader; no shuffle is introduced except where an explicit
 * agg/sort verifies the result deterministically.
 */
object CalcQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Calc = project + filter fused; pushed filters reach the scan.
    "calc_project_filter" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") < 0.02)
        .select(col("l_orderkey"), col("l_linenumber"),
          // integer-cent grid: floor is IEEE-identical across engines,
          // unlike decimal-cast tie rounding (HALF_UP vs HALF_EVEN)
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).as("net"),
          col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // CASE WHEN / NULLIF / COALESCE conditional family.
    "calc_conditionals" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") <= 1000)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 200000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("price_band"),
          nullif(col("o_orderstatus"), lit("O")).as("status_nn"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_filled"))
        .orderBy(col("o_orderkey"))
    }),

    // String function family over part names.
    "calc_string_fns" -> ((s, dir) => {
      Tables.load(s, dir, "part")
        .filter(col("p_partkey") <= 500)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          length(col("p_name")).cast("bigint").as("len"),
          substring(col("p_name"), 1, 5).as("pre5"),
          concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          trim(col("p_name")).as("trimmed"),
          regexp_replace(col("p_type"), "[aeiou]", "").as("novowel"),
          split_part(col("p_type"), lit(" "), lit(1)).as("first_word"),
          instr(col("p_name"), "a").cast("bigint").as("posa"),
          reverse(col("p_brand")).as("rev"),
          translate(col("p_brand"), "#", "-").as("trans"),
          md5(col("p_name")).as("digest"))
        .orderBy(col("p_partkey"))
    }),

    // String family part 2: left/right, repeat, initcap, position,
    // base64 round-trip, overlay-style replace (reference
    // FlinkSqlOperatorTable string table, second half).
    "calc_string_fns2" -> ((s, dir) => {
      Tables.load(s, dir, "part")
        .filter(col("p_partkey") <= 400)
        .select(col("p_partkey"),
          expr("left(p_name, 4)").as("l4"),
          expr("right(p_name, 3)").as("r3"),
          repeat(col("p_brand"), 2).as("b2"),
          initcap(col("p_name")).as("cap"),
          expr("position('a' in p_name)").cast("bigint").as("pos_a"),
          base64(encode(col("p_brand"), "UTF-8")).as("b64"),
          decode(unbase64(base64(encode(col("p_name"), "UTF-8"))), "UTF-8").as("roundtrip"),
          ascii(col("p_brand")).cast("int").as("first_code"),
          expr("chr(65 + CAST(p_partkey % 26 AS INT))").as("letter"))
        .orderBy(col("p_partkey"))
    }),

    // Temporal arithmetic family (reference TIMESTAMPADD/TIMESTAMPDIFF/
    // LAST_DAY/DAYOFYEAR builtins): calendar arithmetic with exact
    // integer outputs on both engines.
    "calc_temporal_arith" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .filter(col("event_id") <= 300)
        .select(col("event_id"),
          last_day(col("ts")).as("month_end"),
          dayofyear(col("ts")).cast("int").as("doy"),
          unix_timestamp(col("ts").cast("timestamp")).as("epoch_s"),
          datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("2024-01-01")))
            .cast("int").as("days_in"),
          expr("make_date(year(ts), month(ts), 1)").as("month_start"),
          expr("timestampadd(HOUR, 3, ts)").as("plus3h"))
        .orderBy(col("event_id"))
    }),

    // Bitwise function family (reference BIN/bitAnd/bitOr/bitXor and
    // shift builtins): masks, shifts, popcount over the key column.
    "calc_bitwise_fns" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("l_orderkey & 255").as("k_and"),
          expr("l_orderkey | 4096").as("k_or"),
          expr("l_orderkey ^ l_linenumber").as("k_xor"),
          expr("shiftleft(l_linenumber, 3)").cast("bigint").as("ln_shl"),
          expr("shiftright(l_orderkey, 2)").as("k_shr"),
          expr("cast(bit_count(l_orderkey) as int)").as("k_pop"),
          expr("~l_orderkey").as("k_not"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Math function family; floats rounded (libm noise across engines).
    "calc_math_fns" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("dist25"),
          ceil(col("l_discount") * 100).as("disc_pct_ceil"),
          floor(col("l_tax") * 100).as("tax_pct_floor"),
          round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(pow(col("l_quantity"), lit(2)), 2).as("qty_sq"),
          (col("l_orderkey") % 7).as("key_mod7"),
          signum(col("l_quantity") - 25).cast("int").as("sgn"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Temporal function family over event timestamps.
    "calc_temporal_fns" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .filter(col("event_id") <= 300)
        .select(col("event_id"),
          year(col("ts")).as("y"),
          month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("d"),
          hour(col("ts")).as("h"),
          minute(col("ts")).as("mi"),
          second(col("ts")).as("sec"),
          weekday(col("ts")).as("wd"),
          date_trunc("hour", col("ts")).as("ts_hour"),
          (col("ts") + expr("INTERVAL 90 MINUTES")).as("ts_plus"),
          to_date(col("ts")).as("dt"),
          quarter(col("ts")).as("q"),
          dayofyear(col("ts")).as("doy"))
        .orderBy(col("event_id"))
    }),

    // Collection constructors + access (ARRAY, CARDINALITY, element_at,
    // array_contains, sort) — reference §2.8 collection family.
    "calc_collections" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .filter(col("doc_id") <= 200)
        .select(col("doc_id"),
          size(split(trim(col("text")), " ")).cast("bigint").as("n_words"),
          element_at(split(trim(col("text")), " "), 1).as("w1"),
          element_at(split(trim(col("text")), " "), 3).as("w3"),
          array_contains(split(trim(col("text")), " "), "spark").as("has_spark"),
          // CSV-string form: the driver comparator can't sort array cells
          concat_ws(",", slice(array_sort(array_distinct(split(trim(col("text")), " "))), 1, 3)).as("top3_sorted"))
        .orderBy(col("doc_id"))
    }),

    // Lateral table-function join (reference CommonExecCorrelate):
    // explode words, count per (doc, word).
    "calc_explode_lateral" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .filter(col("doc_id") <= 50)
        .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("word"))
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("doc_id"), col("word"))
    }),

    // UNNEST WITH ORDINALITY (reference FlinkSqlOperatorTable UNNEST /
    // `CROSS JOIN UNNEST(arr) WITH ORDINALITY AS t(elem, ord)`):
    // posexplode is Spark's positional unnest — pos is 0-based, the
    // SQL-standard ordinality is 1-based.
    "calc_unnest_ordinality" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .filter(col("doc_id") <= 20)
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), " ")).as(Seq("pos", "word")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("ord"), col("word"))
        .orderBy(col("doc_id"), col("ord"))
    }),

    // Literal VALUES relation (reference BatchExecValues).
    "calc_values" -> ((s, dir) => {
      import s.implicits._
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
        .toDF("id", "tag", "x")
        .select(col("id"), col("tag"), (col("x") * 2).as("x2"))
        .orderBy(col("id"))
    }),

    // JSON field extraction from the events.props payload.
    "calc_json_extract" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .filter(col("event_id") <= 300)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("prop_k"))
        .orderBy(col("event_id"))
    }),

    // String family part 3 (reference FlinkSqlOperatorTable BIN/HEX/
    // LOCATE/PARSE_URL/STR_TO_MAP + BuiltInFunctionDefinitions sha2/
    // levenshtein): the remaining string builtins without a gate.
    "calc_string_fns3" -> ((s, dir) => {
      Tables.load(s, dir, "part")
        .filter(col("p_partkey") <= 400)
        .withColumn("url", concat(lit("https://h"), (col("p_partkey") % 5).cast("string"),
          lit(".example.com/p/"), col("p_partkey").cast("string"),
          lit("?q="), (col("p_partkey") % 7).cast("string")))
        .withColumn("kv", concat(lit("a="), (col("p_partkey") % 5).cast("string"),
          lit(",b="), (col("p_partkey") % 3).cast("string")))
        .select(col("p_partkey"),
          bin(col("p_partkey")).as("bkey"),
          hex(col("p_partkey")).as("hkey"),
          locate("a", col("p_name")).cast("bigint").as("loc_a"),
          expr("elt(1 + CAST(p_partkey % 3 AS INT), 'alpha', 'beta', 'gamma')").as("elt_pick"),
          substring_index(col("p_type"), " ", 2).as("type2"),
          levenshtein(col("p_brand"), lit("Brand#33")).cast("bigint").as("lev"),
          sha2(col("p_name"), 256).as("sha"),
          parse_url(col("url"), lit("HOST")).as("u_host"),
          parse_url(col("url"), lit("PATH")).as("u_path"),
          parse_url(col("url"), lit("QUERY"), lit("q")).as("u_q"),
          expr("str_to_map(kv, ',', '=')['b']").as("m_b"))
        .orderBy(col("p_partkey"))
    }),

    // Temporal family part 3 (reference DATE_FORMAT/TIMESTAMPDIFF/
    // FROM_UNIXTIME/TO_TIMESTAMP/CONVERT_TZ + TYPEOF + numeric
    // TRUNCATE via the registered gap function). Timezone conversion
    // is rendered as a string so the comparison is tz-type-agnostic.
    "calc_temporal_fns3" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.load(s, dir, "events")
        .filter(col("event_id") <= 300)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm").as("fmt"),
          expr("timestampdiff(HOUR, TIMESTAMP '2024-01-01 00:00:00', ts)").as("hrs_in"),
          from_unixtime(unix_timestamp(col("ts"))).as("sec_str"),
          to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:00:00")).as("hour_ts"),
          date_format(expr("from_utc_timestamp(ts, 'America/New_York')"),
            "yyyy-MM-dd HH:mm").as("nyc"),
          expr("typeof(event_id)").as("t_id"),
          expr("typeof(value)").as("t_val"),
          expr("typeof(props)").as("t_props"),
          expr("truncate(value, 2)").as("val_t2"),
          expr("truncate(-value, 2)").as("neg_t2"))
        .orderBy(col("event_id"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "calc_project_filter" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS net,
             l_returnflag
      FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.02
      ORDER BY l_orderkey, l_linenumber""",
    "calc_conditionals" -> """
      SELECT o_orderkey,
             CASE WHEN o_totalprice > 200000 THEN 'high'
                  WHEN o_totalprice > 100000 THEN 'mid'
                  ELSE 'low' END AS price_band,
             nullif(o_orderstatus, 'O') AS status_nn,
             coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_filled
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""",
    "calc_string_fns" -> """
      SELECT p_partkey,
             upper(p_name) AS up,
             lower(p_brand) AS lo,
             CAST(length(p_name) AS BIGINT) AS len,
             substring(p_name, 1, 5) AS pre5,
             concat_ws('|', p_brand, p_type) AS joined,
             lpad(p_brand, 12, '*') AS padded,
             trim(p_name) AS trimmed,
             regexp_replace(p_type, '[aeiou]', '', 'g') AS novowel,
             split_part(p_type, ' ', 1) AS first_word,
             CAST(strpos(p_name, 'a') AS BIGINT) AS posa,
             reverse(p_brand) AS rev,
             replace(p_brand, '#', '-') AS trans,
             md5(p_name) AS digest
      FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""",
    "calc_string_fns2" -> """
      SELECT p_partkey,
             left(p_name, 4) AS l4,
             right(p_name, 3) AS r3,
             repeat(p_brand, 2) AS b2,
             array_to_string(list_transform(string_split(p_name, ' '),
               w -> concat(upper(w[1:1]), lower(w[2:]))), ' ') AS cap,
             CAST(position('a' in p_name) AS BIGINT) AS pos_a,
             to_base64(encode(p_brand)) AS b64,
             decode(from_base64(to_base64(encode(p_name)))) AS roundtrip,
             CAST(ascii(p_brand) AS INT) AS first_code,
             chr(65 + CAST(p_partkey % 26 AS INT)) AS letter
      FROM part WHERE p_partkey <= 400 ORDER BY p_partkey""",
    "calc_temporal_arith" -> """
      SELECT event_id,
             last_day(CAST(ts AS DATE)) AS month_end,
             CAST(dayofyear(ts) AS INT) AS doy,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_in,
             make_date(CAST(year(ts) AS INT), CAST(month(ts) AS INT), 1) AS month_start,
             ts + INTERVAL 3 HOUR AS plus3h
      FROM events WHERE event_id <= 300 ORDER BY event_id""",
    "calc_bitwise_fns" -> """
      SELECT l_orderkey, l_linenumber,
             l_orderkey & 255 AS k_and,
             l_orderkey | 4096 AS k_or,
             xor(l_orderkey, l_linenumber) AS k_xor,
             CAST(l_linenumber << 3 AS BIGINT) AS ln_shl,
             l_orderkey >> 2 AS k_shr,
             CAST(bit_count(l_orderkey) AS INT) AS k_pop,
             ~l_orderkey AS k_not
      FROM lineitem WHERE l_orderkey <= 300
      ORDER BY l_orderkey, l_linenumber""",
    "calc_math_fns" -> """
      SELECT l_orderkey, l_linenumber,
             abs(l_quantity - 25) AS dist25,
             CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
             CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
             round(sqrt(l_extendedprice), 4) AS sqrt_price,
             round(ln(l_extendedprice), 6) AS ln_price,
             round(pow(l_quantity, 2), 2) AS qty_sq,
             l_orderkey % 7 AS key_mod7,
             CAST(sign(l_quantity - 25) AS INT) AS sgn
      FROM lineitem WHERE l_orderkey <= 300
      ORDER BY l_orderkey, l_linenumber""",
    "calc_temporal_fns" -> """
      SELECT event_id,
             CAST(year(ts) AS INT) AS y,
             CAST(month(ts) AS INT) AS m,
             CAST(day(ts) AS INT) AS d,
             CAST(hour(ts) AS INT) AS h,
             CAST(minute(ts) AS INT) AS mi,
             CAST(floor(second(ts)) AS INT) AS sec,
             CAST(isodow(ts) - 1 AS INT) AS wd,
             date_trunc('hour', ts) AS ts_hour,
             ts + INTERVAL 90 MINUTE AS ts_plus,
             CAST(ts AS DATE) AS dt,
             CAST(quarter(ts) AS INT) AS q,
             CAST(dayofyear(ts) AS INT) AS doy
      FROM events WHERE event_id <= 300 ORDER BY event_id""",
    "calc_collections" -> """
      SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words,
             string_split(trim(text), ' ')[1] AS w1,
             string_split(trim(text), ' ')[3] AS w3,
             list_contains(string_split(trim(text), ' '), 'spark') AS has_spark,
             array_to_string(list_sort(list_distinct(string_split(trim(text), ' ')))[1:3], ',') AS top3_sorted
      FROM documents WHERE doc_id <= 200 ORDER BY doc_id""",
    "calc_explode_lateral" -> """
      SELECT doc_id, word, count(*) AS n
      FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
            FROM documents WHERE doc_id <= 50) t
      GROUP BY doc_id, word ORDER BY doc_id, word""",
    "calc_unnest_ordinality" -> """
      SELECT doc_id, CAST(ord AS BIGINT) AS ord, word
      FROM (SELECT doc_id,
                   unnest(string_split(trim(text), ' ')) AS word,
                   unnest(range(1, len(string_split(trim(text), ' ')) + 1)) AS ord
            FROM documents WHERE doc_id <= 20) t
      ORDER BY doc_id, ord""",
    "calc_values" -> """
      SELECT id, tag, x * 2 AS x2
      FROM (VALUES (CAST(1 AS BIGINT), 'a', CAST(1.5 AS DOUBLE)),
                   (2, 'b', 2.5),
                   (3, 'c', 3.5)) AS v(id, tag, x)
      ORDER BY id""",
    "calc_json_extract" -> """
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
      FROM events WHERE event_id <= 300 ORDER BY event_id""",
    "calc_string_fns3" -> """
      WITH base AS (
        SELECT *,
               'https://h' || CAST(p_partkey % 5 AS VARCHAR) || '.example.com/p/'
                 || CAST(p_partkey AS VARCHAR) || '?q=' || CAST(p_partkey % 7 AS VARCHAR) AS url
        FROM part WHERE p_partkey <= 400)
      SELECT p_partkey,
             bin(p_partkey) AS bkey,
             hex(p_partkey) AS hkey,
             CAST(strpos(p_name, 'a') AS BIGINT) AS loc_a,
             CASE CAST(p_partkey % 3 AS INT) WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta' ELSE 'gamma' END AS elt_pick,
             array_to_string(list_slice(string_split(p_type, ' '), 1, 2), ' ') AS type2,
             CAST(levenshtein(p_brand, 'Brand#33') AS BIGINT) AS lev,
             sha256(p_name) AS sha,
             regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS u_host,
             regexp_extract(url, '^[a-z]+://[^/?#]*(/[^?#]*)', 1) AS u_path,
             regexp_extract(url, '[?&]q=([^&#]*)', 1) AS u_q,
             CAST(p_partkey % 3 AS VARCHAR) AS m_b
      FROM base ORDER BY p_partkey""",
    "calc_temporal_fns3" -> """
      SELECT event_id,
             strftime(ts, '%Y-%m-%d %H:%M') AS fmt,
             CAST(floor((epoch(ts) - epoch(TIMESTAMP '2024-01-01 00:00:00')) / 3600) AS BIGINT) AS hrs_in,
             strftime(make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS sec_str,
             date_trunc('hour', ts) AS hour_ts,
             strftime(timezone('America/New_York', timezone('UTC', ts)), '%Y-%m-%d %H:%M') AS nyc,
             'bigint' AS t_id,
             'double' AS t_val,
             'string' AS t_props,
             trunc(value * 100) / 100 AS val_t2,
             trunc((-value) * 100) / 100 AS neg_t2
      FROM events WHERE event_id <= 300 ORDER BY event_id"""
  )
}
