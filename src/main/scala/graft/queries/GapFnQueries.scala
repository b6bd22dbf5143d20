package graft.queries

import graft.{QueryPack, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The gap scalar functions (SURVEY §2.8: IS_DECIMAL / IS_DIGIT /
 * IS_ALPHA, SPLIT_INDEX, TEMPORAL_OVERLAPS, IS JSON predicates —
 * reference `FlinkSqlOperatorTable.java:274-292,1161-1171`), exercised
 * through the SQL surface after `GraftFunctions.register` — i.e. the
 * same path a `spark.sql.extensions=graft.functions.GraftExtensions`
 * deployment uses.
 *
 * Scale notes: all are narrow codegen'd expressions (custom
 * `doGenCode`, no UDF boundary) that fuse into the scan's
 * WholeStageCodegen stage.
 */
object GapFnQueries extends QueryPack {

  private def sqlq(q: String)(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.registerAll(s, dir)
    s.sql(q)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "calc_gap_predicates" -> (sqlq("""
      SELECT p_partkey,
             split_index(p_name, ' ', 0) AS w0,
             split_index(p_name, ' ', 1) AS w1,
             split_index(p_name, ' ', 9) AS w_oob,
             is_alpha(split_index(p_name, ' ', 0)) AS w0_alpha,
             is_alpha(p_brand) AS brand_alpha,
             is_digit(substring(p_brand, 7, 2)) AS brand_digits,
             is_decimal(concat(substring(p_brand, 7, 2), '.25')) AS dec_ok,
             is_decimal(p_name) AS name_dec
      FROM part WHERE p_partkey <= 300
      ORDER BY p_partkey""") _),

    "calc_temporal_overlaps" -> (sqlq("""
      SELECT event_id,
             temporal_overlaps(ts, ts + INTERVAL 6 HOURS,
               TIMESTAMP_NTZ'2024-01-10 00:00:00',
               TIMESTAMP_NTZ'2024-01-12 00:00:00') AS ov_window,
             temporal_overlaps(ts, ts - INTERVAL 1 HOUR,
               TIMESTAMP_NTZ'2024-01-01 00:00:00',
               TIMESTAMP_NTZ'2024-02-01 00:00:00') AS ov_swapped
      FROM events WHERE event_id <= 300
      ORDER BY event_id""") _),

    // [NOT] SIMILAR TO through the unified SQL door (text desugar →
    // regexp_like) plus the registered similar_to() function form; the
    // oracle hand-translates each pattern to regexp_full_match, so the
    // machine translation is checked against an independent encoding.
    "calc_similar_to" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables.registerAll(s, dir)
      new graft.api.TableEnv(s).sqlQuery("""
        SELECT event_id, event_type,
               event_type SIMILAR TO '(cl|pu)%' AS m_alt,
               event_type SIMILAR TO 'c____' AS m_under,
               event_type SIMILAR TO '%e%' AS m_pct,
               event_type NOT SIMILAR TO '[cp]%' AS m_not_class,
               upper(event_type) SIMILAR TO '[A-Z]+' AS m_class_plus,
               event_type SIMILAR TO 'x\_y' ESCAPE '\' AS m_escaped,
               similar_to(event_type, '(view|error)') AS m_fn
        FROM events WHERE event_id <= 400
        ORDER BY event_id""")
    }),

    "calc_json_predicates" -> (sqlq("""
      SELECT event_id,
             is_json_value(props) AS v,
             is_json_object(props) AS o,
             is_json_array(props) AS a,
             is_json_scalar(props) AS sc,
             is_json_value(concat(props, 'x')) AS broken,
             is_json_array(concat('[', props, ']')) AS wrapped
      FROM events WHERE event_id <= 200
      ORDER BY event_id""") _)
  )

  override def oracle: Map[String, String] = Map(
    "calc_similar_to" -> """
      SELECT event_id, event_type,
             regexp_full_match(event_type, '(cl|pu).*') AS m_alt,
             regexp_full_match(event_type, 'c....') AS m_under,
             regexp_full_match(event_type, '.*e.*') AS m_pct,
             NOT regexp_full_match(event_type, '[cp].*') AS m_not_class,
             regexp_full_match(upper(event_type), '[A-Z]+') AS m_class_plus,
             regexp_full_match(event_type, 'x_y') AS m_escaped,
             regexp_full_match(event_type, '(view|error)') AS m_fn
      FROM events WHERE event_id <= 400
      ORDER BY event_id""",
    "calc_gap_predicates" -> """
      SELECT p_partkey,
             string_split(p_name, ' ')[1] AS w0,
             string_split(p_name, ' ')[2] AS w1,
             string_split(p_name, ' ')[10] AS w_oob,
             regexp_full_match(string_split(p_name, ' ')[1], '[a-zA-Z]+') AS w0_alpha,
             regexp_full_match(p_brand, '[a-zA-Z]+') AS brand_alpha,
             regexp_full_match(substring(p_brand, 7, 2), '[0-9]+') AS brand_digits,
             regexp_full_match(concat(substring(p_brand, 7, 2), '.25'),
                               '[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)') AS dec_ok,
             regexp_full_match(p_name, '[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)') AS name_dec
      FROM part WHERE p_partkey <= 300
      ORDER BY p_partkey""",
    "calc_temporal_overlaps" -> """
      SELECT event_id,
             (least(ts, ts + INTERVAL 6 HOUR) <= greatest(TIMESTAMP '2024-01-10 00:00:00', TIMESTAMP '2024-01-12 00:00:00')
              AND least(TIMESTAMP '2024-01-10 00:00:00', TIMESTAMP '2024-01-12 00:00:00') <= greatest(ts, ts + INTERVAL 6 HOUR)) AS ov_window,
             (least(ts, ts - INTERVAL 1 HOUR) <= greatest(TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00')
              AND least(TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00') <= greatest(ts, ts - INTERVAL 1 HOUR)) AS ov_swapped
      FROM events WHERE event_id <= 300
      ORDER BY event_id""",
    "calc_json_predicates" -> """
      SELECT event_id,
             json_valid(props) AS v,
             (json_valid(props) AND json_type(props) = 'OBJECT') AS o,
             (json_valid(props) AND json_type(props) = 'ARRAY') AS a,
             (json_valid(props) AND json_type(props) NOT IN ('OBJECT', 'ARRAY')) AS sc,
             json_valid(concat(props, 'x')) AS broken,
             (json_valid(concat('[', props, ']'))
              AND json_type(concat('[', props, ']')) = 'ARRAY') AS wrapped
      FROM events WHERE event_id <= 200
      ORDER BY event_id"""
  )
}
