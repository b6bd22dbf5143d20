package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.Row

/** Gap-expression semantics through the SQL surface (codegen path). */
class GapFnSpec extends SparkSuite {

  private def one(sql: String): Row = {
    GraftFunctions.register(spark)
    spark.sql(s"SELECT $sql").head()
  }

  test("is_decimal / is_digit / is_alpha edge cases, NULL rejects to false") {
    assert(one("is_decimal('12.5'), is_decimal('-.5'), is_decimal('.'), is_decimal(''), is_decimal('1.2.3')") ==
      Row(true, true, false, false, false))
    assert(one("is_digit('007'), is_digit(''), is_digit('1a')") == Row(true, false, false))
    assert(one("is_alpha('abc'), is_alpha('ab1'), is_alpha(CAST(NULL AS STRING))") ==
      Row(true, false, false))
  }

  test("split_index: 0-based, literal separator, NULL out of range") {
    assert(one("split_index('a,b,c', ',', 0), split_index('a,b,c', ',', 2), split_index('a,b,c', ',', 3)") ==
      Row("a", "c", null))
    assert(one("split_index('a||b', '||', 1)") == Row("b"))
  }

  test("is_json predicates distinguish object/array/scalar and reject trailing garbage") {
    assert(one("""is_json_object('{"a":1}'), is_json_array('[1,2]'), is_json_scalar('42'), is_json_value('{"a":1}x')""") ==
      Row(true, true, true, false))
  }

  test("temporal_overlaps normalizes endpoints and is inclusive") {
    assert(one(
      "temporal_overlaps(TIMESTAMP'2024-01-01 00:00:00', TIMESTAMP'2024-01-02 00:00:00', " +
      "TIMESTAMP'2024-01-02 00:00:00', TIMESTAMP'2024-01-03 00:00:00')") == Row(true))
    assert(one(
      "temporal_overlaps(TIMESTAMP'2024-01-02 00:00:00', TIMESTAMP'2024-01-01 00:00:00', " +
      "TIMESTAMP'2024-01-01 12:00:00', TIMESTAMP'2024-01-04 00:00:00')") == Row(true))
    assert(one(
      "temporal_overlaps(TIMESTAMP'2024-01-01 00:00:00', TIMESTAMP'2024-01-02 00:00:00', " +
      "TIMESTAMP'2024-01-02 00:00:01', TIMESTAMP'2024-01-03 00:00:00')") == Row(false))
  }
}
