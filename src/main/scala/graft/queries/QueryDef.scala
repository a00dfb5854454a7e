package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked engine query: the Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB SQL the driver hash-compares
  * against. Naming/determinism rules (SURVEY.md §5.2):
  *   - every computed column aliased identically on both sides;
  *   - a stable ORDER BY on a unique key in every query;
  *   - doubles aggregated via DECIMAL casts (exact, order-independent),
  *     then cast back to DOUBLE on both sides;
  *   - derived integers cast to BIGINT on both sides (DuckDB widens
  *     freely; Spark does not).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, fn: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(name, fn, Some(sql.trim))
}
