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
  *     freely; Spark does not);
  *   - the OUTER aggregate of any integer SUM cast to BIGINT in the
  *     ORACLE: DuckDB `SUM(BIGINT)` returns HUGEINT, which pandas
  *     reads as float64 and the driver's dtype-sensitive hash then
  *     diverges from Spark's int64 even when every value compares
  *     equal (round-9 lesson: 8 green-looking queries failed only at
  *     the driver gate). `tools/check.py` now flags dtype divergence;
  *   - no raw ARRAY/STRUCT columns in a query's OUTPUT: the driver's
  *     compare row-sorts every column and pandas cannot sort ndarray
  *     cells (round-9 lesson: three emb queries crashed the gate).
  *     Emit lane-per-row (posexplode) instead;
  *   - divisions that can hit 0/0 on a degenerate corpus wrapped in
  *     nullif on BOTH engines (Spark ANSI throws / returns NULL where
  *     DuckDB returns inf — either way the hash diverges);
  *   - DuckDB `//` is floor-division ONLY for integer operands — on
  *     DOUBLE it is plain division, and a subsequent `::BIGINT` cast
  *     ROUNDS (round-11 lesson, q_events_growth_accounting: weeks off
  *     by one half the time). Cast to BIGINT BEFORE `// k`, or use
  *     floor() explicitly;
  *   - DuckDB multiplies BIGINTs in INT64 even when the SUM is HUGEINT
  *     — `sum(a * b)` overflows before it widens (round-11 lesson,
  *     q_text_heaps). Write `sum(a::HUGEINT * b::HUGEINT)`; on the
  *     Spark side multiply in DECIMAL(19,0);
  *   - bare float literals inside DuckDB LIST lambdas type as
  *     DECIMAL(2,1) and the fold truncates to that scale (round-11
  *     lesson, q_similarity_rbo: 0.9·0.9 became 0.8). Force `::DOUBLE`
  *     on every literal inside list_transform/list_reduce;
  *   - NO multi-field struct accumulators in DuckDB `list_reduce`:
  *     struct_pack fields evaluate SEQUENTIALLY against a mutating
  *     accumulator (a later field reading `acc.x` sees the new value a
  *     previous field just wrote — round-11 lesson, q_events_holt).
  *     Coupled recursions go in a RECURSIVE CTE on the oracle side,
  *     which reads all state from the previous row.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, fn: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(name, fn, Some(sql.trim))
}
