package graft.queries

import graft.etl.AlbFixture

/** Reference-parity queries: the full ALB parse pipeline (SURVEY.md §2.A
  * operators A4-A13 fused) run over the deterministic synthetic line corpus,
  * oracle-checked against a ground truth derived independently from the seed
  * key (see [[graft.etl.AlbFixture]]). */
object EtlQueries {
  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_parse_alb",
      (s, d) => AlbFixture.parsed(s, d),
      AlbFixture.oracleSql))
}
