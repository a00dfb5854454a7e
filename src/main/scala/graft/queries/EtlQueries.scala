package graft.queries

import org.apache.spark.sql.functions._

import graft.etl.AlbFixture
import graft.functions.UaClassifier

/** Reference-parity queries: the full ALB parse pipeline (SURVEY.md §2.A
  * operators A4-A13 fused) run over the deterministic synthetic line corpus,
  * oracle-checked against a ground truth derived independently from the seed
  * key (see [[graft.etl.AlbFixture]]). */
object EtlQueries {
  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_parse_alb",
      (s, d) => AlbFixture.parsed(s, d),
      AlbFixture.oracleSql),

    // Browser major-version capture — the `user_agents`-lib residual the
    // classifier ladder doesn't carry (reference :110-111 exposes
    // `.browser.version`): family-scoped regex extraction rolled up to
    // (family, major, count). The version table is data
    // ([[UaClassifier.versionRules]]) compiled to a when-chain on one
    // side and a CASE mirror on the other, same single-source pattern as
    // the family rules; the fixture goldens pin each agent's expected
    // major independently in AlbParserSpec.
    QueryDef("q_ua_versions",
      (s, d) => AlbFixture.parsed(s, d)
        .groupBy(col("ua_browser_family"),
          UaClassifier.browserMajor(col("user_agent_full"),
            col("ua_browser_family")).as("browser_major"))
        .agg(count(lit(1)).as("n"))
        .orderBy("ua_browser_family", "browser_major"),
      s"""WITH parsed AS (${AlbFixture.oracleSql})
SELECT ua_browser_family,
  ${UaClassifier.browserMajorSql("user_agent_full", "ua_browser_family")} AS browser_major,
  count(*)::BIGINT AS n
FROM parsed GROUP BY 1, 2 ORDER BY 1, 2"""),

    // OS version capture — the `.os.version` twin of q_ua_versions and
    // the LAST `user_agents`-lib residual (reference :112 exposes
    // `.os.family`; the lib carries `.os.version` beside it): family-
    // scoped capture ([[UaClassifier.osVersionRules]]) + Apple
    // underscore normalization + the NT→marketing map, rolled up to
    // (os_family, os_version, count). Same single-source pattern: the
    // rule table compiles to a when-chain on the Spark side and a CASE
    // mirror in the oracle; hand-read goldens pin each agent's expected
    // version in AlbParserSpec.
    QueryDef("q_ua_os_versions",
      (s, d) => AlbFixture.parsed(s, d)
        .groupBy(col("ua_os_family"),
          UaClassifier.osVersion(col("user_agent_full"),
            col("ua_os_family")).as("os_version"))
        .agg(count(lit(1)).as("n"))
        .orderBy("ua_os_family", "os_version"),
      s"""WITH parsed AS (${AlbFixture.oracleSql})
SELECT ua_os_family,
  ${UaClassifier.osVersionSql("user_agent_full", "ua_os_family")} AS os_version,
  count(*)::BIGINT AS n
FROM parsed GROUP BY 1, 2 ORDER BY 1, 2"""))
}
