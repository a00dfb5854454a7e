package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private def all: Seq[graft.queries.QueryDef] =
    graft.queries.EtlQueries.defs ++ graft.queries.Relational.defs ++
      graft.queries.Relational2.defs ++ graft.queries.Relational3.defs ++
      graft.queries.Relational4.defs ++ graft.queries.TpchQueries.defs ++
      graft.queries.TpchQueries2.defs ++
      graft.queries.Functions.defs ++
      graft.queries.EventsQueries.defs ++ graft.queries.LlmOps.defs ++
      graft.queries.LlmOps2.defs ++ graft.queries.LlmOps3.defs ++
      graft.queries.LlmOps4.defs ++ graft.queries.LlmOps5.defs ++
      graft.queries.LlmOps6.defs ++ graft.queries.LlmOps7.defs ++
      graft.queries.LlmOps8.defs ++ graft.queries.LlmOps9.defs ++
      graft.queries.LlmOps10.defs ++
      graft.queries.WarehouseOps.defs ++ graft.queries.StatsOps.defs ++
      graft.queries.StatsOps2.defs ++
      graft.queries.EventsQueries2.defs ++
      graft.queries.GraphOps.defs ++ graft.queries.Round10Ops.defs ++
      graft.queries.Round10Ops2.defs ++
      graft.queries.Round10Ops3.defs ++
      graft.queries.Round10Ops4.defs ++
      graft.queries.Round11Ops.defs ++
      graft.queries.Round11Ops2.defs ++
      graft.queries.Round11Ops3.defs ++
      graft.queries.Round11Ops4.defs ++
      graft.queries.Round11Ops5.defs ++
      graft.queries.Round11Ops6.defs ++
      graft.queries.Round11Ops7.defs ++
      graft.queries.Round11Ops8.defs ++
      graft.queries.Round11Ops9.defs ++
      graft.queries.Round11Ops10.defs ++
      graft.queries.Round11Ops11.defs ++
      graft.queries.Round11Ops12.defs ++
      graft.queries.Round11Ops13.defs ++
      graft.queries.Round11Ops14.defs ++
      graft.queries.Round11Ops15.defs ++
      graft.queries.Round11Ops16.defs ++
      graft.queries.Round11Ops17.defs ++
      graft.queries.Round11Ops18.defs ++
      graft.queries.Round11Ops19.defs ++
      graft.queries.Round11Ops20.defs ++
      graft.queries.Round11Ops21.defs ++
      graft.queries.Round11Ops22.defs ++
      graft.queries.Round11Ops23.defs ++
      graft.queries.Round11Ops24.defs ++
      graft.queries.Round11Ops25.defs ++
      graft.queries.Round11Ops26.defs ++
      graft.queries.Round11Ops27.defs ++
      graft.queries.Round11Ops28.defs ++
      graft.queries.Round11Ops29.defs ++
      graft.queries.Round12Ops.defs ++
      graft.queries.Round13Ops.defs ++
      graft.queries.Round13Ops2.defs ++
      graft.queries.Round13Ops3.defs ++
      graft.queries.Round14Ops.defs ++
      graft.queries.Round14Ops2.defs ++
      graft.queries.Round14Ops3.defs ++
      graft.queries.Round14Ops4.defs ++
      graft.queries.Round14Ops5.defs ++
      graft.queries.Round15Ops.defs ++
      graft.queries.Round15Ops2.defs ++
      graft.queries.Round15Ops3.defs ++
      graft.queries.Round16Ops.defs ++
      graft.queries.Round16Ops2.defs ++
      graft.queries.Round16Ops3.defs ++
      graft.queries.Round16Ops4.defs ++
      graft.queries.Round17Ops.defs ++
      graft.queries.Round17Ops2.defs ++
      graft.queries.Round17Ops3.defs ++
      graft.queries.Round17Ops4.defs ++
      graft.queries.Round17Ops5.defs ++
      graft.queries.Round17Ops6.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full ALB parse pipeline over the synthetic line corpus. */
  def entry(spark: SparkSession): DataFrame =
    graft.etl.AlbFixture.parsed(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // a duplicate name would silently SHADOW the earlier query in this
    // map (and its specs would then test the wrong code) — fail loudly
    // instead (r11: a batch-2 query landed on a round-9 name and hid it)
    val dup = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    all.map(q => q.name -> q.fn).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
