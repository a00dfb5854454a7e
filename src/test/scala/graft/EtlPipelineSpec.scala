package graft

import java.util.Properties

import graft.etl.EtlPipeline

/** End-to-end reference-pipeline run: gz logs on disk → parse → preview →
  * limit → JDBC append (embedded Derby) — the reference's `run_etl` shape
  * (A19) including the demo 1-row load cap. */
class EtlPipelineSpec extends SparkSpec {

  val golden = new AlbParserSpec().golden
  val url = "jdbc:derby:memory:graftetl;create=true"
  val props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  def writeLogs(): String = {
    val dir = java.nio.file.Files.createTempDirectory("etlrun")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(dir.resolve("x.log.gz").toFile))
    out.write(Seq(golden, "too short",
      golden.replace("1.2.3.4", "8.8.8.8")).mkString("\n").getBytes("UTF-8"))
    out.close()
    dir.toString
  }

  test("full pipeline: gz → parse → jdbc, with skip metrics") {
    val r = EtlPipeline.run(spark, writeLogs(), url, "etl_full", props)
    assert(r == EtlPipeline.Result(3L, 2L, 2L))
    assert(spark.read.jdbc(url, "etl_full", props).count() == 2L)
  }

  test("demo load cap ships exactly one row (reference :175-177)") {
    val r = EtlPipeline.run(spark, writeLogs(), url, "etl_capped", props,
      loadLimit = Some(1))
    assert(r.rowsParsed == 2L && r.rowsLoaded == 1L)
    assert(spark.read.jdbc(url, "etl_capped", props).count() == 1L)
  }
}
