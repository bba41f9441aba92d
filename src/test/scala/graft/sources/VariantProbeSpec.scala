package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Exploration probe for the DSv2 variant-extraction pushdown contract
  * (SupportsPushDownVariantExtractions, Spark 4.1): what extractions the
  * rule offers, what read schema follows acceptance, and what value shape
  * the reader must serve. Keep: it documents the measured contract the
  * MemTable implementation relies on, and fails loudly on a Spark
  * upgrade that changes it. */
class VariantProbeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-variant-probe")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  test("probe: variant column round-trips through MemTable and extraction pushes to the scan") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft_var", "graft.sources.GraftSparkCatalog")
    s2.conf.set("spark.sql.variant.pushVariantIntoScan", "true")
    val t = s"graft_var.ns.vprobe_${ProcessHandle.current().pid()}"
    s2.sql(s"CREATE TABLE $t (k BIGINT, status STRING, v VARIANT) PARTITIONED BY (status)")
    s2.sql(s"""INSERT INTO $t SELECT 1L, 'A',
      parse_json('{"a": 7, "b": {"c": "x"}}')""")
    s2.sql(s"""INSERT INTO $t SELECT 2L, 'B', parse_json('{"a": 9}')""")
    val df = s2.sql(
      s"SELECT k, variant_get(v, '$$.a', 'bigint') AS a FROM $t ORDER BY k")
    df.explain(true)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    info(s"rows=$rows")
    info("plan=" + df.queryExecution.executedPlan.toString.take(2000))
    assert(rows == Seq((1L, 7L), (2L, 9L)))
  }
}
