package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins Bench's flagged-artifact re-measure machinery (VERDICT r13 item
  * 1a): [[SparkEntry.evictArtifact]] must delete exactly the memo its
  * builder checks, or the "min-of-3 on flags" re-measure silently times a
  * memo hit (~0ms) and WRONGLY silences a real regression. For every
  * filesystem-spooled artifact the test builds at sf0.001, asserts the
  * spool exists under the name the evictor targets (name drift on either
  * side fails here), evicts, and asserts it is gone. Model-cached
  * artifacts (x_ann_*_train) evict a map entry; the test proves the
  * evict-then-rebuild cycle works. */
class EvictorSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-evictor-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def safe = dir.replaceAll("[^A-Za-z0-9.]", "_")

  private def build(name: String): Unit =
    SparkEntry.artifacts.find(_._1 == name)
      .getOrElse(fail(s"artifact $name not registered"))._2(spark, dir)

  private def spoolExists(spool: String): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(operators.spoolDir(spool)))

  private val fsArtifacts: Seq[(String, Seq[String])] = Seq(
    "x_spool_events5" -> Seq(s"replay_events5_$safe"),
    "x_spool_st18dlq" ->
      Seq(s"st18_dlq_src_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"),
    "x_spool_st37inc" ->
      Seq(s"st37inc_${dir.replaceAll("[^a-zA-Z0-9.]", "_")}"),
    "x_d2_truth_spool" -> Seq(s"d2truth_$safe"),
    "x_d6_labels_spool" -> Seq(s"d6labels_$safe"),
    "x_d37_lrs_spool" -> Seq(s"d37lrs_$safe"),
    "x_minhash_sig_spool" -> Seq(s"mhsig_$safe"),
    "x_ann_unit_spool" -> Seq(s"ann_unit_$safe"),
    "x_compaction_spool" ->
      Seq(s"compact_small_$safe", s"compact_big_$safe"))

  for ((name, spools) <- fsArtifacts)
    test(s"$name: build creates the spool the evictor deletes") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      build(name)
      spools.foreach(sp =>
        assert(spoolExists(sp), s"builder did not write $sp — name drift?"))
      SparkEntry.evictArtifact(name, dir)
      spools.foreach(sp =>
        assert(!spoolExists(sp), s"evictor left $sp behind"))
      build(name) // first-build semantics restored, rebuild succeeds
      spools.foreach(sp => assert(spoolExists(sp)))
    }

  for (name <- Seq("x_ann_kmeans_train", "x_ann_pq_train",
      "x_ann_ivfpq_train", "x_ann_pca_train"))
    test(s"$name: evict-then-rebuild cycles cleanly") {
      build(name)
      SparkEntry.evictArtifact(name, dir)
      build(name) // re-trains from the (separately charged) unit spool
    }

  override def afterAll(): Unit = {
    try spark.stop() finally super.afterAll()
  }
}
