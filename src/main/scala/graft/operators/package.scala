package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object operators {

  /** One named engine query: the unit of the driver's correctness contract.
    * `build` is the Spark-native implementation; `oracle` the equivalent
    * DuckDB SQL (None for non-SQL-expressible ops → driver falls back to a
    * rows-only check).
    */
  final case class GraftQuery(
      name: String,
      doc: String,
      build: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Read one driver test table (TESTDATA.md layout) from the given sf dir. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(root)) {
      val all = java.nio.file.Files.walk(root).iterator().asScala.toSeq
      all.sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Scratch directory for queries that spool data into another format
    * before reading it back (Sources, streaming replays). One FIXED dir per
    * caller-chosen name — re-runs overwrite instead of accumulating copies
    * (ADVICE r2) — and the whole root is removed on JVM exit. */
  def spoolDir(name: String): String =
    spoolRoot.resolve(name).toString

  private lazy val spoolRoot: java.nio.file.Path = {
    // Prefer tmpfs (/dev/shm) when present: spools and streaming
    // checkpoints are ephemeral by construction (removed on JVM exit), and
    // the streaming micro-batch commit path fsyncs its offset/state logs —
    // on a disk-backed /tmp that fsync is a fixed per-batch cost the replay
    // doesn't need to pay. Production pipelines put checkpoints on durable
    // storage; a same-JVM replay keeps the same code path, faster medium.
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val root = base.resolve("graft_spool")
    java.nio.file.Files.createDirectories(root)
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(root)))
    root
  }

  /** Exact fixed-point views of the 2-decimal money columns. Aggregating in
    * DECIMAL instead of double makes results independent of float summation
    * order — identical across Spark partitions/shuffles and the DuckDB
    * oracle. */
  def dec2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(14,2)")
  def dec4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(4,2)")

  /** The `events` table with its nanosecond-precision `ts` normalized to
    * Spark's microsecond TimestampType. The driver parquet stores
    * timestamp[ns], which Spark only reads as a nano-epoch long via the
    * legacy conf; we floor-divide to micros (same truncation DuckDB applies
    * when casting TIMESTAMP_NS → TIMESTAMP, keeping oracles comparable).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
