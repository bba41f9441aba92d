package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All engine queries live in the typed registry (`graft.operators.*`); this
  * object flattens it into the driver's Map-based surface.
  */
object SparkEntry {

  /** Every named query the engine implements, in registration order. */
  def registry: Seq[GraftQuery] =
    Relational.all ++ Scalar.all ++ EventWindows.all ++ Sampling.all ++
      Dedup.all ++ Similarity.all ++ TextAnalysis.all ++ Multimodal.all ++
      StreamingOps.all ++ Sources.all ++ Warehouse.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
