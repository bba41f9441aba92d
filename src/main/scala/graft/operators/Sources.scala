package graft.operators

/** Non-parquet source coverage in the graded registry (SURVEY §2 "Scans /
  * sources": JSON-lines scan, CSV scan with inferSchema — the crawler
  * analog A15). Each query spools a slice of the events table into the
  * format under test, then reads it back through the real `spark.read`
  * inference path and aggregates; the oracle runs on the original parquet,
  * so a round-trip/inference bug (type widening, header handling, quoting)
  * breaks the hash.
  *
  * Only integer/string columns travel through the text formats — float
  * formatting is engine-specific, and the point here is the source plumbing,
  * not decimal round-tripping (the parquet queries cover numeric exactness).
  * Scale: schema inference samples the files (driver-side, bounded);
  * the subsequent scan/agg is an ordinary distributed plan.
  */
object Sources {

  /** JSON-lines: write → infer → aggregate. */
  val q51 = GraftQuery(
    "q51_jsonl_scan",
    "JSON-lines round-trip: write events slice, re-read with schema inference, aggregate",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val spool = spoolDir("q51_jsonl")
      events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .coalesce(4).write.mode("overwrite").json(spool)
      s.read.json(spool)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          max(col("event_id")).as("max_event"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n,
             count(DISTINCT user_id) AS n_users,
             max(event_id) AS max_event
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** CSV with header + inferSchema (the reference crawler's bread and
    * butter: `Crawlers` registers csv tables exactly this way). */
  val q52 = GraftQuery(
    "q52_csv_infer_scan",
    "CSV round-trip with header + inferSchema, then aggregate",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val spool = spoolDir("q52_csv")
      events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .coalesce(4).write.mode("overwrite")
        .option("header", "true").csv(spool)
      s.read.option("header", "true").option("inferSchema", "true").csv(spool)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("user_id")).as("sum_users"),
          min(col("event_id")).as("min_event"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(user_id) AS BIGINT) AS sum_users,
             min(event_id) AS min_event
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Partitioned sink + partition-pruned read-back: write events laid out
    * Hive-style by month (the layout A12/A13 discover and register), then
    * read the dataset back with a partition-value filter — the scan must
    * touch only the 3 selected directories (PlanSpec pins the
    * PartitionFilters/pruning behavior; here the oracle pins the values).
    * At 100 TB this layout choice IS the dominant performance decision:
    * a time-partitioned corpus turns month-scoped queries from full scans
    * into directory listings. */
  val q55 = GraftQuery(
    "q55_partitioned_write_prune",
    "partitionBy(day) write → partition-pruned scan of 1 week of 30 dirs → aggregate",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val spool = spoolDir("q55_parted")
      events(s, dir)
        .withColumn("day", dayofmonth(col("ts")))
        .write.partitionBy("day").mode("overwrite").parquet(spool)
      s.read.parquet(spool)
        .filter(col("day") <= 7)
        .groupBy("day")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(dec2(col("value"))).cast("double").as("total_value"))
        .select(col("day").cast("long").as("day"), col("n"),
          col("n_users"), col("total_value"))
        .orderBy("day")
    },
    Some("""
      SELECT day(CAST(ts AS TIMESTAMP)) AS day, count(*) AS n,
             count(DISTINCT user_id) AS n_users,
             CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
      FROM events
      WHERE day(CAST(ts AS TIMESTAMP)) <= 7
      GROUP BY day
      ORDER BY day"""))

  /** ORC round-trip: the other columnar format a lake migration meets.
    * Unlike the text formats ORC is typed, so the value column travels
    * too (decimal-cast at the aggregate for engine-portable sums). */
  val q56 = GraftQuery(
    "q56_orc_scan",
    "ORC round-trip: write events slice as ORC, read back, aggregate",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val spool = spoolDir("q56_orc")
      events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .coalesce(4).write.mode("overwrite").orc(spool)
      s.read.orc(spool)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("total_value"),
          max(col("event_id")).as("max_event"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value,
             max(event_id) AS max_event
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Raw text lines + regexp field extraction — the weblog-shaped source
    * every lake ingests before it has schema: spark.read.text gives one
    * `value` column, regexp_extract recovers the fields, and the rest is an
    * ordinary plan. The regexes stay in whole-stage codegen; at scale this
    * is a single distributed pass with no inference step. */
  val q64 = GraftQuery(
    "q64_text_regexp_scan",
    "text-line round-trip: pipe-delimited lines -> spark.read.text -> regexp_extract -> aggregate",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val spool = spoolDir("q64_text")
      events(s, dir)
        .select(concat_ws("|", col("event_id"), col("user_id"), col("event_type"))
          .as("value"))
        .coalesce(4).write.mode("overwrite").text(spool)
      s.read.text(spool)
        .select(
          regexp_extract(col("value"), "^(\\d+)\\|", 1).cast("long").as("event_id"),
          regexp_extract(col("value"), "^\\d+\\|(\\d+)\\|", 1).cast("long").as("user_id"),
          regexp_extract(col("value"), "\\|([^|]+)$", 1).as("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          max(col("event_id")).as("max_event"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n,
             count(DISTINCT user_id) AS n_users,
             max(event_id) AS max_event
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  val all: Seq[GraftQuery] = Seq(q51, q52, q55, q56, q64)
}
