package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.Functions.format_time

/** Scalar-function surface (SURVEY.md §2 Layer B "Scalar functions"):
  * string, date/time, JSON, array higher-order functions, the reference's
  * format_time (A18), and the two Layer-A dataflow analogs that are real
  * aggregations (A9 width agg, A13 partition discovery).
  */
object Scalar {

  /** String functions over `part`. */
  val q25 = GraftQuery(
    "q25_string_funcs",
    "split/substring/concat_ws/lower/upper/length/lpad/replace over part",
    (s, dir) =>
      table(s, dir, "part")
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("lower_name"),
          upper(col("p_brand")).as("upper_brand"),
          length(col("p_name")).cast(LongType).as("name_len"),
          split(col("p_name"), " ").getItem(0).as("first_word"),
          substring(col("p_name"), 1, 5).as("prefix5"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
          regexp_replace(col("p_name"), " ", "_").as("snake_name"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
             lower(p_name) AS lower_name,
             upper(p_brand) AS upper_brand,
             length(p_name) AS name_len,
             string_split(p_name, ' ')[1] AS first_word,
             substring(p_name, 1, 5) AS prefix5,
             concat_ws('|', p_brand, p_type) AS brand_type,
             lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
             replace(p_name, ' ', '_') AS snake_name
      FROM part
      ORDER BY p_partkey"""))

  /** Date/time functions over `orders` (incl. the reference's ISO-truncate
    * display shape, gluettalax.py:350). */
  val q26 = GraftQuery(
    "q26_datetime_funcs",
    "date_format/date_trunc/year/month/unix_millis/weekday over orders",
    (s, dir) =>
      table(s, dir, "orders")
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_date"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("iso_ts"),
          year(col("o_orderdate")).cast(LongType).as("y"),
          month(col("o_orderdate")).cast(LongType).as("m"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("d"),
          (weekday(col("o_orderdate")) + 1).cast(LongType).as("isodow"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
          // o_orderdate is parquet TIMESTAMP_NTZ; session tz is UTC, so the
          // cast to instant-typed TIMESTAMP is lossless.
          unix_millis(col("o_orderdate").cast("timestamp")).as("epoch_ms"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso_ts,
             year(o_orderdate) AS y,
             month(o_orderdate) AS m,
             day(o_orderdate) AS d,
             isodow(o_orderdate) AS isodow,
             date_trunc('month', o_orderdate) AS month_start,
             epoch_ms(o_orderdate) AS epoch_ms
      FROM orders
      ORDER BY o_orderkey"""))

  /** JSON extraction from `events.props` — get_json_object + from_json to a
    * typed struct (the engine-native path). */
  val q27 = GraftQuery(
    "q27_json_extract",
    "from_json / get_json_object over the events.props JSON column",
    (s, dir) =>
      events(s, dir)
        .withColumn("parsed",
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k LONG")))
        .withColumn("as_map", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType)))
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          col("parsed.k").as("k_val"),
          (col("parsed.k") * 2).as("k_doubled"),
          array_join(map_keys(col("as_map")), ",").as("json_keys"),
          element_at(map_values(col("as_map")), 1).as("first_val"))
        .orderBy("event_id"),
    Some("""
      SELECT event_id,
             regexp_extract(props, '"k":\s*(-?\d+)', 1) AS k_str,
             CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k_val,
             CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) * 2 AS k_doubled,
             'k' AS json_keys,
             CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS first_val
      FROM events
      ORDER BY event_id"""))

  /** Array higher-order functions over `embeddings` — all codegen'd
    * (transform/filter/aggregate), accumulation in double left-to-right. */
  val q28 = GraftQuery(
    "q28_array_hof",
    "size/element_at/filter/transform/aggregate over the embedding array",
    (s, dir) =>
      table(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).cast(LongType).as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_elem"),
          size(filter(col("embedding"), x => x > lit(0f))).cast(LongType).as("n_positive"),
          round(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double")), 4).as("sum_elems"),
          round(array_max(transform(col("embedding"), x => abs(x.cast("double")))), 6).as("max_abs"))
        .orderBy("vec_id"),
    Some("""
      SELECT vec_id,
             len(embedding) AS dim,
             CAST(embedding[1] AS DOUBLE) AS first_elem,
             len(list_filter(embedding, x -> x > 0)) AS n_positive,
             round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS sum_elems,
             round(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 6) AS max_abs
      FROM embeddings
      ORDER BY vec_id"""))

  /** The reference's format_time (A18, gluettalax.py:91-119) applied to a
    * derived duration column — the engine's one true scalar UDF. */
  val q29 = GraftQuery(
    "q29_format_time",
    "format_time duration formatting (reference A18 semantics incl. negatives)",
    (s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          ((col("event_id") * 7919) % 500000 - 1000).as("sec"))
        .withColumn("human", format_time(col("sec")))
        .orderBy("event_id"),
    Some("""
      WITH t AS (SELECT event_id, (event_id * 7919) % 500000 - 1000 AS sec FROM events),
      u AS (SELECT event_id, sec, abs(sec) AS a,
                   CASE WHEN sec < 0 THEN '-' ELSE '' END AS sg FROM t),
      v AS (SELECT event_id, sec, sg,
                   a // 86400 AS d, (a % 86400) // 3600 AS h,
                   (a % 3600) // 60 AS m, a % 60 AS s2 FROM u)
      SELECT event_id, sec,
             trim(concat(
               CASE WHEN d > 0 THEN sg || CAST(d AS VARCHAR) || 'd ' ELSE '' END,
               CASE WHEN h > 0 THEN sg || CAST(h AS VARCHAR) || 'h ' ELSE '' END,
               CASE WHEN m > 0 THEN sg || CAST(m AS VARCHAR) || 'm ' ELSE '' END,
               CASE WHEN s2 > 0 OR (d = 0 AND h = 0 AND m = 0)
                    THEN sg || CAST(s2 AS VARCHAR) || 's' ELSE '' END)) AS human
      FROM v
      ORDER BY event_id"""))

  /** A9's layout-width aggregate (gluettalax.py:385-391): per-column
    * max(length(value)) over the distinct partition values, seeded with the
    * label length. */
  val q30 = GraftQuery(
    "q30_partition_widths",
    "Per-column max-length layout aggregate over distinct partition values (reference A9)",
    (s, dir) =>
      events(s, dir)
        .select(
          year(col("ts")).cast("string").as("year"),
          lpad(month(col("ts")).cast("string"), 2, "0").as("month"))
        .distinct()
        .agg(
          greatest(max(length(col("year"))), lit(length(lit("year")))).cast(LongType).as("w_year"),
          greatest(max(length(col("month"))), lit(length(lit("month")))).cast(LongType).as("w_month"),
          count(lit(1)).as("n_partitions")),
    Some("""
      SELECT greatest(max(length(y)), length('year')) AS w_year,
             greatest(max(length(m)), length('month')) AS w_month,
             count(*) AS n_partitions
      FROM (SELECT DISTINCT CAST(year(CAST(ts AS TIMESTAMP)) AS VARCHAR) AS y,
                            lpad(CAST(month(CAST(ts AS TIMESTAMP)) AS VARCHAR), 2, '0') AS m
            FROM events)"""))

  /** A13's bulk partition discovery dataflow (gluettalax.py:398-441):
    * file listing → dirname → distinct+sort → parse k=v pairs → keep only
    * well-formed dirs (skip-and-continue). */
  val q31 = GraftQuery(
    "q31_discover_partitions",
    "Partition discovery: dirname distinct/sort + k=v parse + skip malformed (reference A13)",
    (s, dir) =>
      events(s, dir)
        .select(concat(
          lit("warehouse/events/year="), year(col("ts")).cast("string"),
          lit("/month="), lpad(month(col("ts")).cast("string"), 2, "0"),
          lit("/part-"), (col("event_id") % 4).cast("string"), lit(".parquet")).as("path"))
        // dirname via substring_index, not a regex: the strip runs once per
        // ROW (pre-distinct, the hot path at scale); the k=v regex parses
        // below run once per DIRECTORY (post-distinct, ~120 rows)
        .select(substring_index(col("path"), "/", 4).as("dirname"))
        .distinct()
        .select(
          col("dirname"),
          regexp_extract(col("dirname"), "year=([^/]+)", 1).as("year"),
          regexp_extract(col("dirname"), "month=([^/]+)", 1).as("month"))
        .filter(col("year") =!= "" && col("month") =!= "")
        .orderBy("dirname"),
    Some("""
      SELECT dirname,
             regexp_extract(dirname, 'year=([^/]+)', 1) AS year,
             regexp_extract(dirname, 'month=([^/]+)', 1) AS month
      FROM (SELECT DISTINCT regexp_replace(
              'warehouse/events/year=' || CAST(year(CAST(ts AS TIMESTAMP)) AS VARCHAR) ||
              '/month=' || lpad(CAST(month(CAST(ts AS TIMESTAMP)) AS VARCHAR), 2, '0') ||
              '/part-' || CAST(event_id % 4 AS VARCHAR) || '.parquet',
              '/[^/]*$', '') AS dirname
            FROM events)
      WHERE regexp_extract(dirname, 'year=([^/]+)', 1) <> ''
        AND regexp_extract(dirname, 'month=([^/]+)', 1) <> ''
      ORDER BY dirname"""))

  /** Typed Aggregator UDAF (the extension seam for custom aggregates):
    * exact weighted average of price by quantity — BigDecimal buffer, so
    * partial-aggregation order cannot perturb the result. */
  val q36 = GraftQuery(
    "q36_weighted_avg_udaf",
    "Custom typed Aggregator (UDAF): quantity-weighted average price per return flag",
    (s, dir) => {
      val wavg = udaf(graft.functions.WeightedAvg)
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(wavg(col("l_quantity"), col("l_extendedprice")).as("wavg_price"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             CAST(sum(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
               / CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS wavg_price
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Two-stage salted aggregation — the skew pattern for hot keys at 100 TB
    * (event_type has only 5 values, so a naive groupBy sends each key's
    * entire volume to one reducer). Stage 1 aggregates (key, salt) over 16
    * salts; stage 2 merges the 16 partials per key. Results are identical
    * to the naive plan (counts and DECIMAL sums are associative), checked
    * by the oracle's plain GROUP BY. */
  val q40 = GraftQuery(
    "q40_salted_skew_agg",
    "Salted two-stage aggregation over a hot-key column (skew pattern)",
    (s, dir) => {
      val salted = events(s, dir)
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy("event_type", "salt")
        .agg(
          count(lit(1)).as("pn"),
          sum(dec2(col("value"))).as("pv"))
      salted.groupBy("event_type")
        .agg(
          sum(col("pn")).as("n"),
          sum(col("pv")).cast("double").as("total_value"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Semi-structured VARIANT path: build a nested JSON document per event,
    * parse it to Spark 4's VariantType (binary-encoded, no schema
    * inference pass), extract typed paths with variant_get, and probe a
    * missing path with try_variant_get. Variant is the at-scale answer to
    * ragged JSON: one parse, columnar binary storage, per-path typed
    * access — vs from_json's fixed schema or per-path get_json_object
    * re-parses. Longs/strings only in the round-trip (float formatting is
    * engine-specific; q27 covers numeric JSON exactness separately). */
  val q57 = GraftQuery(
    "q57_variant_json",
    "VARIANT semi-structured path: parse_json + typed variant_get paths + try_variant_get miss",
    (s, dir) =>
      events(s, dir)
        .withColumn("k", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k"))
        .withColumn("j", to_json(struct(
          struct(col("event_type").as("type"), dayofmonth(col("ts")).as("day")).as("meta"),
          col("k"),
          array(col("k"), col("k") * 2).as("vals"))))
        .withColumn("v", parse_json(col("j")))
        .select(
          col("event_id"),
          variant_get(col("v"), "$.meta.type", "string").as("vtype"),
          variant_get(col("v"), "$.meta.day", "long").as("vday"),
          variant_get(col("v"), "$.vals[1]", "long").as("vk2"),
          try_variant_get(col("v"), "$.missing", "string").as("vmissing"))
        .orderBy("event_id"),
    Some("""
      SELECT event_id,
             event_type AS vtype,
             CAST(day(CAST(ts AS TIMESTAMP)) AS BIGINT) AS vday,
             2 * CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS vk2,
             CAST(NULL AS VARCHAR) AS vmissing
      FROM events
      ORDER BY event_id"""))

  /** ANSI-mode error-safe scalar functions — the dirty-data cleaning
    * surface: under Spark 4's default ANSI semantics a divide-by-zero or
    * bad cast THROWS (killing a 100 TB job at row 3 trillion), so cleaning
    * pipelines use the try_* family to turn row-level poison into NULLs
    * that downstream aggregates skip. */
  val q67 = GraftQuery(
    "q67_try_functions",
    "ANSI-safe cleaning: try_divide / try_cast poison rows -> NULL, not job failure",
    (s, dir) =>
      events(s, dir)
        .withColumn("k", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k"))
        .select(
          col("event_id"),
          // per_k is a PLAIN IEEE double quotient on BOTH sides: double/long
          // division is bit-deterministic across engines, whereas any decimal
          // rescale (r3) or round() (r4 — Spark rounds doubles through
          // BigDecimal HALF_UP, DuckDB natively) drifts in the last bit.
          try_divide(col("value"), col("k")).as("per_k"),
          try_element_at(split(col("event_type"), "_"), lit(2)).as("type_suffix"),
          expr("try_cast(event_type AS BIGINT)").as("bad_cast"),
          try_divide(lit(1.0), col("k") - col("k")).as("div_zero"))
        .orderBy("event_id"),
    Some("""
      SELECT event_id,
             CAST(value AS DOUBLE)
               / NULLIF(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT), 0)
               AS per_k,
             string_split(event_type, '_')[2] AS type_suffix,
             TRY_CAST(event_type AS BIGINT) AS bad_cast,
             CAST(NULL AS DOUBLE) AS div_zero
      FROM events
      ORDER BY event_id"""))

  val all: Seq[GraftQuery] = Seq(q25, q26, q27, q28, q29, q30, q31, q36, q40, q57, q67)
}
