package graft.operators

import org.apache.spark.sql.functions._

/** The verbatim-TPC-H sweep (VERDICT r9 gap #2): the 14 decision-support
  * queries not already landed as adapted shapes (Q1→q1, Q15→q131,
  * Q17→q119, Q18→q222, Q19→q146, Q20→q145, Q21→q113, Q22→q240). Q5, Q6,
  * Q7, Q8, Q10, Q13, Q14 run the official query text modulo the fixture's
  * value domains (dates shifted into the 1995–2001 data range, NATION_n /
  * fixture p_type literals) and columns the fixture does not carry
  * (o_shippriority, c_address/phone, o_comment — dropped from outputs or
  * filters, noted per query). The fixture has NO partsupp table, so Q2,
  * Q9, Q11, Q16 substitute lineitem-derived supplier-part facts for ps_*
  * columns while keeping the query's defining shape (correlated-min
  * subquery, profit decomposition, HAVING-vs-global-scalar, NOT-IN
  * exclusion). Money math follows the repo determinism law: aggregate in
  * DECIMAL, surface as double (q1's convention).
  *
  * Every query is a join-ordering / pushdown workout Catalyst handles
  * from the declarative plan — no hints except broadcast on the dimension
  * legs AQE would pick anyway at fixture scale.
  */
object TpcH {

  private def ts(d: String) = lit(d).cast("timestamp")
  private def revenue =
    sum(dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))

  /** Q2 — minimum-"cost" supplier. No partsupp: the supplier-part cost
    * fact is the observed minimum sale price per (part, supplier) from
    * lineitem; the defining correlated-min-subquery shape (cost = MIN cost
    * over the part) is intact. Region pinned to EUROPE, p_type LARGE. */
  val tq2 = GraftQuery(
    "q261_tpch_q2",
    "TPC-H Q2 (partsupp-free): min-cost supplier per small LARGE-type part in EUROPE via correlated min",
    (s, dir) => {
      val costs = table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
        .agg(min(dec2(col("l_extendedprice"))).as("cost"))
      val minc = costs.groupBy("partkey").agg(min(col("cost")).as("min_cost"))
      costs.join(minc, Seq("partkey"))
        .filter(col("cost") === col("min_cost"))
        .join(table(s, dir, "part").filter(col("p_type") === "LARGE" && col("p_size") <= 15),
          col("partkey") === col("p_partkey"))
        .join(table(s, dir, "supplier"), col("suppkey") === col("s_suppkey"))
        .join(broadcast(table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(round(col("s_acctbal"), 2).as("s_acctbal"), col("s_name"),
          col("n_name"), col("p_partkey"), col("s_suppkey"),
          col("cost").cast("double").as("cost"))
        .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some("""
      WITH costs AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(CAST(l_extendedprice AS DECIMAL(14,2))) AS cost
        FROM lineitem GROUP BY 1, 2)
      SELECT round(s.s_acctbal, 2) AS s_acctbal, s.s_name, n.n_name,
             p.p_partkey, s.s_suppkey, CAST(c.cost AS DOUBLE) AS cost
      FROM costs c
      JOIN part p ON c.partkey = p.p_partkey
      JOIN supplier s ON c.suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE p.p_type = 'LARGE' AND p.p_size <= 15 AND r.r_name = 'EUROPE'
        AND c.cost = (SELECT min(c2.cost) FROM costs c2
                      WHERE c2.partkey = c.partkey)
      ORDER BY s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
      LIMIT 100"""))

  /** Q3 — shipping-priority revenue. Verbatim minus o_shippriority (not
    * in the fixture). */
  val tq3 = GraftQuery(
    "q262_tpch_q3",
    "TPC-H Q3: top-10 unshipped-order revenue for the BUILDING segment",
    (s, dir) =>
      table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(table(s, dir, "orders").filter(col("o_orderdate") < ts("1996-03-15")),
          col("c_custkey") === col("o_custkey"))
        .join(table(s, dir, "lineitem").filter(col("l_shipdate") > ts("1996-03-15")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(revenue.cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("o_orderdate"), col("l_orderkey"))
        .limit(10),
    Some("""
      SELECT l.l_orderkey AS l_orderkey, o.o_orderdate AS o_orderdate,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      GROUP BY 1, 2
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10"""))

  /** Q4 — order-priority checking. The fixture has no
    * l_commitdate/l_receiptdate, so the EXISTS predicate substitutes the
    * late-shipment test l_shipdate > o_orderdate + 60 days; the defining
    * shape (quarter filter + EXISTS semi-join + priority rollup) is
    * verbatim. */
  val tq4 = GraftQuery(
    "q263_tpch_q4",
    "TPC-H Q4: orders per priority with a late-shipment EXISTS (semi-join)",
    (s, dir) => {
      val o = table(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
          col("o_orderdate") < ts("1996-10-01"))
      val late = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(late, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Q5 — local-supplier volume. Verbatim (region ASIA, 1996). */
  val tq5 = GraftQuery(
    "q264_tpch_q5",
    "TPC-H Q5: revenue from local suppliers per ASIA nation, 1996",
    (s, dir) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1997-01-01")),
          col("c_custkey") === col("o_custkey"))
        .join(table(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(table(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(revenue.cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name")),
    Some("""
      SELECT n.n_name AS n_name,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
        AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n.n_name
      ORDER BY revenue DESC, n_name"""))

  /** Q6 — forecast-revenue change. Verbatim. */
  val tq6 = GraftQuery(
    "q265_tpch_q6",
    "TPC-H Q6: discount-revenue forecast, one filtered scan and a global sum",
    (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(dec2(col("l_extendedprice")) * dec4(col("l_discount")))
          .cast("double").as("revenue")),
    Some("""
      SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24"""))

  /** Q7 — volume shipping between two nations. Verbatim (NATION_1 ↔
    * NATION_2, ship years 1996–1997). */
  val tq7 = GraftQuery(
    "q266_tpch_q7",
    "TPC-H Q7: bilateral shipping volume NATION_1 <-> NATION_2 per year",
    (s, dir) => {
      val n1 = broadcast(table(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(table(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      table(s, dir, "supplier")
        .join(table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1998-01-01")),
          col("s_suppkey") === col("l_suppkey"))
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(revenue.cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2, 3
      ORDER BY supp_nation, cust_nation, l_year"""))

  /** Q8 — national market share. Verbatim (AMERICA, ECONOMY parts,
    * NATION_1's share, order years 1996–1997). */
  val tq8 = GraftQuery(
    "q267_tpch_q8",
    "TPC-H Q8: NATION_1's market share of ECONOMY parts in AMERICA per year",
    (s, dir) => {
      val suppNation = broadcast(table(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val custNation = broadcast(table(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk")))
      table(s, dir, "part").filter(col("p_type") === "ECONOMY")
        .join(table(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
        .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(table(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1998-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(custNation, col("c_nationkey") === col("c_nk"))
        .join(broadcast(table(s, dir, "region")).filter(col("r_name") === "AMERICA"),
          col("c_rk") === col("r_regionkey"))
        .join(suppNation, col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_1",
            dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
            .otherwise(lit(0).cast("decimal(14,2)"))).as("nation_vol"),
          revenue.as("vol"))
        .select(col("o_year"),
          round(col("nation_vol").cast("double") / col("vol").cast("double"), 6)
            .as("mkt_share"))
        .orderBy("o_year")
    },
    Some("""
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             round(CAST(sum(CASE WHEN n1.n_name = 'NATION_1'
                 THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
               / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6)
               AS mkt_share
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
      ORDER BY o_year"""))

  /** Q9 — product-type profit. No ps_supplycost: cost substitutes the
    * part's retail price × quantity (the fixture's only cost-side fact);
    * the defining shape (profit decomposition per nation per year over a
    * 5-way join) is verbatim. STANDARD parts stand in for p_name LIKE. */
  val tq9 = GraftQuery(
    "q268_tpch_q9",
    "TPC-H Q9 (partsupp-free): STANDARD-part profit per supplier nation per year",
    (s, dir) =>
      table(s, dir, "part").filter(col("p_type") === "STANDARD")
        .join(table(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
        .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))) -
            dec2(col("p_retailprice")) * dec2(col("l_quantity"))))
          .cast("double").as("sum_profit"))
        .orderBy(col("nation"), desc("o_year")),
    Some("""
      SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
               - CAST(p.p_retailprice AS DECIMAL(14,2))
                 * CAST(l.l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_profit
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_type = 'STANDARD'
      GROUP BY 1, 2
      ORDER BY nation, o_year DESC"""))

  /** Q10 — returned-item reporting. Verbatim minus c_address/c_phone/
    * c_comment (not in the fixture). */
  val tq10 = GraftQuery(
    "q269_tpch_q10",
    "TPC-H Q10: top-20 customers by returned-item revenue, 1996 Q4",
    (s, dir) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-10-01") &&
            col("o_orderdate") < ts("1997-01-01")),
          col("c_custkey") === col("o_custkey"))
        .join(table(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
        .agg(revenue.cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20),
    Some("""
      SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
             round(c.c_acctbal, 2) AS c_acctbal, n.n_name AS n_name,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_returnflag = 'R'
      GROUP BY 1, 2, 3, 4
      ORDER BY revenue DESC, c_custkey
      LIMIT 20"""))

  /** Q11 — important stock. No partsupp: part value substitutes the sold
    * value sum(extprice) per part from NATION_3's suppliers; the defining
    * shape — per-part rollup HAVING > fraction × global scalar — is
    * verbatim (the scalar rides a broadcast cross join, never a
    * re-scan). */
  val tq11 = GraftQuery(
    "q270_tpch_q11",
    "TPC-H Q11 (partsupp-free): NATION_3 part values above 0.1% of the national total",
    (s, dir) => {
      val natLines = table(s, dir, "lineitem")
        .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(table(s, dir, "nation")).filter(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
      val perPart = natLines.groupBy(col("l_partkey").as("p_key"))
        .agg(sum(dec2(col("l_extendedprice"))).as("value"))
      val total = perPart.agg(sum(col("value")).as("total"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value") > col("total") * lit(0.001))
        .select(col("p_key"), col("value").cast("double").as("value"))
        .orderBy(desc("value"), col("p_key"))
    },
    Some("""
      WITH pp AS (
        SELECT l.l_partkey AS p_key,
               sum(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS value
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY 1)
      SELECT p_key, CAST(value AS DOUBLE) AS value
      FROM pp
      WHERE value > (SELECT sum(value) FROM pp) * 0.001
      ORDER BY value DESC, p_key"""))

  /** Q12 — shipping-mode priority split. No l_shipmode/l_receiptdate:
    * l_linestatus stands in for the mode, and "received late in the
    * window" becomes shipped in 1996; the defining CASE-split aggregation
    * over the orders join is verbatim. */
  val tq12 = GraftQuery(
    "q271_tpch_q12",
    "TPC-H Q12: high/low-priority order counts per line status, 1996 shipments",
    (s, dir) =>
      table(s, dir, "orders")
        .join(table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1997-01-01")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), true))
            .as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), true))
            .as("low_line_count"))
        .orderBy("l_linestatus"),
    Some("""
      SELECT l.l_linestatus AS l_linestatus,
             CAST(count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 END) AS BIGINT) AS high_line_count,
             CAST(count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 END) AS BIGINT) AS low_line_count
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
      ORDER BY l_linestatus"""))

  /** Q13 — customer order-count distribution. Verbatim minus the
    * o_comment NOT LIKE filter (no o_comment in the fixture): LEFT OUTER
    * join so zero-order customers land in the c_count = 0 bucket. */
  val tq13 = GraftQuery(
    "q272_tpch_q13",
    "TPC-H Q13: histogram of customers by order count (left-outer + double aggregate)",
    (s, dir) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count")),
    Some("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""))

  /** Q14 — promotion effect. Verbatim (fixture p_type 'PROMO' matches the
    * official LIKE 'PROMO%' predicate). */
  val tq14 = GraftQuery(
    "q273_tpch_q14",
    "TPC-H Q14: promo revenue share of September 1996 shipments",
    (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-09-01") &&
          col("l_shipdate") < ts("1996-10-01"))
        .join(table(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type").like("PROMO%"),
            dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
            .otherwise(lit(0).cast("decimal(14,2)"))).as("promo"),
          revenue.as("total"))
        .select(round(col("promo").cast("double") * 100.0 /
          col("total").cast("double"), 4).as("promo_revenue")),
    Some("""
      SELECT round(CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
               THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
               ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) * 100.0
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4)
               AS promo_revenue
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'"""))

  /** Q16 — parts/supplier relationship. No partsupp: the supplier-offers-
    * part fact comes from lineitem's distinct (part, supplier) pairs; the
    * s_comment LIKE exclusion becomes a negative-balance supplier
    * exclusion (the fixture's only supplier attribute) — the defining
    * shape (attribute filter + NOT IN anti-join + count-distinct rollup)
    * is verbatim. */
  val tq16 = GraftQuery(
    "q274_tpch_q16",
    "TPC-H Q16 (partsupp-free): supplier counts per brand/type/size, bad suppliers excluded",
    (s, dir) => {
      val badSupp = table(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val offers = table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      table(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("PROMO%") &&
          col("p_size").isin(1, 4, 7, 9, 15, 23, 36, 45))
        .join(offers, col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""
      SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
             CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part p ON p.p_partkey = ps.l_partkey
      WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%'
        AND p.p_size IN (1, 4, 7, 9, 15, 23, 36, 45)
        AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  val all: Seq[GraftQuery] = Seq(tq2, tq3, tq4, tq5, tq6, tq7, tq8, tq9,
    tq10, tq11, tq12, tq13, tq14, tq16)
}
