package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational breadth over the TPC-H-ish corpus — the operator families the
  * reference delegates to its host engine (SURVEY.md §2.5: joins, sorts, set
  * ops, window functions, scalar functions all fall through `try_rewrite`
  * returning None, `/root/reference/datafusion-uwheel/src/lib.rs:250,580,595`)
  * and that stock Spark SQL must therefore answer in our engine.
  *
  * Determinism rules shared with the DuckDB oracle: additive aggregates go
  * through DECIMAL and are lowered to DOUBLE once; counts/lengths are cast to
  * BIGINT (DuckDB's sum(int)→HUGEINT, length→BIGINT would otherwise drift
  * from Spark's types); every query has a total ORDER BY; NULL ordering is
  * spelled out where rollup rows appear.
  *
  * Scale notes (100 TB design point): q3/q5 join dimension-filtered customer
  * to orders/lineitem — Spark broadcasts the small sides automatically under
  * AQE; q1 is a single map-side-combinable hash aggregate; window queries
  * shuffle once on the partition key. No query collects to the driver.
  */
object RelationalQueries {

  private val disc = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  /** (name, shared SQL) — same text runs on Spark and DuckDB. */
  private val shared: Seq[(String, String)] = Seq(
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
         |  CAST(sum($disc) AS DOUBLE) AS sum_disc,
         |  CAST(count(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name, CAST(sum($disc) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q3_topk" ->
      s"""SELECT l_orderkey, CAST(sum($disc) AS DOUBLE) AS revenue, o_orderdate
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q10_returned_topk" ->
      s"""SELECT c_custkey, c_name, CAST(sum($disc) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY c_custkey, c_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // correlated scalar subquery (TPC-H Q17 flavor). l_quantity is
    // integral-valued, so avg() is exact in any accumulation order and the
    // threshold membership is engine-independent.
    "q17_small_qty" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#4'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    "q_semi_join" ->
      """SELECT CAST(count(*) AS BIGINT) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)""".stripMargin,

    "q_anti_join" ->
      """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_distinct" ->
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |       CAST(count(*) AS BIGINT) AS n FROM orders""".stripMargin,

    "q_topk_orders" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",

    "q_union" ->
      """SELECT CAST(c_nationkey AS INT) AS k FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS INT) AS k FROM supplier
        |ORDER BY k""".stripMargin,

    "q_except" ->
      """SELECT DISTINCT event_type AS k FROM events
        |EXCEPT
        |SELECT DISTINCT o_orderstatus AS k FROM orders
        |ORDER BY k""".stripMargin,

    "q_left_join" ->
      """SELECT c_mktsegment, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_intersect" ->
      """SELECT CAST(c_nationkey AS INT) AS k FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS INT) AS k FROM supplier
        |ORDER BY k""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_lead" ->
      """SELECT o_custkey, o_orderkey, next_key FROM (
        |  SELECT o_custkey, o_orderkey,
        |         lead(o_orderkey) OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate, o_orderkey) AS next_key
        |  FROM orders) t
        |WHERE o_custkey < 50 ORDER BY o_custkey, o_orderkey""".stripMargin,

    "dd_events_exact" ->
      """SELECT user_id, event_type, value, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY user_id, event_type, value
        |HAVING count(*) > 1
        |ORDER BY user_id, event_type, value""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    // correlated EXISTS subquery (decorrelated by both planners into a semi join)
    "q_exists" ->
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    // uncorrelated scalar subquery; the threshold goes through DECIMAL so
    // both engines compute the identical double before comparing
    "q_scalar_subq" ->
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders
        |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |                             / count(*) FROM orders) * 1.8
        |ORDER BY o_orderkey""".stripMargin,

    "q_case_agg" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS b,
        |  substring(p_type, 1, 6) AS t6,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat(p_brand, '-', p_type) AS bt,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  abs(p_size - 25) AS size_dist
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_json_extract" ->
      """SELECT CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) % 10 AS bucket,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    // rolling time-window aggregate: a RANGE (event-time interval) frame,
    // not ROWS — the per-entity "activity in the trailing hour" shape.
    // One shuffle on the partition key; the frame slides in a single sort
    // pass per partition.
    "q_window_timerange" ->
      """SELECT event_id,
        |       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
        |            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last_hour
        |FROM events WHERE user_id < 20 ORDER BY event_id""".stripMargin,

    // pivot as conditional aggregation (the portable, codegen-friendly form;
    // Spark's PIVOT clause plans to exactly these CASE aggregates)
    "q_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS open_rev,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS filled_rev,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS partial_rev
        |FROM orders GROUP BY 1 ORDER BY y""".stripMargin,

    // mode (most frequent value) per group, deterministic min-value tiebreak
    "q_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority FROM (
        |  SELECT o_orderstatus, o_orderpriority,
        |         row_number() OVER (PARTITION BY o_orderstatus
        |             ORDER BY count(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority) t
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    // latest-record compaction (CDC/upsert semantics): one row per user —
    // their most recent event — the "current snapshot from an append log"
    // step every incremental pipeline runs. One shuffle on the key; at
    // 100 TB this is the window form of max_by, with no self-join.
    "q_latest_snapshot" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Pearson correlation per group from decimal-exact moment sums: the five
    // sums are exact integers (DECIMAL) in any accumulation order, lowered to
    // DOUBLE once. The closed-form combination is reported as a nano-unit
    // INTEGER (round(r * 1e9)): the divide/sqrt chain can differ by 1 ULP
    // across engines (FMA contraction), which the fixed-point rounding
    // absorbs — measured boundary margins are >=1e6 x the ULP noise at
    // every SF. One map-side-combinable hash aggregate; scales like q1.
  )

  /** r18 fanned variants (guide §2.5): the single-file lineitem scan
    * otherwise runs its 600k-row multi-column decimal moment aggregation
    * in ONE task; a gated `/*+ REPARTITION(w) */` on a projected scan CTE
    * spreads it across the session's cores. The hint is a dialect-neutral
    * comment and `build(0)` (the at-scale form) IS the DuckDB oracle text,
    * so both engines always run the same semantics. Measured and kept for
    * the two heaviest aggregations only (q_corr 1.00 -> 0.84 s, q_cube
    * 0.95 -> 0.83); the same treatment measured FLAT on q1_pricing and
    * REGRESSED q5_region_revenue 2x (the repartition node in the 6-way
    * join disturbed join planning), so those keep their shared form. */
  private val fannedShared: Seq[(String, String, Int => String)] = Seq(
    ("q_cube", "lineitem", (h: Int) =>
      s"""WITH l0 AS (SELECT ${Q.repHint(h)}l_returnflag, l_linestatus, l_quantity FROM lineitem)
         |SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         |FROM l0
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),

    // Pearson correlation per group from decimal-exact moment sums: the five
    // sums are exact integers (DECIMAL) in any accumulation order, lowered to
    // DOUBLE once. The closed-form combination is reported as a nano-unit
    // INTEGER (round(r * 1e9)): the divide/sqrt chain can differ by 1 ULP
    // across engines (FMA contraction), which the fixed-point rounding
    // absorbs — measured boundary margins are >=1e6 x the ULP noise at
    // every SF. One map-side-combinable hash aggregate; scales like q1.
    ("q_corr", "lineitem", (h: Int) =>
      s"""WITH l0 AS (SELECT ${Q.repHint(h)}l_returnflag, l_quantity, l_extendedprice FROM lineitem),
         |s AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
         |  FROM l0 GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  CAST(round(((n * sxy - sx * sy)
         |       / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))) * 1000000000) AS BIGINT) AS corr_e9
         |FROM s ORDER BY l_returnflag""".stripMargin),
  )

  /** (name, Spark SQL, DuckDB SQL) — engine dialects differ only in the
    * aggregation function spelling; semantics (incl. order) are identical. */
  private val split: Seq[(String, String, String)] = Seq(
    // ordered string aggregation (LISTAGG): deterministic because the
    // element order is sorted explicitly on both sides
    ("q_listagg",
      """SELECT r_name, concat_ws(',', sort_array(collect_list(n_name))) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),

    // Banded time-proximity self-join (interval/range join): same-user event
    // pairs within 120 s. The Spark side is the SCALE form — events land in
    // 120 s epoch buckets, the left side probes its own and the next bucket
    // (covers every pair since bucket width = window), so the join is an
    // equi-join on (user, bucket) that shuffles each side once; no
    // inequality-only join, no cartesian corner. The oracle is the direct
    // quadratic formulation. Pair canonicalization: earlier event first,
    // id-ordered at equal timestamps.
    ("q_time_band_join",
      """WITH e AS (SELECT user_id, event_id, unix_micros(cast(ts AS timestamp)) AS us FROM events),
        |a AS (SELECT user_id, event_id, us,
        |             explode(array(us div 120000000, us div 120000000 + 1)) AS bk FROM e),
        |b AS (SELECT user_id, event_id AS id_b, us AS us_b, us div 120000000 AS bk FROM e)
        |SELECT a.event_id AS id_a, b.id_b AS id_b, CAST(b.us_b - a.us AS BIGINT) AS dt_us
        |FROM a JOIN b ON a.user_id = b.user_id AND a.bk = b.bk
        |WHERE b.us_b >= a.us AND b.us_b - a.us <= 120000000
        |  AND (b.us_b > a.us OR a.event_id < b.id_b)
        |ORDER BY id_a, id_b""".stripMargin,
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
        |SELECT a.event_id AS id_a, b.event_id AS id_b, CAST(b.us - a.us AS BIGINT) AS dt_us
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |WHERE b.us >= a.us AND b.us - a.us <= 120000000
        |  AND (b.us > a.us OR a.event_id < b.event_id)
        |ORDER BY id_a, id_b""".stripMargin),
  )

  /** Point-in-time ("as-of") join, the operator behind click attribution and
    * feature backfill: for each purchase, the same user's most recent click
    * at or before it. Implemented the scale-right way — tag both sides, ONE
    * shuffle on the key, and a linear window pass carrying the latest click
    * forward — instead of the inequality join (`c.ts <= p.ts` + top-1 per
    * purchase) whose intermediate is |purchases| × |prior clicks| per user.
    * Clicks sort before purchases at equal ts (side 0 < 1), matching the
    * oracle's `c.ts <= p.ts` inclusive bound; (user, ts) pairs are unique in
    * this corpus so the pick is tie-free in both formulations. */
  private def asofAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    Q.ctx(spark, sfDir)
    val ev = spark.table("events")
    val tagged = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("event_id").as("id"))
      .unionByName(ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id").as("id")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("click_id", last(when(col("side") === 0, col("id")), ignoreNulls = true).over(w))
      .where(col("side") === 1 && col("click_id").isNotNull)
      .select(col("id").as("purchase_id"), col("click_id"))
      .orderBy("purchase_id")
  }

  /** Oracle for the as-of join: the direct (quadratic) formulation. */
  private val asofOracle: String =
    """WITH j AS (
      |  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |         row_number() OVER (PARTITION BY p.event_id
      |                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |  FROM events p JOIN events c
      |    ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
      |  WHERE p.event_type = 'purchase')
      |SELECT purchase_id, click_id FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin

  val defs: Seq[(String, (SparkSession, String) => DataFrame)] =
    shared.map { case (n, s) => n -> Q.sql(s) } ++
      fannedShared.map { case (n, t, f) => n -> Q.sqlFan(t)(f) } ++
      split.map { case (n, s, _) => n -> Q.sql(s) } :+
      ("q_asof_join" -> (asofAttribution _))

  val oracles: Map[String, String] =
    shared.toMap ++ fannedShared.map { case (n, _, f) => n -> f(0) } ++
      split.map { case (n, _, d) => n -> d } + ("q_asof_join" -> asofOracle)
}
