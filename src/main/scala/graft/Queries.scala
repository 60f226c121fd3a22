package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational query battery over the driver's TPC-H-ish parquet tables.
  *
  * Design notes (100 TB mindset):
  *  - Every query is a declarative DataFrame plan: filters/projections reach the
  *    parquet scan (Catalyst pushdown), joins use broadcast hints for dimension
  *    tables, aggregations are hash-agg with map-side partial aggregation.
  *  - Double-typed measures are summed as DECIMAL (exact, associative, order-
  *    independent) then cast back to double: a float sum over a shuffled dataset
  *    is not deterministic across partitionings, a decimal sum is. This makes
  *    results bit-stable at any parallelism AND hash-comparable to the DuckDB
  *    oracle.
  *  - Deterministic total ORDER BY everywhere so row order matches the oracle.
  */
object Queries {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    // events.parquet carries TIMESTAMP(NANOS); Spark has no nanos timestamp
    // and reads it as TIMESTAMP_NTZ (µs, nanos floored) — event-time queries
    // normalize via graft.streaming.EventStreams.tsMicros.
    s.read.parquet(s"$dir/$name.parquet")

  /** Scale-adaptive SCAN-PARALLELISM floor. The bench tables are single
    * small parquet files (one row group, unsplittable), so Spark plans a
    * 1-task scan and every per-row kernel above it — codecs, shingling,
    * MinHash, regex features — serializes on one core of the cluster.
    * When the input's optimizer size estimate cannot keep every core busy
    * at ~8 MB/core, ONE hash exchange with an EXPLICIT partition count
    * (AQE never coalesces explicit-N repartitions, and the tiny-byte
    * shuffles here are exactly what its coalescer would collapse back to
    * one task) spreads the rows across `defaultParallelism` tasks, for
    * the cost of shuffling an input that is — by the very condition —
    * tiny. At scale the condition is false and the plan is untouched, so
    * nothing here is tuned to local mode; the threshold scales with the
    * cluster (bytes-per-core), not with a partition-count constant. */
  def spread(df: DataFrame, by: String*): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val n = sc.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (n > 1 && bytes < BigInt(n) * (8L << 20)) {
      // key choice matters for column pruning: hash by a column the query
      // reads anyway (a keyed spread of an unreferenced column would widen
      // the scan's ReadSchema — CI-pinned in PushdownGuardSpec); no key =
      // deterministic round-robin (sort-before-repartition stays on)
      if (by.isEmpty) df.repartition(n) else df.repartition(n, by.map(col): _*)
    } else df
  }

  /** [[spread]] + GLOBAL ORDER for per-row-kernel queries that end in
    * `orderBy(key)`: range-partition and locally sort the SLIM input
    * (ids, a few columns) BELOW the kernel so (a) the kernel runs on every
    * core and (b) the output is already in key order — the caller drops
    * its final `orderBy`, which removes the post-kernel range exchange
    * AND the range-boundary sampling job that re-executes the whole
    * narrow kernel chain a second time (a Sort directly above a long
    * narrow stage samples its child's full lineage; mm_decode_jpeg paid
    * its eight codec passes twice for exactly this). Narrow operators
    * (Project / MapElements / SerializeFromObject) preserve partition
    * contents and no exchange follows, so global key order survives to
    * the sink — rows identical, order identical, only the plan moves the
    * sort below the compute. Partition count grows with the input
    * (~64 MB/core target, parallelism floor, 2²⁰ cap), so the shape holds
    * at any scale — sorting the slim projection first is strictly
    * cheaper than sorting the kernel output at 100 TB too. */
  def orderedSpread(df: DataFrame, key: String): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = ((bytes / (64L << 20)) + 1)
      .max(BigInt(sc.defaultParallelism)).min(BigInt(1 << 20)).toInt
    df.repartitionByRange(n, col(key)).sortWithinPartitions(col(key))
  }

  /** Exact order-independent sum of a double column via decimal, as double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count. */
  def davg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(DecimalType(28, scale))).cast(DoubleType) / count(c))

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1 style pricing summary: scan-heavy, partial-agg friendly.
    * Mirrors the reference's delegated groupby-agg surface (daskberg
    * ice.py:255-264 delegates to dask; tests/test_basic.py:19 value_counts). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = spread(t(s, dir, "lineitem"), "l_shipdate")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // ---------------------------------------------------------------- q02
  /** Filter + projection pushdown: only 4 columns reach the scan. */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 49 && col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // ---------------------------------------------------------------- q03
  /** TPC-H Q3: shipping-priority top-k. Broadcast the filtered customer dim. */
  def q03TopRevenueOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    // orders end up BROADCAST (plans/r21/q03_*_after.txt): spreading a
    // broadcast build side is a wasted exchange, so only the fact side gets
    // the parallelism floor
    val ord  = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15").cast(TimestampType))
    val li   = spread(t(s, dir, "lineitem"), "l_orderkey")
      .filter(col("l_shipdate") > lit("1995-03-15").cast(TimestampType))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // ---------------------------------------------------------------- q04
  /** Semi-join (EXISTS): orders having any heavy lineitem. */
  def q04SemiJoinPriority(s: SparkSession, dir: String): DataFrame = {
    val heavy = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      .select(col("l_orderkey"))
    t(s, dir, "orders")
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  // ---------------------------------------------------------------- q05
  /** Multi-way join through the star schema with broadcast dims (TPC-H Q5 shape). */
  def q05NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val li   = spread(t(s, dir, "lineitem"), "l_orderkey")
    // every dimension side of this star join broadcasts (plans/r21) — only
    // the fact side benefits from the parallelism floor
    val ord  = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val sup  = t(s, dir, "supplier")
    val nat  = t(s, dir, "nation")
    val reg  = t(s, dir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // ---------------------------------------------------------------- q06
  /** TPC-H Q6: pure scan + filter + global agg — tests pushdown efficiency. */
  def q06ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    spread(t(s, dir, "lineitem"), "l_shipdate")
      .filter(col("l_shipdate") >= lit("1994-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1995-01-01").cast(TimestampType) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"))

  // ---------------------------------------------------------------- q07
  /** Anti-join (NOT EXISTS): orders with no bulk lineitem. */
  def q07AntiJoinCustomers(s: SparkSession, dir: String): DataFrame = {
    val bulk = t(s, dir, "lineitem").filter(col("l_quantity") > 30)
      .select(col("l_orderkey"))
    t(s, dir, "orders")
      .join(bulk, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  // ---------------------------------------------------------------- q08
  /** Returned-items revenue per customer, top 20 (TPC-H Q10 shape). */
  def q08ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    t(s, dir, "orders")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(20)
  }

  // ---------------------------------------------------------------- q09
  /** Window functions: rank / lag per customer order history. */
  def q09WindowOrders(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"), col("prev_price"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  // ---------------------------------------------------------------- q10
  /** Running (cumulative) window aggregate over a fact table. */
  def q10RunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        col("value").cast(DecimalType(28, 4)).as("v"))
      .withColumn("running_value", sum(col("v")).over(w).cast(DoubleType))
      .select(col("event_id"), col("user_id"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  // ---------------------------------------------------------------- q11
  /** Set operations: INTERSECT / EXCEPT with a tag, one unioned result. */
  def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
    val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
    val both = cn.intersect(sn).withColumn("tag", lit("both"))
    val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
    both.unionByName(custOnly)
      .select(col("tag"), col("nationkey"))
      .orderBy(col("tag"), col("nationkey"))
  }

  // ---------------------------------------------------------------- q12
  /** Exact distinct aggregation per group. */
  def q12DistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  // ---------------------------------------------------------------- q13
  /** ROLLUP grouping sets (multi-level aggregation in one pass). */
  def q13Rollup(s: SparkSession, dir: String): DataFrame =
    spread(t(s, dir, "lineitem"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  // ---------------------------------------------------------------- q14
  /** Conditional aggregation + HAVING. */
  def q14CaseHaving(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_totalprice") > 100000.0, 1).otherwise(0)).as("n_big"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("n_urgent"),
        count(lit(1)).as("n"))
      .filter(col("n") > 10)
      .orderBy(col("o_orderstatus"))

  // ---------------------------------------------------------------- q15
  /** JSON extraction from a string column (events.props). */
  def q15JsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n"))
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q16
  /** Time bucketing: monthly order aggregates via date_trunc. */
  def q16MonthlyOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total"))
      .orderBy(col("month"))

  // ---------------------------------------------------------------- q17
  /** Top-k per group via ranking window (QUALIFY pattern). */
  def q17TopPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  // ---------------------------------------------------------------- q18
  /** Scalar function coverage: string/math functions in one projection. */
  def q18ScalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        floor(col("p_retailprice")).as("price_floor"),
        (col("p_size") % 5).as("size_mod"))
      .filter(col("p_name").like("%gold%") || col("p_size") > 45)
      .orderBy(col("p_partkey"))

  // ---------------------------------------------------------------- q19
  /** Scalar subquery (above-average orders) via Spark SQL. */
  def q19ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_orders")
    s.sql("""
      SELECT o_orderstatus, count(*) AS n_above_avg
      FROM graft_orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM graft_orders)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")
  }

  // ---------------------------------------------------------------- q20
  /** Join + grouped sort with multiple measures (supplier scorecard). */
  def q20SupplierScorecard(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice"), 2).as("gross"),
        max(col("l_quantity")).as("max_qty"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("n_items"), col("gross"), col("max_qty"))
      .orderBy(col("s_suppkey"))
  }

  // ---------------------------------------------------------------- q21
  /** Exact interpolated median via built-in percentile. */
  def q21Percentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        percentile(col("l_extendedprice"), lit(0.25)).as("p25_price"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- q22
  /** GROUPING SETS — multi-grain aggregation in one pass (SQL surface). */
  def q22GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_orders_gs")
    s.sql("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS n
      FROM graft_orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""")
  }

  // ---------------------------------------------------------------- q23
  /** Typed Aggregator (UDAF surface): discount-weighted average price. */
  def q23WeightedAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions.udaf
    val wavg = udaf(graft.functions.Aggregators.WeightedAvg)
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
      .orderBy(col("l_returnflag"))
  }

  // ---------------------------------------------------------------- q24
  /** Non-equi (range/theta) join: price bands × parts, broadcast nested loop. */
  def q24BandJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(("low", 0.0, 930.0), ("mid", 930.0, 960.0),
      ("high", 960.0, 1e9)).toDF("band", "lo", "hi")
    t(s, dir, "part")
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"), dsum(col("p_retailprice"), 2).as("total_price"))
      .orderBy(col("band"))
  }

  // ---------------------------------------------------------------- q25
  /** Sketch aggregation: HLL++ approximate distinct (the scale path for
    * count-distinct), with a BOUNDED-ERROR oracle: the sketch estimate
    * must land within ±5% of the exact per-group count (rsd=0.02 →
    * 2.5σ; measured max error 3.3% at sf0.1). DuckDB recomputes the exact
    * side independently; an out-of-bound estimate zeroes the flag and
    * fails the hash match. */
  def q25ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("approx") - col("exact_orders")).cast("double") /
          col("exact_orders") <= 0.05).cast("long").as("within_5pct"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- q27
  /** Sketch aggregation: approximate MEDIAN (percentile_approx's
    * Greenwald-Khanna-style sketch — the scale path for quantiles, one
    * mergeable sketch per partition instead of a global sort), with a
    * BOUNDED-ERROR oracle: accuracy=2000 bounds the rank error to
    * n/2000 (0.05 % of ranks), so the estimate must land inside the exact
    * [p49, p51] value band — verified Spark-side, flag hashed; DuckDB
    * independently recomputes the group count and the exact DISCRETE
    * median (an actual data value, same rank rule in both engines, so the
    * hash compare is bit-exact with no float interpolation). */
  def q27ApproxQuantile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(2000)).as("approx"),
        expr("percentile(l_extendedprice, 0.49)").as("lo"),
        expr("percentile(l_extendedprice, 0.51)").as("hi"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
          .as("exact_median"))
      .select(col("l_returnflag"), col("n_items"), col("exact_median"),
        (col("approx") >= col("lo") && col("approx") <= col("hi"))
          .cast("long").as("within_rank_band"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- q26
  /** CUBE — all grouping combinations in one pass. */
  def q26Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** As-of backward join: each event picks the latest purchase (of the same
    * user) at or before its time. */
  def ajAsof(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val tus = graft.streaming.EventStreams.tsMicros(ev)
    val left = ev.select(col("event_id"), col("user_id"), tus.as("tus"))
    // right side: purchases, dedup per (user, µs) keeping max event id —
    // makes the as-of pick deterministic in both engines at equal times
    val w = Window.partitionBy(col("user_id"), col("tus"))
      .orderBy(col("purchase_event_id").desc)
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_event_id"), col("user_id"),
        tus.as("tus"), col("value").as("purchase_value"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    graft.operators.AsOfJoin.asofBackward(left, right, key = "user_id",
        leftTime = "tus", rightTime = "tus",
        rightCols = Seq("purchase_event_id", "purchase_value"))
      .select(col("event_id"), col("user_id"),
        col("purchase_event_id"), col("purchase_value"))
      .orderBy("event_id")
  }


  val relational: Map[String, (SparkSession, String) => DataFrame] = Map(
    "aj_asof" -> (ajAsof _),
    "q26_cube"             -> (q26Cube _),
    "q24_band_join"        -> (q24BandJoin _),
    "q25_approx_distinct"  -> (q25ApproxDistinct _),
    "q27_approx_quantile"  -> (q27ApproxQuantile _),
    "q21_percentile"       -> (q21Percentile _),
    "q22_grouping_sets"    -> (q22GroupingSets _),
    "q23_weighted_avg"     -> (q23WeightedAvg _),
    "q01_pricing_summary"  -> (q01PricingSummary _),
    "q02_filter_project"   -> (q02FilterProject _),
    "q03_top_revenue"      -> (q03TopRevenueOrders _),
    "q04_semi_join"        -> (q04SemiJoinPriority _),
    "q05_nation_revenue"   -> (q05NationRevenue _),
    "q06_forecast_revenue" -> (q06ForecastRevenue _),
    "q07_anti_join"        -> (q07AntiJoinCustomers _),
    "q08_returned_items"   -> (q08ReturnedItems _),
    "q09_window_orders"    -> (q09WindowOrders _),
    "q10_running_sum"      -> (q10RunningSum _),
    "q11_set_ops"          -> (q11SetOps _),
    "q12_distinct_agg"     -> (q12DistinctAgg _),
    "q13_rollup"           -> (q13Rollup _),
    "q14_case_having"      -> (q14CaseHaving _),
    "q15_json_extract"     -> (q15JsonExtract _),
    "q16_monthly_orders"   -> (q16MonthlyOrders _),
    "q17_top_per_group"    -> (q17TopPerGroup _),
    "q18_scalar_funcs"     -> (q18ScalarFuncs _),
    "q19_scalar_subquery"  -> (q19ScalarSubquery _),
    "q20_supplier_scorecard" -> (q20SupplierScorecard _),
  )

  /** DuckDB-equivalent SQL for each query above; column names and row order
    * must match the Spark results exactly (driver hashes sorted-by-name cols). */
  val relationalOracle: Map[String, String] = Map(
    // bounded-error oracle: exact side recomputed by DuckDB; within_5pct
    // is a literal 1 that Spark zeroes when the HLL++ estimate drifts out
    // of the ±5% bound
    "q25_approx_distinct" -> """
      SELECT l_returnflag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        CAST(1 AS BIGINT) AS within_5pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // bounded-error oracle: exact discrete median + count recomputed by
    // DuckDB; within_rank_band is a literal 1 that Spark zeroes when the
    // sketch estimate leaves the exact [p49, p51] band
    "q27_approx_quantile" -> """
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
        quantile_disc(l_extendedprice, 0.5) AS exact_median,
        CAST(1 AS BIGINT) AS within_rank_band
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "aj_asof" -> """
      WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events),
      p0 AS (SELECT event_id AS purchase_event_id, user_id, epoch_us(ts) AS tus, value
             FROM events WHERE event_type = 'purchase'),
      p AS (SELECT * FROM p0
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, tus
                                       ORDER BY purchase_event_id DESC) = 1)
      SELECT e.event_id, e.user_id, p.purchase_event_id, p.value AS purchase_value
      FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.tus >= p.tus
      ORDER BY e.event_id""",
    "q26_cube" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus""",
    "q24_band_join" -> """
      SELECT band, COUNT(*) AS n_parts,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
      FROM part
      JOIN (VALUES ('low', 0.0, 930.0), ('mid', 930.0, 960.0),
                   ('high', 960.0, 1e9)) AS bands(band, lo, hi)
        ON p_retailprice >= lo AND p_retailprice < hi
      GROUP BY band
      ORDER BY band""",
    "q21_percentile" -> """
      SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS median_qty,
        quantile_cont(l_extendedprice, 0.25) AS p25_price
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q22_grouping_sets" -> """
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""",
    "q23_weighted_avg" -> """
      SELECT l_returnflag,
        CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE)
          / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS wavg_price
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      FROM lineitem
      WHERE l_quantity > 49 AND l_discount >= 0.05
      ORDER BY l_orderkey, l_linenumber""",
    "q03_top_revenue" -> """
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1995-03-15'
        AND l_shipdate > TIMESTAMP '1995-03-15'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""",
    "q04_semi_join" -> """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    "q05_nation_revenue" -> """
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",
    "q06_forecast_revenue" -> """
      SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
    "q07_anti_join" -> """
      SELECT o_orderpriority, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
      FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM lineitem
                        WHERE l_orderkey = o_orderkey AND l_quantity > 30)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    "q08_returned_items" -> """
      SELECT o_custkey,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'R'
      GROUP BY o_custkey
      ORDER BY revenue DESC, o_custkey
      LIMIT 20""",
    "q09_window_orders" -> """
      SELECT o_custkey, rn, o_orderkey, o_totalprice, prev_price FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
          LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rn""",
    "q10_running_sum" -> """
      SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER (
          PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      FROM events
      ORDER BY user_id, event_id""",
    "q11_set_ops" -> """
      SELECT 'both' AS tag, nationkey FROM (
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      UNION ALL
      SELECT 'cust_only' AS tag, nationkey FROM (
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      ORDER BY tag, nationkey""",
    "q12_distinct_agg" -> """
      SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_customers
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "q13_rollup" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus""",
    "q14_case_having" -> """
      SELECT o_orderstatus,
        CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        COUNT(*) AS n
      FROM orders
      GROUP BY o_orderstatus
      HAVING COUNT(*) > 10
      ORDER BY o_orderstatus""",
    "q15_json_extract" -> """
      SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",
    "q16_monthly_orders" -> """
      SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY date_trunc('month', o_orderdate)
      ORDER BY month""",
    "q17_top_per_group" -> """
      SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
          ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer)
      WHERE rn <= 2
      ORDER BY c_mktsegment, rn""",
    "q18_scalar_funcs" -> """
      SELECT p_partkey,
        UPPER(p_brand) AS brand_upper,
        LENGTH(p_name) AS name_len,
        SUBSTRING(p_type, 1, 5) AS type_prefix,
        CONCAT_WS('-', p_brand, p_type) AS brand_type,
        CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
        p_size % 5 AS size_mod
      FROM part
      WHERE p_name LIKE '%gold%' OR p_size > 45
      ORDER BY p_partkey""",
    "q19_scalar_subquery" -> """
      SELECT o_orderstatus, count(*) AS n_above_avg
      FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",
    "q20_supplier_scorecard" -> """
      SELECT s_suppkey, s_name, n_name, n_items, gross, max_qty FROM (
        SELECT l_suppkey, COUNT(*) AS n_items,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS gross,
          MAX(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_suppkey) agg
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      ORDER BY s_suppkey""",
  )
}
