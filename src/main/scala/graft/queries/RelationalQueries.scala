package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.jobs.OfflineMetrics

/** Batch relational operator queries (SURVEY §2.3-2.5, §2.8) over the driver
  * test tables, each with a DuckDB oracle.
  *
  * Determinism rules used throughout the query registry (the driver
  * hash-compares values): money sums go through DECIMAL casts (exact in both
  * engines, cast back to double), ratios are single IEEE divisions of exact
  * integers (bit-identical across engines), and any float whose value is an
  * order-sensitive sum of many doubles is rounded far below its error bound.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** A1/A4 grouped multi-aggregate (word-count/co-occurrence sum family,
    * `flink-base/.../wc/WorldCount.scala:19`, `OfflineDataSetUtils.java:329`). */
  def aggSum(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        count(lit(1)).as("n"))

  /** TPC-H Q5-shaped "local supplier volume" — the registry's deepest
    * relational plan: lineitem → orders → customer → supplier (with the
    * same-nation condition making the supplier join TWO-key) → nation →
    * region, revenue per (region, nation). Revenue is exact DECIMAL
    * arithmetic end to end — price DECIMAL(18,2) × (1 − discount) at
    * DECIMAL(5,4) — summed exactly and cast to double once, so the float
    * is identical however the shuffle reorders the sum (the q01 device).
    *
    * 100 TB posture: the fact table shuffles ONCE per key it joins on;
    * nation/region are broadcast hints (they are always tiny), while
    * customer/supplier are left to AQE — at these SFs it broadcasts
    * them, at warehouse scale they co-partition with the fact keys.
    */
  def localSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val one = lit(java.math.BigDecimal.ONE).cast("decimal(5,4)")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (one - col("l_discount").cast("decimal(5,4)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q3-shaped "shipping priority" — the other classic relational
    * silhouette: segment-filtered customer → orders → lineitem, revenue
    * per order, top 10 by (revenue desc, order date, order key). The
    * filter pushes into the customer scan, the top-10 lowers to
    * TakeOrderedAndProject (never a global sort), and revenue rides the
    * same exact-DECIMAL path as q128 so the ranking keys are
    * engine-identical floats.
    */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val one = lit(java.math.BigDecimal.ONE).cast("decimal(5,4)")
    Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"),
        col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (one - col("l_discount").cast("decimal(5,4)")))
          .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_date_ms"), col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q6-shaped "forecasting revenue change" — the pure
    * filter-pushdown silhouette: a single scan whose THREE predicates
    * (ship-year window, discount band, quantity cap) all reach the
    * parquet reader, then one exact-DECIMAL sum. The query every
    * storage-pruning claim is demonstrated on: at 100 TB this reads the
    * row groups the date range selects, nothing else.
    */
  def forecastRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val dt = li.schema("l_shipdate").dataType
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast(dt) &&
        col("l_shipdate") < lit("1997-01-01").cast(dt) &&
        col("l_discount").between(0.02, 0.04) &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(5,4)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q17-shaped "small-quantity-order revenue" — the correlated
    * scalar subquery silhouette, decorrelated the way every engine's
    * optimizer does it: the per-part quantity statistics become an
    * aggregate relation joined back on the correlation key, so "quantity
    * below a fifth of the part's average" is one equi join instead of a
    * per-row subquery. The comparison is EXACT integer-free decimal
    * algebra — `5·q·n < Σq` instead of `q < 0.2·(Σq/n)` — because the
    * rewritten predicate has no division, hence no float whose value
    * depends on sum order. The part filter broadcasts.
    *
    * 100 TB posture: both sides of the decorrelation shuffle on the SAME
    * key (l_partkey), so the stats join co-partitions with the stats
    * build; nothing crosses except the bounded per-brand aggregate.
    */
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val stats = li.groupBy(col("l_partkey").as("sp_partkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qsum"),
        count(lit(1)).as("qn"))
    li.join(broadcast(Tables.part(s, dir).filter(col("p_size") <= 10)
        .select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .join(stats, col("l_partkey") === col("sp_partkey"))
      .filter(col("l_quantity").cast("decimal(18,2)") * lit(5) * col("qn") <
        col("qsum"))
      .groupBy("p_brand")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18-shaped "large-volume customers" — the having-filtered
    * self-aggregation silhouette: orders whose lineitems sum past a
    * quantity threshold (the heavy-order relation is the fact table's own
    * aggregate), joined back to orders + customer, top-100 by
    * (totalprice desc, date, key) → TakeOrderedAndProject. The ranking
    * keys are raw stored columns (no arithmetic), so cross-engine order
    * is exact; the quantity sum is DECIMAL for the same reason.
    */
  def largeVolumeCustomers(s: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(s, dir).groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qdec"))
      .filter(col("qdec") > 300)
    Tables.orders(s, dir)
      .join(heavy, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"),
        col("o_totalprice"), col("qdec").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_date_ms"), col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q13-shaped "order count distribution" — the two-level
    * aggregate over an outer join: per-customer order counts (customers
    * with none count 0 through the left join's null key), then the
    * distribution of those counts. Both aggregates hash-combine
    * map-side; the second one's key domain is tiny (distinct counts).
    */
  def orderCountDistribution(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"),
        "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))

  /** TPC-H Q22-shaped "idle rich customers" — the global-scalar-subquery
    * + anti-join silhouette: customers above the positive-balance
    * average with no order since 2000, per market segment. The average
    * comparison is the division-free exact form (`bal·n > Σbal` in
    * DECIMAL); the one-row aggregate broadcasts (a scalar subquery IS a
    * broadcast nested-loop of a 1-row relation); the recency filter
    * pushes into the orders scan BEFORE the anti join.
    */
  def idleRichCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val bal = c.filter(col("c_acctbal") > 0)
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("bsum"),
        count(lit(1)).as("bn"))
    val o = Tables.orders(s, dir)
    val dt = o.schema("o_orderdate").dataType
    c.crossJoin(broadcast(bal))
      .filter(col("c_acctbal").cast("decimal(18,2)") * col("bn") >
        col("bsum"))
      .join(o.filter(col("o_orderdate") >= lit("2000-01-01").cast(dt)),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast("decimal(18,2)"))
          .cast("double").as("total_bal"))
  }

  /** TPC-H Q2-shaped "cheapest supplier per part" — the min-per-group
    * decorrelation silhouette: the correlated `price = (SELECT MIN ...)`
    * subquery becomes a per-(part, supplier) min aggregate, then a
    * min-over-the-part WINDOW on that bounded pair relation with an
    * equality filter — the self-join-free form of min-per-group: the
    * naive agg-join-back reads the FACT TABLE twice (Spark recomputes
    * the shared pair aggregate under both join branches — verified in
    * the plan), where this shape scans it once, map-side-combines on
    * the pair key, and every later exchange moves only the pair
    * relation (≤ one row per observed (part, supplier)). The window
    * partitions on l_partkey — high-cardinality, never a single
    * partition. Part and supplier broadcast. MIN of raw stored doubles
    * (no sum) is order-independent, so the equality filter is
    * engine-exact; ties keep every achieving supplier (a set, not an
    * arbitrary pick).
    */
  def cheapestSupplier(s: SparkSession, dir: String): DataFrame = {
    val byPart = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("minp"))
      .withColumn("best_price", min(col("minp")).over(byPart))
      .filter(col("minp") === col("best_price"))
      .join(broadcast(Tables.part(s, dir).filter(col("p_size") <= 5)
        .select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("p_partkey", "p_brand", "s_suppkey", "s_name", "best_price")
  }

  /** TPC-H Q15-shaped "top supplier by revenue" — the global-max scalar
    * silhouette: per-supplier DECIMAL revenue over a ship quarter, then
    * the suppliers whose revenue EQUALS the 1-row max (broadcast; a
    * scalar subquery is a broadcast nested-loop of a 1-row relation —
    * never a sort). The equality is exact because both sides are the
    * same DECIMAL aggregate; ties all surface.
    */
  def topSupplierRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val dt = li.schema("l_shipdate").dataType
    val rev = li
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(dt) &&
        col("l_shipdate") < lit("1996-04-01").cast(dt))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)")))
        .as("r"))
    val mx = rev.agg(max(col("r")).as("mr"))
    rev.crossJoin(broadcast(mx)).filter(col("r") === col("mr"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("r").cast("double").as("total_revenue"))
  }

  /** TPC-H Q14-shaped "promo revenue share" — the conditional-aggregate
    * ratio silhouette: one scan month, one broadcast part join, both
    * branch sums in DECIMAL, and the percentage as a SINGLE double
    * division of two exact values (the ratio device every CTR query here
    * uses — a ratio of float sums would depend on reduction order).
    */
  def promoRevenueShare(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val dt = li.schema("l_shipdate").dataType
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast(dt) &&
        col("l_shipdate") < lit("1996-02-01").cast(dt))
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(rev).cast("double")).as("promo_pct"))
  }

  /** TPC-H Q16-shaped "supplier counts per part class" — the anti-join +
    * multi-key count-distinct silhouette: the observed (part, supplier)
    * relation deduped FIRST (one shuffle on the pair key collapses the
    * fact table to its distinct pairs before anything joins), negative-
    * balance suppliers removed by a broadcast anti join, then
    * count-distinct suppliers per (brand, type, size). The size filter
    * prunes through the broadcast part join.
    */
  def supplierCountsByPart(s: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val bad = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    ps.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_size").isin(1, 14, 23, 45, 9, 19, 36, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q19-shaped "bracketed disjunction revenue" — the disjunctive-
    * predicate join silhouette: three (brand, size, quantity) brackets
    * OR'd together over the lineitem-part equi join. The equi key still
    * drives the join (the disjunction is a residual filter, not a
    * cartesian); the part side broadcasts pre-filtered to the union of
    * bracket brands, so the scan-side pruning survives the OR.
    */
  def bracketRevenue(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .select("p_partkey", "p_brand", "p_size")
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 40)))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(5,4)") -
            col("l_discount").cast("decimal(5,4)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q21-shaped "sole-fault supplier" — the EXISTS + NOT EXISTS
    * composition, rewritten the way a 100 TB plan wants it: instead of
    * two correlated self-joins of the fact table (the literal form the
    * oracle runs), ONE aggregate per order computes the distinct
    * supplier count and the distinct RETURNED-supplier count, and the
    * returned lines join that bounded per-order relation once —
    * `n_supp > 1` IS the EXISTS (another supplier in the order) and
    * `n_fault_supp = 1` IS the NOT EXISTS (no OTHER supplier returned:
    * the returned line's own supplier is in the fault set, so sole
    * membership means exactly it). Two shuffles on one key replace
    * three. Provably equivalent; the DuckDB twin keeps the textbook
    * correlated form precisely so the gate checks the rewrite.
    */
  def soleFaultSuppliers(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val perOrder = li.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_fault_supp"))
    li.filter(col("l_returnflag") === "R")
      .join(perOrder, col("l_orderkey") === col("ok"))
      .filter(col("n_supp") > 1 && col("n_fault_supp") === 1)
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
  }

  /** TPC-H Q11-shaped "important parts" — the group-share-vs-global
    * silhouette: per-part DECIMAL value from the fact table, kept where
    * `value > 4/3 × mean` — written division-free as
    * `3·value·n_parts > 4·total` (all-exact DECIMAL/integer products;
    * a mean with division would put a float on the comparison path).
    * The (total, n) pair is a broadcast 1-row aggregate; the threshold
    * is RELATIVE to the mean, so the predicate is scale-invariant —
    * a fixed `value > total/K` floor silently empties or floods as the
    * corpus grows. Values are re-bounded into DECIMAL(18,2) before the
    * products so the multiply stays inside Spark's 38-digit exactness.
    */
  def importantParts(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.lineitem(s, dir).groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("val"))
    val tot = v.agg(sum(col("val")).cast("decimal(18,2)").as("t"),
      count(lit(1)).cast("decimal(10,0)").as("np"))
    v.crossJoin(broadcast(tot))
      .filter(col("val") * col("np") * lit(3) > col("t") * lit(4))
      .select(col("l_partkey"), col("val").cast("double").as("part_value"))
  }

  /** Per-brand price/size skyline (q168) — the Pareto-frontier operator
    * ([[graft.ops.Relational.skyline2D]]): parts not dominated within
    * their brand on (retail price ↓, size ↑), price in exact cents so
    * the dominance relation is rounding-free. The oracle keeps the
    * definitional quadratic NOT-EXISTS self-join; the gate proves the
    * aggregate-then-running-max linear plan equivalent. No global
    * window: the running max partitions by brand, and its input is the
    * per-(brand, price) aggregate — bounded by the price DOMAIN, not
    * the fact table.
    */
  def brandSkyline(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"),
      (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
        .as("price_cents"),
      col("p_size"))
    graft.ops.Relational.skyline2D(p, col("p_brand"), col("price_cents"),
      col("p_size"))
  }

  /** Bloom-pruned semi join (q178) — the q170 sketch used as a
    * scan-side predicate ([[graft.ops.Sketch.bloomSemiJoin]]): the
    * large-size part keys build a 2¹⁶-bit filter, the lineitem scan is
    * pruned PER ROW by k shift-and-mask bit tests against the
    * driver-collapsed word array (no shuffle, no distinct before the
    * join — the way engine-native bloom joins push the filter), and the
    * exact residual semi join removes the false positives. No false
    * negatives ⇒ the result EQUALS the plain semi join, which is
    * exactly what the oracle states (the q30/q152 shared-ground-truth
    * device applied to a join strategy).
    */
  def bloomSemiVolume(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_partkey", "l_quantity")
    val dim = Tables.part(s, dir).filter(col("p_size") >= 48)
      .select("p_partkey")
    graft.ops.Sketch.bloomSemiJoin(li, "l_partkey", dim, "p_partkey")
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
  }

  /** TPC-H Q7-shaped "volume shipping between two nations" — the
    * two-sided dimension-mapping silhouette: the SAME nation table joins
    * twice under different roles (supplier's vs customer's), the pair
    * disjunction filters AFTER both mappings, and volume groups by
    * (nation pair, ship year). Both nation joins and the supplier join
    * broadcast; orders⋈lineitem is the only data shuffle. The year
    * bucket is integer extraction, exact everywhere.
    */
  def nationVolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
    li.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("nk1"))
      .join(broadcast(n2), col("c_nationkey") === col("nk2"))
      .filter(
        (col("supp_nation") === "NATION_18" &&
          col("cust_nation") === "NATION_19") ||
        (col("supp_nation") === "NATION_19" &&
          col("cust_nation") === "NATION_18"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(5,4)") -
            col("l_discount").cast("decimal(5,4)")))
          .cast("double").as("volume"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q4-shaped "order priority checking" — the EXISTS-with-residual
    * silhouette: orders in one quarter that have at least one line shipped
    * more than 60 days after the order date (the dataset's late-shipment
    * analog of Q4's commit-vs-receipt lag), counted per priority. The
    * EXISTS is a LEFT SEMI join whose equi key (orderkey) drives the
    * shuffle and whose lag predicate rides along as the join residual —
    * exact integer epoch-millis arithmetic on both engines, never a float
    * or an interval type on the comparison path. The date filter prunes
    * the orders scan before anything joins.
    */
  def orderPriorityCheck(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val dt = o.schema("o_orderdate").dataType
    val late = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms"))
    o.filter(col("o_orderdate") >= lit("1996-01-01").cast(dt) &&
        col("o_orderdate") < lit("1996-04-01").cast(dt))
      .join(late,
        col("o_orderkey") === col("l_orderkey") &&
          col("ship_ms") -
            unix_millis(col("o_orderdate").cast("timestamp")) > 5184000000L,
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q8-shaped "national market share" — the two-branch conditional
    * ratio over the deep join silhouette: region-filtered customers' order
    * volume per order year, with the share supplied by one nation as a
    * conditional DECIMAL sum over the SAME rows (one scan, one aggregate —
    * never two query branches), and the share a SINGLE double division of
    * two exact decimals. Dimensions broadcast; the fact joins shuffle on
    * their own keys only.
    */
  def nationMarketShare(s: SparkSession, dir: String): DataFrame = {
    val one = lit(java.math.BigDecimal.ONE).cast("decimal(5,4)")
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (one - col("l_discount").cast("decimal(5,4)"))
    val custRegion = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val suppNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_5", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(rev).cast("double")).as("mkt_share"),
        sum(rev).cast("double").as("total_volume"))
  }

  /** TPC-H Q9-shaped "product type profit" — the profit-expression
    * silhouette: revenue minus a cost term per line, grouped by
    * (supplier nation, order year), over name-filtered parts. The cost
    * proxy is `5% of retail price × quantity` (this schema carries no
    * partsupp cost), kept EXACT end to end by ordering the decimal
    * products inside 38-digit precision: retail(18,2) × 0.05(4,3) first
    * (22,5), then × quantity as DECIMAL(4,0) — quantities are integral
    * and bounded, so the narrow cast is exact and the triple product
    * never overflows into rounding. Part and supplier-nation broadcast;
    * the orders join is the only wide shuffle.
    */
  def productTypeProfit(s: SparkSession, dir: String): DataFrame = {
    val one = lit(java.math.BigDecimal.ONE).cast("decimal(5,4)")
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (one - col("l_discount").cast("decimal(5,4)"))
    val cost = col("p_retailprice").cast("decimal(18,2)") *
      lit(new java.math.BigDecimal("0.05")).cast("decimal(4,3)") *
      col("l_quantity").cast("decimal(4,0)")
    val suppNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("snk"), col("n_name"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "n_name")
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_name").contains("gear"))
        .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(rev - cost).cast("double").as("profit"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q10-shaped "returned item reporting" — the top-N-customers
    * silhouette: revenue lost to returned lines over one quarter of
    * orders, per customer, top 20 by (revenue desc, custkey). The return
    * flag prunes the fact scan, the date filter prunes orders BEFORE the
    * join, the nation name broadcasts, and the limit lowers to
    * TakeOrderedAndProject on the exact-DECIMAL revenue (engine-identical
    * float, fully deterministic tie-break).
    */
  def returnedItemReport(s: SparkSession, dir: String): DataFrame = {
    val one = lit(java.math.BigDecimal.ONE).cast("decimal(5,4)")
    val o = Tables.orders(s, dir)
    val dt = o.schema("o_orderdate").dataType
    Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .join(o.filter(col("o_orderdate") >= lit("1996-01-01").cast(dt) &&
          col("o_orderdate") < lit("1996-04-01").cast(dt)),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (one - col("l_discount").cast("decimal(5,4)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12-shaped "shipping priority classes" — the conditional
    * class-count silhouette: lines shipped in one year, grouped by line
    * status (the schema's shipmode analog), counting high-priority
    * (URGENT/HIGH) vs low-priority orders as two conditional sums over
    * one orders join. The year filter prunes the fact scan; both counts
    * are exact integers.
    */
  def priorityShipClasses(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val dt = li.schema("l_shipdate").dataType
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast(dt) &&
        col("l_shipdate") < lit("1997-01-01").cast(dt))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q20-shaped "promotable suppliers" — the nested-IN silhouette:
    * suppliers who shipped more than an eighth of some red-part's total
    * quantity. The doubly nested subquery decorrelates to ONE pair
    * aggregate (quantity per (part, supplier), map-side combined from a
    * single fact scan) with the per-part total as a WINDOW over that
    * bounded pair relation — the q141 device: the agg-join-back form
    * would scan the fact table twice. The share predicate is
    * division-free exact DECIMAL (`8·q_pair > q_part`), the part name
    * filter broadcasts, and the final supplier join broadcasts against
    * the distinct qualifying keys.
    *
    * The red-part key join sits BELOW the pair aggregate: the name
    * filter is on the window's own partition key (`l_partkey`), so
    * pruning the fact scan first is semantics-preserving — the per-part
    * total over the pruned rows equals the total over all rows for
    * every surviving part — and removes ~24/25 of the aggregate+window
    * work (only ~1/25 of part names start with "red").
    */
  def promotableSuppliers(s: SparkSession, dir: String): DataFrame = {
    val byPart = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_name").startsWith("red"))
        .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("sqty"))
      .withColumn("tqty",
        sum(col("sqty")).over(byPart).cast("decimal(18,2)"))
      .filter(col("sqty") * lit(8) > col("tqty"))
      .select(col("l_suppkey")).distinct()
      .join(broadcast(Tables.supplier(s, dir)
        .select("s_suppkey", "s_name", "s_acctbal")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
  }

  /** A3 count-distinct (the reference's double-groupBy UV pattern,
    * `OfflineJob.java:267-272,304-307`). */
  def countDistinctUv(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("uv"), count(lit(1)).as("pv"))

  /** A7a/b pivot via conditional aggregation + CTR with the reference's
    * Double.MAX_VALUE zero-show sentinel (`OfflineDataSetUtils.java:296-304`)
    * and P2 JSON field extraction. */
  def pivotCtr(s: SparkSession, dir: String): DataFrame =
    OfflineMetrics.actionLog(Tables.events(s, dir))
      .groupBy("scene")
      .agg(
        sum(when(col("action") === "view", 1L).otherwise(0L)).as("views"),
        sum(when(col("action") === "click", 1L).otherwise(0L)).as("clicks"),
        sum(when(col("action") === "purchase", 1L).otherwise(0L)).as("purchases"),
        sum(when(col("action") === "signup", 1L).otherwise(0L)).as("signups"),
        sum(when(col("action") === "error", 1L).otherwise(0L)).as("errors"))
      .withColumn("ctr",
        when(col("views") === 0, lit(Double.MaxValue))
          .otherwise(col("clicks").cast("double") / col("views")))

  /** A8 HAVING-style arithmetic OR predicate over a full-outer join with the
    * reference's NULL semantics kept (`OfflineJob.java:386-392`). */
  def havingAbnormal(s: SparkSession, dir: String): DataFrame =
    OfflineMetrics.ctrAbnormal(
      OfflineMetrics.actionLog(Tables.events(s, dir)), "user_id")

  /** J2 chained equi-joins through broadcast-able dims (revenue roll-up;
    * `ItemIdCfVersion5.java:199-204` chained joins). */
  def joinChain(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  /** J3/J4 full outer join with null-tolerant merge to a concat string
    * (`OfflineJob.java:386-387`; `AucCalcVersion5.java:491-514`). */
  def joinFullOuter(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(count(lit(1)).as("views"))
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("purchases"))
    v.join(p, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        concat_ws("_", coalesce(col("views"), lit(0L)),
          coalesce(col("purchases"), lit(0L))).as("views_purchases"))
  }

  /** J6 left outer join + matched flag (`PetalDataSetUtils.java:142-153`). */
  def joinLeftFlag(s: SparkSession, dir: String): DataFrame = {
    val used = Tables.lineitem(s, dir).select(col("l_partkey").as("pk")).distinct()
    Tables.part(s, dir)
      .join(used, col("p_partkey") === col("pk"), "left_outer")
      .select(col("p_partkey"),
        when(col("pk").isNull, 0).otherwise(1).as("used"))
  }

  /** J7 semi-join (`ItemIdCfHuabanVersion4.java:134` inner+distinct,
    * expressed as the idiomatic left_semi). */
  def semiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")

  /** J8 anti-join via the reference's verbatim `NOT IN (SELECT concat(...))`
    * SQL (`AucCalcSecond.java:263-266`), run through spark.sql — Catalyst's
    * RewritePredicateSubquery turns it into the same left-anti join we'd
    * write by hand. */
  def antiJoinSql(s: SparkSession, dir: String): DataFrame = {
    OfflineMetrics.actionLog(Tables.events(s, dir))
      .createOrReplaceTempView("g_actionlog")
    s.sql(
      """SELECT user_id, item FROM g_actionlog
        |WHERE action = 'view' AND concat(user_id, '_', item) NOT IN
        |  (SELECT concat(user_id, '_', item) FROM g_actionlog
        |   WHERE action = 'click')""".stripMargin)
      .distinct()
  }

  /** U1 union of heterogeneous metric streams (`OfflineJob.java:489-496`),
    * normalized through [[graft.ops.Relational.tagMetric]]. */
  def unionMetrics(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Relational.tagMetric
    val ev = Tables.events(s, dir)
    val scene = pmod(col("user_id"), lit(5))
    val pv = tagMetric(ev.groupBy(scene.as("scene"))
      .agg(count(lit(1)).as("v")), col("scene"), "pv", col("v"))
    val uv = tagMetric(ev.groupBy(scene.as("scene"))
      .agg(countDistinct(col("user_id")).as("v")), col("scene"), "uv", col("v"))
    val err = tagMetric(ev.filter(col("event_type") === "error")
      .groupBy(scene.as("scene"))
      .agg(count(lit(1)).as("v")), col("scene"), "errors", col("v"))
    pv.unionByName(uv).unionByName(err)
      .select(col("key").as("scene"), col("metric"), col("value"))
  }

  /** U2 minus/EXCEPT (`CheckValues.java:54`). */
  def exceptUnused(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(col("p_partkey").as("k"))
      .except(Tables.lineitem(s, dir).select(col("l_partkey").as("k")))

  /** P4 full-row distinct (`ItemIdCfVersion5.java:143`). */
  def distinctPairs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select("user_id", "event_type").distinct()

  /** S1/P2/A1 word count — the canonical text-scan pipeline
    * (`flink-base/.../wc/WorldCount.scala:17-21`). */
  def wordCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** §7 offline dashboard pivot: the six per-scene ratios of
    * `OfflineJob.java:396-523` (see [[graft.jobs.OfflineMetrics]]). */
  def offlineMetrics(s: SparkSession, dir: String): DataFrame =
    OfflineMetrics.metricsWide(Tables.events(s, dir))

  /** A3 faithful two-phase count-distinct plan
    * (`OfflineJob.java:267-272`): inner distinct shuffles on (key, value),
    * outer count shuffles on key — no reducer ever holds a hot key's full
    * value set. */
  def countDistinctTwoPhase(s: SparkSession, dir: String): DataFrame =
    graft.ops.Relational.countDistinctTwoPhase(Tables.events(s, dir),
      col("event_type"), col("user_id"), as = "uv")
      .withColumnRenamed("key", "event_type")

  /** The reference's faithful long metric-stream shape: (scene, metric,
    * value) union of the six ratio streams (`OfflineJob.java:489-496`),
    * ready for the pivot-to-6-slot row. */
  def offlineMetricsLong(s: SparkSession, dir: String): DataFrame =
    OfflineMetrics.metricsLong(Tables.events(s, dir))

  /** As-of join (beyond-reference extension): for every click event, the
    * most recent view `value` at or before its timestamp per user —
    * [[graft.ops.AsOf.joinAsOf]]'s single-shuffle tagged-union form,
    * oracle-checked against DuckDB's native ASOF LEFT JOIN. The view side
    * is pre-aggregated to one row per (user, ts) so the as-of winner is
    * well-defined in both engines.
    */
  def asofClickView(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("value").as("last_view_value"))
    graft.ops.AsOf.joinAsOf(clicks, views, Seq("user_id"), "ts", "ts",
        Seq("last_view_value"))
      .select("event_id", "user_id", "last_view_value")
  }

  /** Nearest-event join (q179) — the bidirectional as-of
    * ([[graft.ops.AsOf.joinNearest]]): each click paired with the same
    * user's temporally CLOSEST view (either direction, equal distance →
    * the backward one). Join-free: one user-key shuffle, one sort, the
    * backward/forward candidates carried by two frame windows and one
    * comparison — where the definitional form (the oracle keeps it) is
    * a per-user cross product ranked by |Δt|. Views are pre-aggregated
    * unique per (user, ms) with min(event_id) so the match is
    * deterministic.
    */
  def nearestClickView(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_millis(col("ts")).as("ctsm"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_millis(col("ts")).as("vtsm"),
        col("event_id"))
      .groupBy(col("user_id"), col("vtsm"))
      .agg(min(col("event_id")).as("view_id"))
    graft.ops.AsOf.joinNearest(clicks, views, Seq("user_id"),
        "ctsm", "vtsm", Seq("view_id", "vtsm"))
      .select(col("click_id"), col("user_id"), col("ctsm"),
        col("view_id"), col("vtsm"),
        (col("vtsm") - col("ctsm")).as("delta_ms"))
  }

  /** Interval join (beyond-reference extension, Flink's `intervalJoin`
    * shape): every (click, view) pair of the same user with the view in
    * the 5 minutes at-or-before the click — bucketed time join, see
    * [[graft.ops.RangeJoin.intervalJoin]].
    */
  def intervalClickView(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("vts"))
    graft.ops.RangeJoin.intervalJoin(clicks, views, Seq("user_id"),
        "cts", "vts", lowerMs = -300000L, upperMs = 0L)
      .select("click_id", "view_id", "user_id")
  }

  /** Exact interpolated percentiles per event_type (beyond-reference
    * extension): p50/p95/p99 of `value`. Exact `percentile` is the oracle
    * target; `approx_percentile` is the mergeable 100 TB path (equivalence
    * within tolerance pinned in OperatorSpec). Interpolation arithmetic
    * differs in evaluation order between engines → rounded to 6.
    */
  def valuePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        round(percentile(col("value"), lit(0.5)), 6).as("p50"),
        round(percentile(col("value"), lit(0.95)), 6).as("p95"),
        round(percentile(col("value"), lit(0.99)), 6).as("p99"))

  /** Global top-100 events by (value desc, event_id) — SURVEY §2.7's
    * global ORDER BY / LIMIT cell (the reference has no global sort; Spark
    * gets it free, and THIS is the shape to insist on): `orderBy.limit`
    * lowers to TakeOrderedAndProject — per-partition bounded top-k heaps
    * merged on the driver — NOT a full Sort through a single-partition
    * Exchange, the classic 100× scale trap. PlanSpec locks the shape.
    * The tie-break on event_id makes the row SET deterministic at the
    * value boundary on both engines. */
  def topEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select("event_id", "event_type", "value")
      .orderBy(col("value").desc, col("event_id"))
      .limit(100)

  /** Market-basket association rules over order baskets (q193) — the
    * frequent-itemset family: for the top-20 co-purchased part pairs
    * (support desc, then the deterministic (a, b) key), exact support
    * counts plus confidence and lift in exact integer ppm —
    * `conf(a→b) = sup_ab·10⁶ div sup_a`,
    * `lift = sup_ab·n·10⁶ div (sup_a·sup_b)` — no float ratio to drift.
    *
    * 100 TB posture: the pair enumeration is per-basket quadratic but
    * baskets are order-sized (≤ 7 lineitems in this schema — bounded by
    * the DOMAIN, not the corpus), so the self-join on the order key is
    * linear in lineitems; supports are map-side-combined counts joined
    * back by broadcast; top-20 lowers to TakeOrderedAndProject. A
    * retail-scale basket cap would salt/limit oversized baskets the way
    * ItemCf caps hot users — same device, documented there.
    */
  def associationRules(s: SparkSession, dir: String): DataFrame = {
    val bp = graft.core.CacheScope.track(
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct().persist())
    // one eager job instead of two (r18): the count_distinct both fills
    // the persist and returns the basket count the lift needs — the old
    // separate bp.count() + distinct().count() paid a second full pass
    val n = bp.agg(count_distinct(col("o"))).head().getLong(0)
    val sup = bp.groupBy(col("p")).agg(count(lit(1)).as("sup"))
    // r18: pair enumeration via ONE per-basket aggregate + in-row pair
    // expansion instead of the o-keyed self-join — the join shuffled the
    // basket relation twice more and re-filtered a < b row by row; here
    // the sorted basket array emits each (a < b) pair exactly once and
    // the only new exchange is the bounded pair aggregate. Basket size
    // is domain-bounded (≤ 7 lineitems), so the in-row expansion is O(1)
    // per row (the ItemCf a<b device applied to baskets).
    val pairs = bp.groupBy(col("o"))
      .agg(sort_array(collect_list(col("p"))).as("__ps"))
      .select(explode(expr(
        "flatten(transform(__ps, (x, i) -> " +
          "transform(slice(__ps, i + 2, size(__ps)), " +
          "y -> named_struct('a', x, 'b', y))))")).as("__ab"))
      .select(col("__ab.a").as("a"), col("__ab.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("sup_ab"))
    pairs
      .join(broadcast(sup.select(col("p").as("a"), col("sup").as("sup_a"))),
        Seq("a"))
      .join(broadcast(sup.select(col("p").as("b"), col("sup").as("sup_b"))),
        Seq("b"))
      .select(col("a"), col("b"), col("sup_ab"), col("sup_a"),
        col("sup_b"), lit(n).as("n_baskets"),
        expr("sup_ab * 1000000 div sup_a").as("conf_ab_ppm"),
        (col("sup_ab") * lit(n) * lit(1000000L)).as("__ln"))
      .withColumn("lift_ppm", expr("__ln div (sup_a * sup_b)"))
      .drop("__ln")
      .orderBy(col("sup_ab").desc, col("a"), col("b"))
      .limit(20)
  }

  /** Benford first-digit audit of order totals (q197) — the classic
    * fabricated-data screen: the leading digit of each order's exact
    * cents value, counted and shared in exact integer ppm against the
    * corpus, ready to compare with the Benford expectation
    * (log10(1+1/d) — the comparison is the analyst's; the relation
    * keeps every number exact). Digit extraction is the first character
    * of the decimal rendering of a POSITIVE BIGINT — identical in both
    * engines, no float log anywhere. One map-side-combined aggregate
    * plus a 1-row broadcast total.
    */
  def benfordDigits(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(s, dir)
      .select(substring((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
    val tot = d.agg(sum(col("n_orders")).as("__t"))
    d.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_orders"),
        expr("(n_orders * 1000000) div __t").as("share_ppm"))
  }

  /** Referential-integrity orphan audit (q213) — the first data-quality
    * gate a 100 TB lake runs after every load: for each child→parent
    * foreign key, how many child rows reference a missing parent.
    *
    * Single-pass layout: the fact table is scanned ONCE and all three
    * of its foreign keys check in that pass — three LEFT joins against
    * the distinct parent keys tagged with a presence flag, then one
    * aggregate of missing-flag counters (a membership probe, never a
    * row product; the dimension key sets broadcast, the orders join
    * shuffles on its key). The naive per-relation anti-join form costs
    * three fact scans and three shuffles — at 100 TB that is the whole
    * audit's budget. The counters row then explodes into the
    * per-relation rows; orders→customer is one more narrow pass over
    * the (much smaller) orders table. Exact integers, integer-`div`
    * ppm.
    */
  def referentialOrphans(s: SparkSession, dir: String): DataFrame = {
    def flag(parent: DataFrame, key: String): DataFrame =
      parent.select(col(key)).distinct().withColumn(s"__has_$key", lit(1L))
    val liCounts = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .join(flag(Tables.orders(s, dir), "o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left")
      .join(broadcast(flag(Tables.part(s, dir), "p_partkey")),
        col("l_partkey") === col("p_partkey"), "left")
      .join(broadcast(flag(Tables.supplier(s, dir), "s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left")
      .agg(count(lit(1)).as("n_li"),
        sum(when(col("__has_o_orderkey").isNull, 1L).otherwise(0L))
          .as("__orph_o"),
        sum(when(col("__has_p_partkey").isNull, 1L).otherwise(0L))
          .as("__orph_p"),
        sum(when(col("__has_s_suppkey").isNull, 1L).otherwise(0L))
          .as("__orph_s"))
    val ordCounts = Tables.orders(s, dir)
      .join(broadcast(flag(Tables.customer(s, dir), "c_custkey")),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n_ord"),
        sum(when(col("__has_c_custkey").isNull, 1L).otherwise(0L))
          .as("__orph_c"))
    liCounts.crossJoin(ordCounts)
      .select(explode(array(
        struct(lit("lineitem->orders").as("relation"),
          col("n_li").as("n_child"), col("__orph_o").as("n_orphans")),
        struct(lit("lineitem->part").as("relation"),
          col("n_li").as("n_child"), col("__orph_p").as("n_orphans")),
        struct(lit("lineitem->supplier").as("relation"),
          col("n_li").as("n_child"), col("__orph_s").as("n_orphans")),
        struct(lit("orders->customer").as("relation"),
          col("n_ord").as("n_child"), col("__orph_c").as("n_orphans"))))
        .as("__r"))
      .select(col("__r.relation").as("relation"),
        col("__r.n_child").as("n_child"),
        col("__r.n_orphans").as("n_orphans"),
        expr("(__r.n_orphans * 1000000) div nullif(__r.n_child, 0)")
          .as("orphan_ppm"))
  }

  /** Order-total consistency audit (q214) — does the order header's
    * `o_totalprice` equal the sum of its lineitems' charges
    * (`extendedprice · (1−discount) · (1+tax)`)? Everything runs at
    * scale-10 integer units: the DECIMAL product of scale 2+4+4 has at
    * most 10 fractional digits, so `charge · 10^10` is an INTEGRAL
    * decimal on both engines and the BIGINT cast is exact — no
    * float rounding, no half-up-vs-truncate divergence. One order-keyed
    * aggregate + one key join; the summary is exact match/mismatch
    * counts and the worst absolute gap.
    */
  def orderTotalConsistency(s: SparkSession, dir: String): DataFrame = {
    val e10 = "10000000000"
    val charge = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(5,4)") -
            col("l_discount").cast("decimal(5,4)")) *
          (lit(1).cast("decimal(5,4)") +
            col("l_tax").cast("decimal(5,4)"))).as("__charge"))
      .groupBy(col("l_orderkey"))
      .agg(expr(s"cast(sum(__charge) * $e10 as bigint)").as("charge_e10"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        expr(s"cast(cast(o_totalprice as decimal(18,2)) * $e10 " +
          "as bigint)").as("total_e10"))
      .join(charge, col("o_orderkey") === col("l_orderkey"), "left")
      .select((col("total_e10") - coalesce(col("charge_e10"), lit(0L)))
        .as("__diff"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("__diff") === 0L, 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("__diff") =!= 0L, 1L).otherwise(0L)).as("n_mismatch"),
        max(abs(col("__diff"))).as("max_abs_diff_e10"))
  }

  /** Join pre-flight cardinality audit (q218) — predict a join's output
    * size BEFORE running it, from per-key counts alone: for an
    * equi-join, `|A ⋈ B| = Σ_k c_A(k)·c_B(k)` exactly. At 100 TB this
    * one cheap aggregate pass is the difference between noticing a
    * quadratic blowup in a dashboard and discovering it as a dead
    * executor: the audit costs two key-count aggregates (map-side
    * combined) and a key join of the two count relations — the fact
    * rows themselves never join. Two joins the suite actually runs are
    * audited: the co-click SELF-join behind the q159/q163/q164 graph
    * substrate (predicted pairs = Σ c·(c−1), both directions, no
    * self-pairs) and the lineitem⋈orders key join. `amp_ppm` is
    * predicted-output-per-larger-input in exact integer ppm — the
    * blowup factor.
    */
  def joinPreflight(s: SparkSession, dir: String): DataFrame = {
    val clicks = Tables.events(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull).distinct()
    val cc = clicks.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_left"), sum(col("c")).as("n_right"),
        count(lit(1)).as("n_keys"), max(col("c")).as("max_key_left"),
        max(col("c")).as("max_key_right"),
        sum(col("c") * (col("c") - 1)).as("predicted_rows"))
      .select(lit("coclick_self").as("join_name"), col("*"))
    val li = Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("cl"))
    val ord = Tables.orders(s, dir).groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("cr"))
    val lo = li.join(ord, col("l_orderkey") === col("o_orderkey"), "full")
      .agg(sum(coalesce(col("cl"), lit(0L))).as("n_left"),
        sum(coalesce(col("cr"), lit(0L))).as("n_right"),
        count(lit(1)).as("n_keys"),
        max(coalesce(col("cl"), lit(0L))).as("max_key_left"),
        max(coalesce(col("cr"), lit(0L))).as("max_key_right"),
        sum(coalesce(col("cl"), lit(0L)) * coalesce(col("cr"), lit(0L)))
          .as("predicted_rows"))
      .select(lit("lineitem_orders").as("join_name"), col("*"))
    cc.unionByName(lo)
      .withColumn("amp_ppm",
        expr("(predicted_rows * 1000000) div " +
          "nullif(greatest(n_left, n_right), 0)"))
  }

  /** Equi-depth histogram of order totals (q219) — the engine-statistics
    * summary an optimizer sizes predicates with, built the scale-correct
    * way: exact cents rank through the two-phase
    * [[graft.ops.Scale.groupedRankOrdered]] (no single-task global
    * window), bucket by the q211 floor formula `((rn−1)·B) div n`
    * (depths balanced within one, never NTILE), then per-bucket
    * count/min/max. Eight buckets over the exact DECIMAL-cents
    * rendering — edges are data values, not float interpolations.
    */
  def equiDepthHistogram(s: SparkSession, dir: String): DataFrame = {
    val B = 8
    val cents = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    val withN = graft.core.CacheScope.track(cents.persist())
    val n = withN.count()
    graft.ops.Scale.groupedRankOrdered(withN, Seq.empty,
        Seq("cents", "o_orderkey"), "__rn")
      .withColumn("bucket", expr(s"((__rn - 1) * $B) div ${n}L"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("cents")).as("lo_cents"),
        max(col("cents")).as("hi_cents"))
  }

  val queries: Map[String, Q] = Map(
    "q218_join_preflight" -> joinPreflight,
    "q219_equidepth_hist" -> equiDepthHistogram,
    "q213_referential_orphans" -> referentialOrphans,
    "q214_order_consistency" -> orderTotalConsistency,
    "q197_benford" -> benfordDigits,
    "q193_association_rules" -> associationRules,
    "q60_top_events" -> topEvents,
    "q48_percentiles" -> valuePercentiles,
    "q47_interval_join" -> intervalClickView,
    "q46_asof_join" -> asofClickView,
    "q41_offline_metrics_long" -> offlineMetricsLong,
    "q39_count_distinct_2phase" -> countDistinctTwoPhase,
    "q01_agg_sum" -> aggSum,
    "q128_local_supplier_volume" -> localSupplierVolume,
    "q129_shipping_priority" -> shippingPriority,
    "q130_forecast_revenue" -> forecastRevenue,
    "q131_small_qty_revenue" -> smallQtyRevenue,
    "q132_large_volume_customers" -> largeVolumeCustomers,
    "q133_order_count_distribution" -> orderCountDistribution,
    "q134_idle_rich_customers" -> idleRichCustomers,
    "q141_cheapest_supplier" -> cheapestSupplier,
    "q142_top_supplier" -> topSupplierRevenue,
    "q143_promo_share" -> promoRevenueShare,
    "q144_supplier_part_counts" -> supplierCountsByPart,
    "q145_bracket_revenue" -> bracketRevenue,
    "q146_sole_fault_supplier" -> soleFaultSuppliers,
    "q147_important_parts" -> importantParts,
    "q148_nation_volume" -> nationVolumeShipping,
    "q153_order_priority" -> orderPriorityCheck,
    "q154_market_share" -> nationMarketShare,
    "q155_product_profit" -> productTypeProfit,
    "q156_returned_items" -> returnedItemReport,
    "q157_ship_classes" -> priorityShipClasses,
    "q158_promotable_suppliers" -> promotableSuppliers,
    "q168_brand_skyline" -> brandSkyline,
    "q178_bloom_semi_join" -> bloomSemiVolume,
    "q179_nearest_event" -> nearestClickView,
    "q02_count_distinct" -> countDistinctUv,
    "q03_pivot_ctr" -> pivotCtr,
    "q04_having_abnormal" -> havingAbnormal,
    "q05_join_chain" -> joinChain,
    "q06_join_full_outer" -> joinFullOuter,
    "q07_join_left_flag" -> joinLeftFlag,
    "q08_semi_join" -> semiJoin,
    "q09_anti_join_sql" -> antiJoinSql,
    "q10_union_metrics" -> unionMetrics,
    "q11_except" -> exceptUnused,
    "q12_distinct" -> distinctPairs,
    "q13_word_count" -> wordCount,
    "q14_offline_metrics" -> offlineMetrics)

  private val sceneExpr = "user_id % 5"
  private val itemExpr =
    "CAST(regexp_extract(props, '\"k\": (-?\\d+)', 1) AS BIGINT)"

  private val longMetricNames = Seq("transfor_error_ratio",
    "abnormal_user_ratio", "abnormal_user_click_ratio",
    "abnormal_item_ratio", "abnormal_item_click_ratio",
    "user_fluctuate_ratio")

  val oracles: Map[String, String] = Map(
    // q218: |A join B| = sum over keys of c_A*c_B, exactly
    "q218_join_preflight" ->
      """WITH cl AS (SELECT DISTINCT user_id,
        |      CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)
        |        AS item
        |    FROM events WHERE event_type = 'click'
        |      AND regexp_extract(props, '"k": (-?\d+)', 1) <> ''),
        |uc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        |    FROM cl GROUP BY 1),
        |cc AS (SELECT 'coclick_self' AS join_name,
        |    CAST(SUM(c) AS BIGINT) AS n_left,
        |    CAST(SUM(c) AS BIGINT) AS n_right,
        |    CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(MAX(c) AS BIGINT) AS max_key_left,
        |    CAST(MAX(c) AS BIGINT) AS max_key_right,
        |    CAST(SUM(c * (c - 1)) AS BIGINT) AS predicted_rows
        |  FROM uc),
        |lc AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c2
        |    FROM lineitem GROUP BY 1),
        |oc AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cr
        |    FROM orders GROUP BY 1),
        |lo AS (SELECT 'lineitem_orders' AS join_name,
        |    CAST(SUM(COALESCE(c2, 0)) AS BIGINT) AS n_left,
        |    CAST(SUM(COALESCE(cr, 0)) AS BIGINT) AS n_right,
        |    CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(MAX(COALESCE(c2, 0)) AS BIGINT) AS max_key_left,
        |    CAST(MAX(COALESCE(cr, 0)) AS BIGINT) AS max_key_right,
        |    CAST(SUM(COALESCE(c2, 0) * COALESCE(cr, 0)) AS BIGINT)
        |      AS predicted_rows
        |  FROM lc FULL OUTER JOIN oc USING (k)),
        |u AS (SELECT * FROM cc UNION ALL SELECT * FROM lo)
        |SELECT join_name, n_left, n_right, n_keys, max_key_left,
        |  max_key_right, predicted_rows,
        |  (predicted_rows * 1000000) //
        |    NULLIF(GREATEST(n_left, n_right), 0) AS amp_ppm
        |FROM u""".stripMargin,
    // q219: same rank + q211 floor bucket; edges are data values
    "q219_equidepth_hist" ->
      """WITH c AS (SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents FROM orders),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
        |r AS (SELECT cents,
        |    ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rn FROM c)
        |SELECT ((rn - 1) * 8) // n AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
        |FROM r CROSS JOIN n GROUP BY 1""".stripMargin,
    // q213: one NOT-IN-style anti per foreign key, scalar-count rows
    "q213_referential_orphans" ->
      """SELECT 'lineitem->orders' AS relation,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey))
        |    AS n_orphans,
        |  ((SELECT COUNT(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey))
        |   * 1000000) // NULLIF((SELECT COUNT(*) FROM lineitem), 0)
        |    AS orphan_ppm
        |UNION ALL SELECT 'lineitem->part',
        |  (SELECT COUNT(*) FROM lineitem),
        |  (SELECT COUNT(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM part p
        |                       WHERE p.p_partkey = l.l_partkey)),
        |  ((SELECT COUNT(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM part p
        |                       WHERE p.p_partkey = l.l_partkey))
        |   * 1000000) // NULLIF((SELECT COUNT(*) FROM lineitem), 0)
        |UNION ALL SELECT 'lineitem->supplier',
        |  (SELECT COUNT(*) FROM lineitem),
        |  (SELECT COUNT(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM supplier sp
        |                       WHERE sp.s_suppkey = l.l_suppkey)),
        |  ((SELECT COUNT(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM supplier sp
        |                       WHERE sp.s_suppkey = l.l_suppkey))
        |   * 1000000) // NULLIF((SELECT COUNT(*) FROM lineitem), 0)
        |UNION ALL SELECT 'orders->customer',
        |  (SELECT COUNT(*) FROM orders),
        |  (SELECT COUNT(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey)),
        |  ((SELECT COUNT(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey))
        |   * 1000000) // NULLIF((SELECT COUNT(*) FROM orders), 0)""".stripMargin,
    // q214: the scale-10 integral-decimal device — charge*10^10 is
    // integral (scale 2+4+4), so the BIGINT cast is exact, not rounded
    "q214_order_consistency" ->
      """WITH ch AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) *
        |      (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(5,4))))
        |      * 10000000000 AS BIGINT) AS charge_e10
        |  FROM lineitem GROUP BY 1),
        |d AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |      * 10000000000 AS BIGINT)
        |    - COALESCE(charge_e10, 0) AS diff
        |  FROM orders LEFT JOIN ch ON o_orderkey = l_orderkey)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN diff = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_exact,
        |  CAST(SUM(CASE WHEN diff <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mismatch,
        |  CAST(MAX(ABS(diff)) AS BIGINT) AS max_abs_diff_e10
        |FROM d""".stripMargin,
    // q197: leading digit of the exact cents rendering, exact ppm share
    "q197_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(
        |      CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |g AS (SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS tt FROM g)
        |SELECT digit, n_orders, (n_orders * 1000000) // tt AS share_ppm
        |FROM g CROSS JOIN t""".stripMargin,
    // q193: same distinct basket relation, per-basket pair join, exact
    // integer ppm ratios, deterministic (support desc, a, b) top-20
    "q193_association_rules" ->
      """WITH bp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |nb AS (SELECT COUNT(DISTINCT o) AS n FROM bp),
        |sup AS (SELECT p, COUNT(*) AS s FROM bp GROUP BY 1),
        |pr AS (SELECT a.p AS a, b.p AS b, COUNT(*) AS sup_ab
        |  FROM bp a JOIN bp b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2)
        |SELECT a, b, sup_ab, sa.s AS sup_a, sb.s AS sup_b,
        |  n AS n_baskets,
        |  (sup_ab * 1000000) // sa.s AS conf_ab_ppm,
        |  CAST((sup_ab * n * 1000000) // (sa.s * sb.s) AS BIGINT)
        |    AS lift_ppm
        |FROM pr
        |JOIN sup sa ON a = sa.p
        |JOIN sup sb ON b = sb.p
        |CROSS JOIN nb
        |ORDER BY sup_ab DESC, a, b LIMIT 20""".stripMargin,
    // raw doubles pass through unmodified from parquet (no arithmetic), so
    // the hash compare is exact; the event_id tie-break fixes the boundary
    "q60_top_events" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 100""".stripMargin,
    "q48_percentiles" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(value, 0.95), 6) AS p95,
        |  ROUND(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type""".stripMargin,
    "q47_interval_join" ->
      """SELECT l.event_id AS click_id, r.event_id AS view_id, l.user_id
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        | AND l.event_type = 'click' AND r.event_type = 'view'
        | AND r.ts BETWEEN l.ts - INTERVAL 5 MINUTE AND l.ts""".stripMargin,
    "q46_asof_join" ->
      """SELECT l.event_id, l.user_id, r.value AS last_view_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS value
        |                FROM events WHERE event_type = 'view'
        |                GROUP BY 1, 2) r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    "q41_offline_metrics_long" ->
      longMetricNames.map(n =>
        s"SELECT scene, '$n' AS metric, $n AS value FROM (\n${OfflineMetricsOracle.sql}\n) w_$n")
        .mkString("\nUNION ALL\n"),
    "q39_count_distinct_2phase" ->
      """SELECT event_type, COUNT(*) AS uv FROM
        |  (SELECT DISTINCT event_type, user_id FROM events) t
        |GROUP BY event_type""".stripMargin,
    "q01_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // q128: exact DECIMAL revenue end to end, one double cast at the end
    "q128_local_supplier_volume" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
        |    AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |              AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    // q129: segment filter pushed to the customer scan; top-10 on the
    // exact-DECIMAL revenue; order-date carried as epoch millis
    "q129_shipping_priority" ->
      """SELECT o_orderkey, epoch_ms(o_orderdate) AS o_date_ms,
        |  o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
        |    AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o_date_ms, o_orderkey LIMIT 10""".stripMargin,
    // q131: the correlated avg subquery decorrelated to an agg join; the
    // predicate is the division-free exact form (5·q·n < Σq in DECIMAL)
    "q131_small_qty_revenue" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN (SELECT l_partkey AS sp_partkey,
        |        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qsum,
        |        COUNT(*) AS qn
        |      FROM lineitem GROUP BY 1) s ON l_partkey = sp_partkey
        |WHERE p_size <= 10
        |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * qn < qsum
        |GROUP BY p_brand""".stripMargin,
    // q132: heavy orders by exact-DECIMAL quantity sum; top-100 on raw
    // stored columns (no derived floats in the ranking keys)
    "q132_large_volume_customers" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  epoch_ms(o_orderdate) AS o_date_ms, o_totalprice,
        |  CAST(qdec AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qdec
        |      FROM lineitem GROUP BY 1 HAVING qdec > 300) h
        |  ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_date_ms, o_orderkey
        |LIMIT 100""".stripMargin,
    // q133: two-level aggregate over the outer join (zero-order
    // customers count through the null key)
    "q133_order_count_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM
        |  (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |   FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |   GROUP BY 1) t
        |GROUP BY c_count""".stripMargin,
    // q134: division-free above-average predicate + recency anti join
    "q134_idle_rich_customers" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_bal
        |FROM customer c
        |JOIN (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bsum,
        |        COUNT(*) AS bn
        |      FROM customer WHERE c_acctbal > 0) s ON TRUE
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bn > bsum
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment""".stripMargin,
    // q141: min-per-group decorrelation — MIN of raw stored doubles on
    // both levels, so the (key, min) join-back equality is engine-exact
    "q141_cheapest_supplier" ->
      """WITH sp AS (SELECT l_partkey, l_suppkey,
        |              MIN(l_extendedprice) AS minp
        |            FROM lineitem GROUP BY 1, 2),
        |best AS (SELECT l_partkey AS bk, MIN(minp) AS best_price
        |         FROM sp GROUP BY 1)
        |SELECT p_partkey, p_brand, s_suppkey, s_name, best_price
        |FROM sp
        |JOIN best ON sp.l_partkey = bk AND sp.minp = best_price
        |JOIN part ON p_partkey = sp.l_partkey
        |JOIN supplier ON s_suppkey = sp.l_suppkey
        |WHERE p_size <= 5""".stripMargin,
    // q142: global-max scalar equality on the exact DECIMAL aggregate
    "q142_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(5,4)) -
        |         CAST(l_discount AS DECIMAL(5,4)))) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        |FROM rev
        |JOIN (SELECT MAX(r) AS mr FROM rev) mx ON r = mr
        |JOIN supplier ON s_suppkey = l_suppkey""".stripMargin,
    // q143: conditional DECIMAL sums, ONE double division at the end
    "q143_promo_share" ->
      """SELECT CAST(100.0 AS DOUBLE) *
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         (CAST(1 AS DECIMAL(5,4)) -
        |          CAST(l_discount AS DECIMAL(5,4)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(5,4)) -
        |        CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-02-01'""".stripMargin,
    // q144: distinct pair relation first, anti join, multi-key
    // count-distinct
    "q144_supplier_part_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_size IN (1, 14, 23, 45, 9, 19, 36, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    // q145: bracketed disjunction as a residual over the equi join
    "q145_bracket_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |     (CAST(1 AS DECIMAL(5,4)) -
        |      CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    // q146: the oracle runs the TEXTBOOK correlated EXISTS/NOT-EXISTS;
    // the Spark side runs the per-order aggregate rewrite — the gate
    // checks the equivalence proof
    "q146_sole_fault_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin,
    // q147: division-free share-vs-mean, every product exact DECIMAL
    "q147_important_parts" ->
      """WITH v AS (SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS val
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(SUM(val) AS DECIMAL(18,2)) AS t,
        |          CAST(COUNT(*) AS DECIMAL(10,0)) AS np FROM v)
        |SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
        |FROM v JOIN tot ON val * np * 3 > t * 4""".stripMargin,
    // q148: the nation table mapped twice under different roles; year
    // bucket as BIGINT on both engines
    "q148_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(5,4)) -
        |       CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE) AS volume,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
        |GROUP BY 1, 2, 3""".stripMargin,
    // q153: the EXISTS as a correlated subquery with the integer
    // epoch-millis lag predicate (5184000000 ms = 60 days)
    "q153_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND epoch_ms(l_shipdate) - epoch_ms(o_orderdate)
        |                    > 5184000000)
        |GROUP BY 1""".stripMargin,
    // q154: both branch sums exact DECIMAL over the same rows, the share
    // a single double division
    "q154_market_share" ->
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         (CAST(1 AS DECIMAL(5,4)) -
        |          CAST(l_discount AS DECIMAL(5,4)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(5,4)) -
        |        CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE) AS mkt_share,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(5,4)) -
        |        CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE)
        |    AS total_volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,
    // q155: the profit expression with the decimal products ordered to
    // stay inside 38-digit exactness (retail × 0.05 first, then × qty)
    "q155_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(5,4)) -
        |        CAST(l_discount AS DECIMAL(5,4))) -
        |       CAST(p_retailprice AS DECIMAL(18,2)) *
        |       CAST(0.05 AS DECIMAL(4,3)) *
        |       CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS profit,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2""".stripMargin,
    // q156: return-flag + quarter filters prune before the joins; top-20
    // on the exact-DECIMAL revenue with the custkey tie-break
    "q156_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(5,4)) -
        |        CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    // q157: two conditional integer class counts over one join
    "q157_ship_classes" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,
    // q158: the oracle keeps the textbook nested-IN agg-join-back form;
    // the Spark side runs the single-scan window rewrite — the gate
    // checks the equivalence
    "q158_promotable_suppliers" ->
      """WITH sq AS (SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS sqty
        |  FROM lineitem GROUP BY 1, 2),
        |pt AS (SELECT l_partkey AS pk,
        |    CAST(SUM(sqty) AS DECIMAL(18,2)) AS tqty
        |  FROM sq GROUP BY 1)
        |SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM sq
        |  JOIN pt ON l_partkey = pk
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%' AND sqty * 8 > tqty)""".stripMargin,
    // q168: the DEFINITIONAL quadratic dominance anti-join — the Spark
    // side runs the linear aggregate-then-running-max plan; the gate
    // proves the rewrite. Cents via DECIMAL on both sides (a double*100
    // cast truncates differently per engine).
    "q168_brand_skyline" ->
      """WITH p2 AS (SELECT p_partkey, p_brand,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_cents,
        |    p_size FROM part)
        |SELECT p_partkey, p_brand, price_cents, p_size FROM p2 p
        |WHERE NOT EXISTS (SELECT 1 FROM p2 q
        |  WHERE q.p_brand = p.p_brand
        |    AND q.price_cents <= p.price_cents AND q.p_size >= p.p_size
        |    AND (q.price_cents < p.price_cents OR q.p_size > p.p_size))""".stripMargin,
    // q179: the DEFINITIONAL per-user cross product ranked by
    // (|dt|, backward-first) — the merge-scan two-window plan must
    // reproduce it exactly
    "q179_nearest_event" ->
      """WITH c AS (SELECT event_id AS click_id, user_id,
        |    epoch_ms(ts) AS ctsm FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, epoch_ms(ts) AS vtsm,
        |    MIN(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |j AS (SELECT c.click_id, c.user_id, c.ctsm, v.view_id, v.vtsm,
        |    ROW_NUMBER() OVER (PARTITION BY c.click_id
        |      ORDER BY ABS(v.vtsm - c.ctsm),
        |        CASE WHEN v.vtsm <= c.ctsm THEN 0 ELSE 1 END) AS rn
        |  FROM c LEFT JOIN v USING (user_id))
        |SELECT click_id, user_id, ctsm, view_id, vtsm,
        |  vtsm - ctsm AS delta_ms
        |FROM j WHERE rn = 1""".stripMargin,
    // q178: the PLAIN semi join is the oracle — bloom pruning plus the
    // exact residual must reproduce it row for row (no-false-negative
    // lemma checked on real data)
    "q178_bloom_semi_join" ->
      """SELECT l_partkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 48)
        |GROUP BY 1""".stripMargin,
    // q130: all three predicates prune the scan; exact-DECIMAL sum
    "q130_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       CAST(l_discount AS DECIMAL(5,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04
        |  AND l_quantity < 24""".stripMargin,
    "q02_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS uv, COUNT(*) AS pv
        |FROM events GROUP BY event_type""".stripMargin,
    "q03_pivot_ctr" ->
      s"""SELECT $sceneExpr AS scene,
        |  CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
        |  CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
        |  CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        |  CASE WHEN SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) = 0
        |       THEN 1.7976931348623157e308
        |       ELSE CAST(CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
        |            / SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) END AS ctr
        |FROM events GROUP BY 1""".stripMargin,
    "q04_having_abnormal" ->
      s"""WITH sh AS (SELECT $sceneExpr AS scene, user_id, COUNT(*) AS c
        |           FROM events WHERE event_type='view' GROUP BY 1, 2),
        |     dt AS (SELECT $sceneExpr AS scene, user_id, COUNT(*) AS c
        |           FROM events WHERE event_type='click' GROUP BY 1, 2),
        |     j AS (SELECT COALESCE(sh.scene, dt.scene) AS scene,
        |                  sh.c AS show_count, dt.c AS detail_count
        |           FROM sh FULL OUTER JOIN dt
        |             ON sh.scene = dt.scene AND sh.user_id = dt.user_id)
        |SELECT scene, COUNT(*) AS abnormal_count, CAST(SUM(detail_count) AS BIGINT) AS detail_sum
        |FROM j
        |WHERE (show_count = 0 AND detail_count > 0)
        |   OR CAST(detail_count AS DOUBLE) / show_count > 0.2
        |GROUP BY scene""".stripMargin,
    "q05_join_chain" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
        |       AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q06_join_full_outer" ->
      """WITH v AS (SELECT user_id, COUNT(*) AS views FROM events
        |           WHERE event_type='view' GROUP BY user_id),
        |     p AS (SELECT user_id, COUNT(*) AS purchases FROM events
        |           WHERE event_type='purchase' GROUP BY user_id)
        |SELECT COALESCE(v.user_id, p.user_id) AS user_id,
        |  CAST(COALESCE(views, 0) AS VARCHAR) || '_' ||
        |  CAST(COALESCE(purchases, 0) AS VARCHAR) AS views_purchases
        |FROM v FULL OUTER JOIN p ON v.user_id = p.user_id""".stripMargin,
    "q07_join_left_flag" ->
      """SELECT p_partkey,
        |  CASE WHEN pk IS NULL THEN 0 ELSE 1 END AS used
        |FROM part LEFT JOIN
        |  (SELECT DISTINCT l_partkey AS pk FROM lineitem) u
        |  ON p_partkey = pk""".stripMargin,
    "q08_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)""".stripMargin,
    "q09_anti_join_sql" ->
      s"""SELECT DISTINCT user_id, $itemExpr AS item FROM events
        |WHERE event_type = 'view'
        |  AND CAST(user_id AS VARCHAR) || '_' || CAST($itemExpr AS VARCHAR) NOT IN
        |    (SELECT CAST(user_id AS VARCHAR) || '_' || CAST($itemExpr AS VARCHAR)
        |     FROM events WHERE event_type = 'click')""".stripMargin,
    "q10_union_metrics" ->
      s"""SELECT $sceneExpr AS scene, 'pv' AS metric,
        |       CAST(COUNT(*) AS DOUBLE) AS value FROM events GROUP BY 1
        |UNION ALL
        |SELECT $sceneExpr AS scene, 'uv' AS metric,
        |       CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS value
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT $sceneExpr AS scene, 'errors' AS metric,
        |       CAST(COUNT(*) AS DOUBLE) AS value
        |FROM events WHERE event_type='error' GROUP BY 1""".stripMargin,
    "q11_except" ->
      """SELECT p_partkey AS k FROM part
        |EXCEPT SELECT l_partkey AS k FROM lineitem""".stripMargin,
    "q12_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q13_word_count" ->
      """SELECT word, COUNT(*) AS cnt FROM
        |  (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> '' GROUP BY word""".stripMargin,
    "q14_offline_metrics" -> OfflineMetricsOracle.sql)
}
