package graft.operators

import graft.functions.Fns.exactSum
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The relational core the reference delegates to PostgreSQL: multi-aggregate
  * scans, star joins, weighted prices (stock_data_pipeline/sector.py:86-112
  * calculate_sector_price = Σ(price × shares) / shares_outstanding).
  *
  * All money sums go through `exactSum` (decimal accumulate, one cast out) so
  * results are bit-stable across partition counts — a distributed double sum
  * is merge-order-dependent; a decimal sum is not.
  */
object Analytics {

  /** TPC-H Q1-shaped pricing summary: single scan, 8 aggregates, group on two
    * low-cardinality columns. The shipdate filter and the 7-column projection
    * push down to the parquet scan.
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame =
    lineitem
      // string literal coerces to the column's timestamp type (LTZ or NTZ)
      .where(col("l_shipdate") <= lit(cutoff))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("sum_charge"),
        round(exactSum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
        round(exactSum(col("l_extendedprice")) / count(lit(1)), 6).as("avg_price"),
        round(exactSum(col("l_discount")) / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Top revenue orders for a market segment (TPC-H Q3 shape): two shuffle
    * joins on the fact keys + top-k. Customer filter prunes before the join.
    */
  def topOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                segment: String, k: Int): DataFrame =
    customer
      .where(col("c_mktsegment") === segment)
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(k)

  /** Large-volume orders (TPC-H Q18 shape): orders whose TOTAL lineitem
    * quantity clears `minQty`, joined back to their customer — the
    * aggregate-then-filter-then-join plan. The quantity aggregate runs
    * FIRST and partial-aggregates map-side, so the join's probe side is
    * |qualifying orders| (rare by construction), never |lineitem|; the
    * customer dimension joins on the already-filtered order set.
    */
  def bigOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                minQty: Double, k: Int): DataFrame = {
    val big = lineitem
      .groupBy(col("l_orderkey"))
      .agg(exactSum(col("l_quantity")).as("total_qty"))
      .where(col("total_qty") > minQty)
    orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
  }

  /** Revenue by nation (TPC-H Q5 shape): star join where the dimension chain
    * region→nation is broadcast (tiny), so only the two fact tables shuffle.
    */
  def regionRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    orders: DataFrame, lineitem: DataFrame, regionName: String): DataFrame = {
    val dims = broadcast(
      region.where(col("r_name") === regionName)
        .join(nation, col("n_regionkey") === col("r_regionkey")))
    customer
      .join(dims, col("c_nationkey") === col("n_nationkey"))
      .join(orders, col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
  }

  /** Hierarchical daily/typed totals in ONE pass: ROLLUP(event_type, day)
    * emits (type, day) details, per-type subtotals and the grand total from
    * a single scan — the reporting shape the reference derives with separate
    * per-sector and overall passes. Catalyst plans this as one Expand +
    * partial-aggregated exchange: rows shuffle once carrying 3 grouping
    * tuples each, instead of three scans.
    */
  def rollupDaily(events: DataFrame): DataFrame =
    events
      // materialized as a column first: grouping() can't see through an
      // alias inside the rollup clause
      .withColumn("d", to_date(col("ts")))
      .rollup(col("event_type"), col("d"))
      .agg(
        count(lit(1)).as("n"),
        exactSum(col("value")).as("total"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("d")).cast("long").as("g_day"))

  /** CUBE companion to [[rollupDaily]]: all four grouping sets over
    * (type, day) in one Expand pass — the cross-tab each BI layer asks the
    * engine for. Same single-exchange shape as ROLLUP; the Expand
    * multiplies rows map-side BEFORE the partial aggregate, so the shuffle
    * still carries group partials, not 4× events.
    */
  def cubeDaily(events: DataFrame): DataFrame =
    events
      .withColumn("d", to_date(col("ts")))
      .cube(col("event_type"), col("d"))
      .agg(
        count(lit(1)).as("n"),
        exactSum(col("value")).as("total"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("d")).cast("long").as("g_day"))

  /** Arbitrary GROUPING SETS beside [[rollupDaily]]/[[cubeDaily]]'s fixed
    * hierarchies: the per-type totals, per-day totals, and grand total —
    * deliberately WITHOUT the (type, day) fine grain a cube would add, the
    * common "summary bands only" report shape. One Expand pass, one
    * exchange, same as cube: the planner multiplies rows map-side before
    * the partial aggregate, so the shuffle carries 3 group partials per
    * input partition, never 3× events.
    */
  def groupingSetsDaily(events: DataFrame): DataFrame =
    events
      .withColumn("d", to_date(col("ts")))
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("d")), Seq.empty),
        col("event_type"), col("d"))
      .agg(
        count(lit(1)).as("n"),
        exactSum(col("value")).as("total"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("d")).cast("long").as("g_day"))

  /** Association rules over order baskets (support / confidence / lift —
    * the co-purchase recommender primitive). The pair space is
    * Σ k(k−1)/2 within each basket, bounded by basket size — never
    * corpus-quadratic — and the self-join is co-partitioned on the basket
    * key, so it shuffles each side once. Item supports are keyed joins on
    * the already-reduced pair table (an item vocabulary outgrows the
    * broadcast budget at web scale, like q_pmi's unigrams); the basket
    * total is a one-row broadcast.
    */
  def marketBasket(lineitem: DataFrame, minPairs: Long): DataFrame = {
    // the deduped basket table feeds FOUR consumers (both self-join
    // sides, item supports, the basket total) — checkpoint it so the
    // fact scan + dedup run once, not once per consumer; repartition on
    // the basket key BEFORE distinct so the dedup rides the same
    // hash(ok) exchange that co-locates the self-join (one fact-sized
    // shuffle total, and the self-join + the order-count distinct add
    // none: hash(ok) satisfies both)
    val li = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .repartition(col("ok")).dropDuplicates()
    val liM = graft.Graft.materialize(li, eager = false)
    val pairs = liM.select(col("ok"), col("pk").as("pa"))
      .join(liM.select(col("ok"), col("pk").as("pb")), Seq("ok"))
      .where(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairs)
    val items = liM.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val tot = liM.agg(countDistinct(col("ok")).cast("double").as("n_orders"))
    pairs
      .join(items.select(col("pk").as("pa"), col("n_item").as("n_a")), Seq("pa"))
      .join(items.select(col("pk").as("pb"), col("n_item").as("n_b")), Seq("pb"))
      .crossJoin(broadcast(tot))
      .select(col("pa"), col("pb"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_orders"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
          .as("confidence"),
        round(col("n_ab").cast("double") * col("n_orders") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("lift"))
  }

  /** Weighted average price per group — the sector-price calculation
    * re-expressed: Σ(price × weight) / Σ(weight) (sector.py:86-112).
    */
  def weightedPrice(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(
          exactSum(col("l_extendedprice") * col("l_quantity")) /
            nullif(exactSum(col("l_quantity")), lit(0.0)),
          6).as("weighted_price"))

  /** Customer order-count distribution (TPC-H Q13 shape): how many
    * customers placed exactly k qualifying orders, INCLUDING the zero
    * bucket. The scale-critical choice is aggregate-then-join: orders
    * partial-aggregate to per-custkey counts FIRST (one shuffle over the
    * fact, map-side combined), and only the |customers|-sized count frame
    * joins customer — never a join-then-count over raw orders. The second
    * groupBy (histogram over k) is tiny by construction.
    */
  def custOrderDistribution(customer: DataFrame, orders: DataFrame,
                            excludePriority: String): DataFrame = {
    val perCust = orders
      .where(col("o_orderpriority") =!= excludePriority)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("k"))
    customer
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("k"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Top supplier by revenue in a date window (TPC-H Q15 shape): the
    * agg-of-agg pattern — revenue per supplier (one partial-aggregated
    * shuffle over the filtered fact), then the max revenue as a ONE-ROW
    * broadcast frame probed back into the per-supplier aggregate, never a
    * window sort or a self-join of the aggregate. Ties all surface (the
    * TPC-H spec's correlated `= (SELECT max…)` semantics). Revenue is
    * decimal-summed so the max compares bit-identically cross-engine.
    */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame,
                  from: String, until: String): DataFrame = {
    val rev = lineitem
      .where(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .groupBy(col("l_suppkey"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("total_revenue"))
    val best = rev.agg(max(col("total_revenue")).as("best"))
    supplier
      .join(rev.crossJoin(broadcast(best)).where(col("total_revenue") === col("best")),
        col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Supplier-count-per-part-class report (TPC-H Q16 shape): distinct
    * suppliers offering each (brand, type, size) class, excluding a
    * computed supplier blacklist. part⋈lineitem is the one fact-fact
    * shuffle (on partkey); the blacklist is dimension-sized and broadcast
    * as a LEFT ANTI probe (never a shuffle of the fact on suppkey); the
    * distinct count runs as Catalyst's two-phase Expand aggregate, so
    * (class, suppkey) pairs partial-deduplicate map-side.
    */
  def supplierClassCount(part: DataFrame, supplier: DataFrame,
                         lineitem: DataFrame, k: Int): DataFrame = {
    val blacklist = supplier.where(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("bad_suppkey"))
    lineitem
      .join(broadcast(blacklist), col("l_suppkey") === col("bad_suppkey"), "left_anti")
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      .limit(k)
  }

  /** Revenue by supplier nation × order year for one part class (TPC-H Q9
    * shape): the widest join tree on the board — lineitem⋈part⋈orders⋈
    * supplier⋈nation. The part filter prunes BEFORE its join (Catalyst
    * pushes the p_type predicate to the scan, so the partkey join probes
    * only the class's survivors); supplier and nation are dimension-sized
    * and broadcast; the only data-sized exchanges are the two fact joins
    * (lineitem⋈part on partkey, ⋈orders on orderkey), and the final
    * (nation, year) group is dimension-small with map-side partials.
    */
  def profitByNationYear(nation: DataFrame, supplier: DataFrame,
                         part: DataFrame, orders: DataFrame, lineitem: DataFrame,
                         partType: String): DataFrame =
    lineitem
      .join(part.where(col("p_type") === partType),
        col("l_partkey") === col("p_partkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("n_name"), col("o_year").desc)

  /** First-order cohort retention matrix: customers cohort by the month of
    * their first order; cell (cohort, k) counts distinct customers from
    * that cohort ordering again k months later. The first-order month is
    * one partial-aggregated min per custkey (never a window over raw
    * orders); the month offset is integer month arithmetic (no date
    * rounding ambiguity); the matrix aggregate runs on the (custkey,
    * cohort, k) DEDUPLICATED grain, so the distinct count's Expand carries
    * at most one row per customer-cell.
    */
  def orderCohorts(orders: DataFrame): DataFrame = {
    val monthIdx = year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1
    val first = orders
      .groupBy(col("o_custkey"))
      .agg(min(monthIdx).as("m0"))
    orders
      .select(col("o_custkey"), monthIdx.as("m"))
      .join(first, Seq("o_custkey"))
      .select(col("o_custkey"), col("m0"), (col("m") - col("m0")).as("k"))
      .distinct()
      .groupBy(col("m0"), col("k"))
      .agg(count(lit(1)).as("n_customers"))
      .select(
        concat(expr("CAST(m0 div 12 AS BIGINT)"), lit("-"),
          lpad((pmod(col("m0"), lit(12)) + 1).cast("string"), 2, "0")).as("cohort"),
        col("k").cast("long").as("months_later"), col("n_customers"))
      .orderBy(col("cohort"), col("months_later"))
  }

  /** Naive-forecast error metrics per series (the eval harness under any
    * forecasting work): daily mean value per type, lag-1 persistence
    * forecast, then MAE / RMSE / bias per type. Day bars partial-aggregate
    * first (the fact shuffles once as (type, day) partials), the lag is a
    * per-type window over DAY-grain rows (bounded by calendar length, not
    * event rate), and the error moments are round-12 decimal sums — the
    * bit-stable recipe — with only the final IEEE sqrt outside it.
    */
  def forecastEval(events: DataFrame): DataFrame = {
    def m(c: Column): Column =
      sum(round(c, 12).cast("decimal(28,12)")).cast("double")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg((exactSum(col("value")) / count(lit(1))).as("y"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("d"))
    daily
      .withColumn("f", lag(col("y"), 1).over(w))
      .where(col("f").isNotNull)
      .select(col("event_type"), (col("y") - col("f")).as("e"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        round(m(abs(col("e"))) / count(lit(1)), 6).as("mae"),
        round(sqrt(m(col("e") * col("e")) / count(lit(1))), 6).as("rmse"),
        round(m(col("e")) / count(lit(1)), 6).as("bias"))
      .orderBy(col("event_type"))
  }

  /** Gini coefficient of order value per market segment — the revenue-
    * concentration audit. Needs each order's rank within its segment:
    * one per-segment window sort (Spark's external sort — spill-safe on a
    * hot segment), then a single partial-aggregated pass for the three
    * moments (n, Σx, Σi·x). G = (2Σi·x − (n+1)Σx) / (nΣx) on
    * decimal-accumulated sums, so the statistic is bit-stable across
    * partition counts; ties in x contribute the same Σi·x under any
    * permutation, and the orderkey tiebreak makes the rank itself total.
    */
  def giniBySegment(customer: DataFrame, orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        exactSum(col("o_totalprice")).as("sx"),
        exactSum(col("o_totalprice") * col("i")).as("sxi"))
      .select(col("c_mktsegment"), col("n"),
        round((lit(2) * col("sxi") - (col("n") + lit(1)) * col("sx")) /
          (col("n") * col("sx")), 6).as("gini"))
      .orderBy(col("c_mktsegment"))
  }

  /** Idle high-balance customers per segment (TPC-H Q22 shape): customers
    * whose balance beats the positive-balance average (a one-row broadcast
    * scalar, the decorrelated `> (SELECT avg…)`) and who placed no urgent
    * orders (LEFT ANTI against the filtered fact — the `NOT EXISTS`).
    * The anti join shuffles on custkey with the urgent subset pruned at
    * the scan; the final per-segment rollup is dimension-small.
    */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame,
                        priority: String): DataFrame = {
    val thresh = customer.where(col("c_acctbal") > 0)
      .agg((exactSum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    val urgent = orders.where(col("o_orderpriority") === priority)
      .select(col("o_custkey"))
    customer
      .crossJoin(broadcast(thresh))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), exactSum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Late-shipment priority check (TPC-H Q4 shape): orders with at least
    * one lineitem shipped more than `lagDays` after the order date,
    * counted per priority — `EXISTS` as a LEFT SEMI join whose non-equi
    * residual (the date condition) evaluates inside the hash probe, so
    * the fact scans once, dedup-by-existence costs no distinct, and the
    * final rollup is priority-cardinality small. Both date columns must
    * arrive in the same timestamp family (the callers pass NTZ).
    */
  def latePriorityOrders(orders: DataFrame, lineitem: DataFrame,
                         lagDays: Int): DataFrame =
    orders
      .join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lagDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy(col("o_orderpriority"))

  /** Important stock concentration (TPC-H Q11 shape): per-part revenue
    * value, kept where it clears `meanMult` × the average part's value —
    * the group-then-global-threshold plan. The threshold is a one-row
    * aggregate OVER THE GROUPED frame (never the fact) broadcast back as
    * a scalar, so the fact shuffles exactly once, on l_partkey.
    */
  def importantStock(lineitem: DataFrame, meanMult: Double): DataFrame = {
    val value = lineitem
      .groupBy(col("l_partkey"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("stock_value"))
    val thresh = value
      .agg((exactSum(col("stock_value")) / count(lit(1))).as("mean_value"))
    value
      .crossJoin(broadcast(thresh))
      .where(col("stock_value") > lit(meanMult) * col("mean_value"))
      .select(col("l_partkey"), col("stock_value"))
      .orderBy(col("stock_value").desc, col("l_partkey"))
  }

  /** Promotion revenue share (TPC-H Q14 shape): conditional aggregation
    * over one quarter of the fact joined to the broadcast part dimension
    * — both the numerator (PROMO lines) and denominator come from the
    * same single pass; the shipdate range prunes at the parquet scan.
    */
  def promoRevenue(part: DataFrame, lineitem: DataFrame,
                   from: String, until: String): DataFrame =
    lineitem
      .where(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100) *
          exactSum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0))) /
          nullif(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), lit(0.0)),
          6).as("promo_pct"),
        count(lit(1)).as("n_lines"))

  /** Small-quantity revenue by brand (TPC-H Q17 shape): the correlated
    * `l_quantity < 0.2 * avg(quantity per part)` subquery decorrelated
    * into an aggregate-then-join — per-part averages are part-cardinality
    * small, so they BROADCAST back onto the fact instead of shuffling it;
    * the brand dimension broadcasts likewise. One fact shuffle total (the
    * per-part aggregate); the final rollup is brand-small.
    */
  def smallQtyRevenue(part: DataFrame, lineitem: DataFrame,
                      avgFrac: Double): DataFrame = {
    val avgQty = lineitem
      .groupBy(col("l_partkey").as("aq_partkey"))
      .agg((exactSum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    lineitem
      .join(broadcast(avgQty), col("l_partkey") === col("aq_partkey"))
      .where(col("l_quantity") < lit(avgFrac) * col("avg_qty"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(round(exactSum(col("l_extendedprice")) / lit(7.0), 6).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))
  }

  /** Bilateral trade volume (TPC-H Q7 shape): revenue shipped between two
    * nations by year. Both dimension chains pre-filter to the two nations
    * BEFORE touching a fact — the pruned customer/supplier frames
    * broadcast — and the cross-pair disjunction (exclude A→A, B→B) runs
    * after both joins on the already-tiny survivor set. The fact shuffles
    * only for its own joins; the (nation, nation, year) rollup is
    * constant-size.
    */
  def nationTradeVolume(nation: DataFrame, customer: DataFrame,
                        supplier: DataFrame, orders: DataFrame,
                        lineitem: DataFrame, nationA: String,
                        nationB: String): DataFrame = {
    val n = nation.where(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey"), col("n_name"))
    val cust = broadcast(customer
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    val supp = broadcast(supplier
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .where((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Disjunctive-predicate revenue (TPC-H Q19 shape): three (brand, size
    * range, quantity range) clauses OR'd together over the fact⋈part
    * broadcast join — the plan-shape test that a multi-clause disjunction
    * survives as ONE scan + one hash probe (the part-side brand/size
    * disjunction is even pushable below the join); one aggregate row out.
    */
  def disjunctiveRevenue(part: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(16, 30) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#33" && col("p_size").between(31, 50) &&
          col("l_quantity").between(20, 30)))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Dominant part suppliers (TPC-H Q20 shape): suppliers covering more
    * than `share` of a PROMO part's total shipped quantity, ranked by how
    * many parts they dominate — the nested-aggregate + semi-join chain:
    * per-(part, supplier) quantities roll up once on partkey, the
    * per-part total re-aggregates FROM that frame (never the fact), the
    * share filter joins the two on partkey, and the PROMO restriction is
    * a broadcast LEFT SEMI against the part dimension.
    */
  def dominantSuppliers(supplier: DataFrame, part: DataFrame,
                        lineitem: DataFrame, share: Double,
                        minParts: Long): DataFrame = {
    // ONE lineitem scan and ONE fact-sized exchange: the fact is laid out
    // by partkey once (repartition), the (part, supplier) roll-up rides
    // it (hash(partkey) clusters every (partkey, suppkey) group), and the
    // per-part total comes from a window over the SAME layout — the
    // nested-aggregate + self-join form re-scanned and re-shuffled the
    // fact for the per-part branch. The window's decimal sum is the same
    // expression as exactSum (order-independent), so tq is bit-identical
    // to the aggregate it replaces.
    val perPS = lineitem
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(exactSum(col("l_quantity")).as("sq"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    perPS
      .select(col("l_partkey"), col("l_suppkey"), col("sq"),
        sum(col("sq").cast("decimal(28,6)")).over(w).cast("double").as("tq"))
      .where(col("sq") > lit(share) * col("tq"))
      .join(broadcast(part.where(col("p_type") === "PROMO").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_parts"))
      .where(col("n_parts") >= minParts)
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("n_parts"))
      .orderBy(col("n_parts").desc, col("s_name"))
  }

  /** Suppliers who alone shipped last on shared orders (TPC-H Q21 shape):
    * the double EXISTS / NOT EXISTS correlated pair decorrelated into one
    * per-order aggregate (last ship date + distinct supplier count), a
    * filtered join back to the fact for the lines ON that last date, and
    * a sole-supplier check — three passes over orderkey-partitioned data
    * instead of two correlated subqueries per row. Output: the `k`
    * most-blamed suppliers.
    */
  def soleLastShippers(supplier: DataFrame, lineitem: DataFrame,
                       k: Int): DataFrame = {
    // ONE lineitem scan and ONE fact-sized exchange: the fact is laid out
    // by orderkey once (repartition), the (order, supplier) last-ship-date
    // roll-up rides that exchange (hash(orderkey) clusters every
    // (orderkey, suppkey) group), and the "last ship date of the order" /
    // "distinct suppliers on the order" values come from a window over
    // the SAME hash(orderkey) layout — no join back to the fact, which
    // previously re-scanned and re-shuffled lineitem to find the lines on
    // the last date. A supplier shipped on the order's last date iff its
    // per-(order, supplier) max ship date IS the order max, so the
    // (order, supplier) grain — orders×suppliers-sized, not line-sized —
    // carries everything the sole-supplier check needs.
    val perOS = lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("maxd"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
    val sole = perOS
      .select(col("l_orderkey"), col("l_suppkey"), col("maxd"),
        max(col("maxd")).over(w).as("last_ship"),
        count(lit(1)).over(w).as("n_supp"))
      .where(col("n_supp") >= 2 && col("maxd") === col("last_ship"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_last"), max(col("l_suppkey")).as("suppkey"))
      .where(col("n_last") === 1)
    sole
      .groupBy(col("suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(k)
  }
}
