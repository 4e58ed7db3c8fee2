package graft

import org.apache.spark.sql.functions._

class QuoteFeedSpec extends SparkSpec {
  import spark.implicits._

  private def feed = spark.read.format("graft-quotes")
    .option("tickers", "aapl,msft,xom,brk_b")
    .option("days", "20")
    .load()

  test("DSv2 quote feed: one partition per ticker, deterministic content") {
    val df = feed
    assert(df.schema.fieldNames.toSeq ===
      Seq("ticker", "day", "open", "high", "low", "close", "volume"))
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 80)
    val a = df.where($"ticker" === "aapl").orderBy($"day").collect()
    val b = feed.where($"ticker" === "aapl").orderBy($"day").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // OHLC invariants hold
    a.foreach { r =>
      val (o, h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(h >= o && h >= c && l <= o && l <= c)
    }
  }

  test("DSv2 quote feed: column pruning reaches the scan") {
    val pruned = feed.select("ticker", "close")
    val scan = pruned.queryExecution.executedPlan.toString()
    assert(scan.contains("cols=ticker,close"), scan)
  }

  test("DSv2 quote feed: ticker filters prune input partitions at the source") {
    val one = feed.where($"ticker" === "msft")
    assert(one.rdd.getNumPartitions === 1, "EqualTo should plan exactly one partition")
    assert(one.select("ticker").distinct().collect().map(_.getString(0)).toSeq === Seq("msft"))
    assert(one.queryExecution.executedPlan.toString().contains("pushed=[EqualTo(ticker,msft)"))
    val two = feed.where($"ticker".isin("aapl", "xom"))
    assert(two.rdd.getNumPartitions === 2, "In should plan one partition per member")
    assert(two.count() === 40) // 2 tickers × 20 days
    // values identical to the unfiltered read — pruning must not change rows
    val full = feed.where($"ticker" === "msft").collect().map(_.toSeq).toSet
    assert(full === one.collect().map(_.toSeq).toSet)
  }

  test("DSv2 quote feed: count/min/max aggregates push into the source") {
    // grouped: one summary row per ticker partition, no tick rows generated
    val agg = feed.groupBy("ticker")
      .agg(count(lit(1)).as("n"), min($"day").as("d0"), max($"day").as("d1"))
    val plan = agg.queryExecution.executedPlan.toString()
    assert(plan.contains("pushedAggregates=[count,min_day,max_day]"), plan)
    // grouped by ticker = one partition per group ⇒ COMPLETE pushdown:
    // no exchange, no Spark-side aggregate left in the plan
    assert(!plan.contains("Exchange") && !plan.contains("HashAggregate"), plan)
    val rows = agg.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getDate(2).toString, r.getDate(3).toString)).toMap
    assert(rows.keySet === Set("aapl", "msft", "xom", "brk_b"))
    rows.values.foreach { case (n, d0, d1) =>
      assert(n === 20L && d0 === "2024-01-01" && d1 === "2024-01-20")
    }
    // global (ungrouped) aggregate also pushes; Spark merges the partials
    val g = feed.agg(count(lit(1)).as("n"), max($"day").as("d1")).head()
    assert(g.getLong(0) === 80L && g.getDate(1).toString === "2024-01-20")
    // aggregates the source can't answer stay unpushed and still work
    val avg = feed.groupBy("ticker").agg(org.apache.spark.sql.functions.avg($"close"))
    assert(!avg.queryExecution.executedPlan.toString().contains("pushedAggregates"))
    assert(avg.count() === 4)
  }

  test("DSv2 quote feed: limit caps per-partition generation, result still exact") {
    val limited = feed.limit(5)
    assert(limited.count() === 5)
    // the cap reaches the scan: readers generate at most 5 rows per ticker
    // partition instead of the full history
    assert(feed.limit(5).queryExecution.executedPlan.toString().contains("pushedLimit=5"))
    // values match the uncapped feed's first days (the generator's walk is
    // sequential — truncation can't change earlier rows)
    val capped = feed.limit(80).where($"ticker" === "msft").collect().map(_.toSeq).toSet
    val full = feed.where($"ticker" === "msft").collect().map(_.toSeq).toSet
    assert(capped === full)
  }

  test("DSv2 quote feed: reported key-grouped partitioning makes grouped aggregates exchange-free") {
    // The scan reports KeyGroupedPartitioning(ticker) with per-partition
    // keys, so under v2 bucketing an ARBITRARY groupBy(ticker) aggregate —
    // one the source cannot push (sum of closes) — satisfies its clustered
    // distribution straight off the scan: zero Exchange in the plan.
    val prev = spark.conf.get("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val grouped = feed.groupBy($"ticker")
        .agg(sum($"close").as("sum_close"), count(lit(1)).as("n"))
      val plan = grouped.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"grouped agg must not shuffle:\n$plan")
      val rows = grouped.collect().map(r => (r.getString(0), r.getLong(2))).toMap
      assert(rows.keySet === Set("aapl", "msft", "xom", "brk_b"))
      assert(rows.values.forall(_ === 20L))
      // same values as the shuffled plan
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val viaShuffle = feed.groupBy($"ticker")
        .agg(sum($"close").as("sum_close"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      assert(grouped.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
        === viaShuffle)
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", prev)
  }

  test("DSv2 quote feed: reported ordering makes per-ticker windows sort-free") {
    // partitions are single-ticker with days ascending, reported via
    // SupportsReportOrdering — a per-ticker time window needs neither an
    // Exchange (key-grouped report) nor a Sort (ordering report)
    val prev = spark.conf.get("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"ticker").orderBy($"day")
      val sma = feed.select($"ticker", $"day", $"close",
        avg($"close").over(w.rowsBetween(-4, 0)).as("sma5"))
      val plan = sma.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"windowed feed must not shuffle:\n$plan")
      assert(!plan.contains("Sort"), s"windowed feed must not re-sort:\n$plan")
      // values match the explicitly sorted computation
      val viaDefault = {
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
        feed.select($"ticker", $"day", $"close",
          avg($"close").over(w.rowsBetween(-4, 0)).as("sma5"))
          .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(3))).toSet
      }
      assert(sma.collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(3))).toSet
        === viaDefault)
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", prev)
  }

  test("quote feed composes with the stock operators (SMA over the feed)") {
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"ticker").orderBy($"day")
    val sma = feed.select($"ticker", $"day", $"close",
      functions.Fns.sma($"close", 5, w).as("sma_5"))
    val rows = sma.where($"ticker" === "msft" && $"sma_5".isNotNull).count()
    assert(rows === 16) // 20 days - 4 warmup rows
  }
}
