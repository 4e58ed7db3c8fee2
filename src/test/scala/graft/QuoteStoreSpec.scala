package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._

class QuoteStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val dir = java.nio.file.Files.createTempDirectory("graft_quote_store").toString
    spark.conf.set("spark.sql.catalog.quotes",
      classOf[graft.sources.v2.QuoteStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.quotes.root", dir)
    dir
  }

  private def mkTable(name: String): String = {
    root // force catalog registration
    spark.sql(s"""CREATE TABLE quotes.$name (
      ticker STRING, day DATE, open DOUBLE, high DOUBLE, low DOUBLE,
      close DOUBLE, volume BIGINT) PARTITIONED BY (day)""")
    s"quotes.$name"
  }

  private def quotes(rows: (String, String, Double, Long)*) =
    rows.toSeq.map { case (t, d, px, v) =>
      (t, java.sql.Date.valueOf(d), px, px + 1.0, px - 1.0, px + 0.5, v)
    }.toDF("ticker", "day", "open", "high", "low", "close", "volume")

  test("DSv2 write: append round-trips through the catalog") {
    val t = mkTable("t_append")
    quotes(
      ("aapl", "2024-01-02", 100.0, 1000L),
      ("msft", "2024-01-02", 200.0, 2000L),
      ("aapl", "2024-01-03", 101.0, 1100L)).writeTo(t).append()
    quotes(("xom", "2024-01-03", 50.0, 500L)).writeTo(t).append()
    val back = spark.table(t)
      .select($"ticker", $"day".cast("string"), $"open", $"volume")
      .as[(String, String, Double, Long)].collect().sorted
    assert(back === Array(
      ("aapl", "2024-01-02", 100.0, 1000L),
      ("aapl", "2024-01-03", 101.0, 1100L),
      ("msft", "2024-01-02", 200.0, 2000L),
      ("xom", "2024-01-03", 50.0, 500L)))
  }

  test("DSv2 write: overwritePartitions restates ONLY the touched days (Sinks.restateDays semantics)") {
    val t = mkTable("t_restate")
    quotes(
      ("aapl", "2024-01-02", 100.0, 1000L),
      ("aapl", "2024-01-03", 999.0, 9990L), // bad day to be corrected
      ("msft", "2024-01-03", 888.0, 8880L),
      ("aapl", "2024-01-04", 104.0, 1400L)).writeTo(t).append()
    // the correction re-pulls day 03 (both tickers) and must REPLACE that
    // day entirely while days 02 and 04 stay untouched
    quotes(
      ("aapl", "2024-01-03", 103.0, 1300L),
      ("msft", "2024-01-03", 203.0, 2300L)).writeTo(t).overwritePartitions()
    val back = spark.table(t)
      .select($"ticker", $"day".cast("string"), $"open", $"volume")
      .as[(String, String, Double, Long)].collect().sorted
    assert(back === Array(
      ("aapl", "2024-01-02", 100.0, 1000L),
      ("aapl", "2024-01-03", 103.0, 1300L),
      ("aapl", "2024-01-04", 104.0, 1400L),
      ("msft", "2024-01-03", 203.0, 2300L)))
    // idempotent: re-running the same restatement converges to the same state
    quotes(
      ("aapl", "2024-01-03", 103.0, 1300L),
      ("msft", "2024-01-03", 203.0, 2300L)).writeTo(t).overwritePartitions()
    assert(spark.table(t).count() === 4)
  }

  test("DSv2 write: overwrite(true) truncates days the frame does not mention") {
    val t = mkTable("t_truncate")
    quotes(
      ("aapl", "2024-01-02", 100.0, 1000L),
      ("aapl", "2024-01-03", 101.0, 1100L)).writeTo(t).append()
    quotes(("msft", "2024-01-05", 205.0, 2500L)).writeTo(t).overwrite(lit(true))
    val back = spark.table(t)
      .select($"ticker", $"day".cast("string")).as[(String, String)].collect().sorted
    assert(back === Array(("msft", "2024-01-05")))
  }

  test("quote store read: day predicates prune day-directory partitions") {
    val t = mkTable("t_prune")
    quotes(
      ("aapl", "2024-01-02", 100.0, 1000L),
      ("aapl", "2024-01-03", 101.0, 1100L),
      ("aapl", "2024-01-04", 102.0, 1200L)).writeTo(t).append()
    val one = spark.table(t).where($"day" === "2024-01-03")
    assert(one.rdd.getNumPartitions === 1,
      "day equality must plan exactly one day-directory partition")
    assert(one.select($"open").as[Double].collect().toSeq === Seq(101.0))
    val range = spark.table(t).where($"day" >= "2024-01-03")
    assert(range.rdd.getNumPartitions === 2)
    assert(range.count() === 2)
    // and the pushed day filter shows in the scan description
    assert(one.queryExecution.executedPlan.toString().contains("pushed=["),
      one.queryExecution.executedPlan.toString())
  }

  test("quote store read: ticker predicates push into the line reader") {
    val t = mkTable("t_ticker_push")
    quotes(
      ("aapl", "2024-01-02", 100.0, 1000L),
      ("msft", "2024-01-02", 200.0, 2000L),
      ("xom", "2024-01-02", 50.0, 500L),
      ("aapl", "2024-01-03", 101.0, 1100L),
      ("msft", "2024-01-03", 201.0, 2100L)).writeTo(t).append()
    // equality: the filter reaches the scan (plan-asserted, matching
    // QuoteFeedSpec's pushdown assert) and results are correct
    val eq = spark.table(t).where($"ticker" === "msft")
    val eqScan = eq.queryExecution.executedPlan.toString()
    assert(eqScan.contains("EqualTo(ticker,msft)"), eqScan)
    assert(eq.select($"open").as[Double].collect().sorted.toSeq === Seq(200.0, 201.0))
    // membership (IN) composes with day pruning: one day directory
    // planned AND the ticker set pushed
    val in = spark.table(t)
      .where($"ticker".isin("aapl", "xom") && $"day" === "2024-01-02")
    val inScan = in.queryExecution.executedPlan.toString()
    assert(inScan.contains("In(ticker"), inScan)
    assert(in.rdd.getNumPartitions === 1,
      "day equality must still plan exactly one day-directory partition")
    assert(in.select($"open").as[Double].collect().sorted.toSeq === Seq(50.0, 100.0))
    // a non-pushable predicate stays a residual filter and still works
    val res = spark.table(t).where($"open" > 150.0)
    assert(res.count() === 2)
  }

  test("restateDaysStream: a correction stream restates landed days continuously") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = mkTable("t_stream_restate")
    quotes(
      ("aapl", "2024-01-02", 100.0, 1000L),
      ("aapl", "2024-01-03", 999.0, 9990L), // wrong, to be restated
      ("msft", "2024-01-04", 204.0, 2400L)).writeTo(t).append()
    val input = MemoryStream[(String, String, Double, Long)]
    val stream = input.toDS().toDF("ticker", "d", "px", "volume")
      .select($"ticker", $"d".cast("date").as("day"),
        $"px".as("open"), ($"px" + 1.0).as("high"), ($"px" - 1.0).as("low"),
        ($"px" + 0.5).as("close"), $"volume")
    val query = graft.sources.Sinks.restateDaysStream(stream, t).start()
    try {
      // micro-batch 1: the corrected day 03
      input.addData(("aapl", "2024-01-03", 103.0, 1300L))
      query.processAllAvailable()
      val afterFix = spark.table(t)
        .select($"ticker", $"day".cast("string"), $"open")
        .as[(String, String, Double)].collect().sorted
      assert(afterFix === Array(
        ("aapl", "2024-01-02", 100.0),
        ("aapl", "2024-01-03", 103.0),
        ("msft", "2024-01-04", 204.0)))
      // micro-batch 2: a NEW day lands; prior days untouched
      input.addData(("aapl", "2024-01-05", 105.0, 1500L))
      query.processAllAvailable()
      assert(spark.table(t).count() === 4)
      assert(spark.table(t).where($"day" === "2024-01-03")
        .select($"open").as[Double].collect().toSeq === Seq(103.0))
    } finally query.stop()
  }

  test("quote store: feed-to-store pipeline lands the synthetic feed and restates a day") {
    val t = mkTable("t_pipeline")
    val feed = spark.read.format("graft-quotes")
      .option("tickers", "aapl,msft").option("days", "3").load()
    feed.writeTo(t).append()
    assert(spark.table(t).count() === 6)
    // restate day 2 of the feed (epoch origin 2024-01-01) with halved volume
    val d2 = LocalDate.of(2024, 1, 2).toString
    val corrected = feed.where($"day" === d2)
      .withColumn("volume", ($"volume" / 2).cast("long"))
    corrected.writeTo(t).overwritePartitions()
    assert(spark.table(t).count() === 6)
    val restated = spark.table(t).where($"day" === d2)
      .select($"volume").as[Long].collect().sorted
    val expected = feed.where($"day" === d2)
      .select(($"volume" / 2).cast("long")).as[Long].collect().sorted
    assert(restated === expected)
  }
}
