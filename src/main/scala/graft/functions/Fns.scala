package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Codegen-friendly column functions re-expressing the reference's pandas /
  * SQL transforms. Pure `Column` composition over
  * `org.apache.spark.sql.functions` — no UDFs, so every expression stays
  * inside whole-stage codegen.
  *
  * Reference: stock_data_pipeline/load_yfinance_data.py:143-176,
  * functions.py:103-146, sectors.py:124-135, sector.py:168-180.
  */
object Fns {

  /** Per-entity time-ordered window: partition once on the entity key; all
    * downstream per-entity ops (SMA, gaps, pct-change) reuse the same
    * shuffle — one exchange for the whole time-series stage.
    */
  def entityWindow(partitionCol: Column, orderCol: Column): WindowSpec =
    Window.partitionBy(partitionCol).orderBy(orderCol)

  /** Simple moving average over the trailing `n` rows (inclusive).
    * Reference load_yfinance_data.py:143-145 (`rolling(window=sma).mean()`):
    * pandas emits NULL until the window is full — guard with row_number.
    */
  def sma(value: Column, n: Int, w: WindowSpec): Column = {
    val full = row_number().over(w) >= n
    // Decimal-accumulated window sum ÷ n: exact regardless of how the engine
    // evaluates the frame (running-sum vs recompute vs segment tree).
    val windowSum = sum(value.cast("decimal(28,6)"))
      .over(w.rowsBetween(-(n - 1), Window.currentRow))
      .cast("double")
    when(full, windowSum / lit(n))
  }

  /** (open+close)/2 × volume — load_yfinance_data.py:147-152. */
  def dollarVolume(open: Column, close: Column, volume: Column): Column =
    (open + close) / lit(2) * volume

  /** Off-peak gap %: (open − lag(open))/lag(open) × 100.
    * load_yfinance_data.py:154-158 (the reference shifts `Open`).
    */
  def gapOffPeak(open: Column, w: WindowSpec): Column = {
    val prev = lag(open, 1).over(w)
    (open - prev) / prev * lit(100)
  }

  /** On-peak gap %: (close − open)/open × 100 — load_yfinance_data.py:160-164. */
  def gapOnPeak(open: Column, close: Column): Column =
    (close - open) / open * lit(100)

  /** % change vs the first value inside the trailing `n`-row window —
    * sectors.py:168-180 (n-day relative price movement).
    */
  def pctChangeFromFirst(value: Column, n: Int, w: WindowSpec): Column = {
    val start = first(value).over(w.rowsBetween(-(n - 1), Window.currentRow))
    (value - start) * lit(100) / start
  }

  /** "12.3 M" / "1.2 B" → long shares — sectors.py:124-135 (the reference
    * uppercases the magnitude char, so lowercase suffixes are accepted).
    */
  def parseMagnitude(s: Column): Column = {
    val trimmed = trim(s)
    val num = regexp_replace(trimmed, "[,\\s]|(?i)[MB]$", "").cast("double")
    val suffix = upper(regexp_extract(trimmed, "(?i)([MB])$", 1))
    when(suffix === "M", (num * 1e6).cast("long"))
      .when(suffix === "B", (num * 1e9).cast("long"))
  }

  /** SQL-compatible symbol: lowercase, '.' → '_' — functions.py:141-142. */
  def normalizeSymbolSql(s: Column): Column =
    lower(regexp_replace(s, "\\.", "_"))

  /** yfinance-compatible symbol: '.'/'_' → '-' — functions.py:145-146. */
  def normalizeSymbolYf(s: Column): Column =
    regexp_replace(s, "[._]", "-")

  /** Exact sum for float columns: accumulate in decimal (associative, exact)
    * and convert once at the end. Both a correctness device (bit-identical
    * results regardless of partitioning / merge order — a distributed sum of
    * doubles is order-dependent) and the idiom that makes results stable
    * across cluster sizes.
    */
  def exactSum(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Exact array dot product: per-element products in double (deterministic),
    * accumulated in decimal so the fold order can't change the result.
    */
  def dotExact(a: String, b: String): Column = expr(
    s"""cast(aggregate(
       |  zip_with($a, $b, (x, y) -> cast(cast(x as double) * cast(y as double) as decimal(20,12))),
       |  cast(0 as decimal(30,12)),
       |  (acc, v) -> cast(acc + v as decimal(30,12))) as double)""".stripMargin)

  /** Weekday-based market-day test — functions.py:60-66 (get_market_day;
    * the reference's NYSE calendar lookup degraded to its weekday core, as
    * its own TODO suggests). Saturday/Sunday → false.
    */
  def isMarketDay(d: Column): Column = {
    val dow = dayofweek(d) // 1=Sun..7=Sat
    dow =!= 1 && dow =!= 7
  }

  /** Previous-market-day adjustment — functions.py:103-115.
    * Python weekday() is Mon=0..Sun=6; Spark dayofweek() is Sun=1..Sat=7.
    * Sat/Sun → previous Friday; Mon → previous Friday; Tue-Fri → previous day.
    */
  def prevMarketDay(d: Column): Column = {
    val pyWeekday = (dayofweek(d) + lit(5)) % lit(7)
    val adjust = when(pyWeekday >= 5, pyWeekday - lit(4))
      .when(pyWeekday === 0, lit(3))
      .otherwise(lit(1))
    date_sub(d, adjust)
  }
}
