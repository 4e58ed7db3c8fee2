package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data profiling — the first thing a curation pipeline runs against a new
  * corpus drop: per-column row/null/distinct counts and numeric ranges.
  * One aggregate over one scan (multi-distinct plans Spark's Expand, still
  * a single pass over the data), then a stack() to long format — no
  * per-column jobs, no driver loops.
  */
object Profile {

  /** Profile `cols` (numeric or castable-to-double) of `df`: one output row
    * per column with (col, n, non_null, n_distinct, min_v, max_v).
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}_nn"),
        countDistinct(col(c)).as(s"__${c}_nd"),
        min(col(c)).cast("double").as(s"__${c}_min"),
        max(col(c)).cast("double").as(s"__${c}_max"))
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // names are spliced into SQL: quote the literal and backtick the
    // generated identifiers so hyphens/spaces in a column name can't break
    // (or silently alter) the stack expression
    val stackArgs = cols.map { c =>
      val lit = c.replace("'", "''")
      s"'$lit', __n, `__${c}_nn`, `__${c}_nd`, `__${c}_min`, `__${c}_max`"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackArgs) as (col, n, non_null, n_distinct, min_v, max_v)"))
  }

  /** Fixed-width histogram of `valueCol` per `keyCol` group: bin floor =
    * floor(value / width) × width. One partial-aggregated groupBy — the
    * shuffle moves (keys × bins) partial counts, never rows, so the cost is
    * scan-bound at any corpus size. floor on the shared double input is
    * bit-identical across engines, so bin membership can't straddle.
    */
  def histogram(df: DataFrame, valueCol: String, width: Double,
                keyCol: String): DataFrame =
    df
      .groupBy(col(keyCol),
        (floor(col(valueCol) / width) * width).cast("double").as("bin_start"))
      .agg(count(lit(1)).as("n"))

  /** Benford first-digit screen per group: observed first-significant-digit
    * frequencies of `valueCol` against Benford's law log10(1 + 1/d) —
    * the fabricated-data / unit-drift detector a profiling pass runs on
    * financial columns. One partial-aggregated groupBy over (key, digit):
    * the shuffle carries ≤ 9 partials per key per task, never rows.
    *
    * The first digit is extracted from the DECIMAL(28,6) string rendering,
    * not via log10/pow — decimal formatting is exact and engine-identical,
    * while float log10 at near-power-of-10 inputs is an ULP coin-flip
    * between libm implementations. Values that render without a nonzero
    * digit (0 and |v| < 1e-6) carry no first digit and are excluded.
    */
  def benford(df: DataFrame, valueCol: String, keyCol: String): DataFrame = {
    val digit = regexp_extract(
      col(valueCol).cast("decimal(28,6)").cast("string"), "[1-9]", 0)
    val perKey = Window.partitionBy(col(keyCol))
    df
      .select(col(keyCol), digit.as("first_digit"))
      .where(col("first_digit") =!= "")
      .groupBy(col(keyCol), col("first_digit"))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("first_digit"), col("n"),
        round(col("n").cast("double") / sum(col("n")).over(perKey), 6)
          .as("obs_freq"),
        round(log(lit(1.0) + lit(1.0) / col("first_digit").cast("double"))
          / log(lit(10.0)), 6).as("benford_freq"))
  }
}
