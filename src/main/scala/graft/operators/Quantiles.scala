package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Exact interpolated quantiles (`quantile_cont` semantics) in BOUNDED
  * memory at any scale.
  *
  * Spark's built-in exact `percentile` aggregate buffers EVERY value of a
  * group in executor memory — correct at benchmark scale, an OOM at
  * 100 TB, which is why the approximate GK sketch is usually offered as
  * the scale path. This operator keeps exactness instead and bounds
  * memory by trading scans for state: the needed order statistics are
  * found by radix bisection over the ORDER-PRESERVING bit encoding of the
  * double domain ([[graft.plans.DoubleSortBits]], the radix-sort-prefix
  * trick). Each pass histograms the next 8 bits of the encoding into 256
  * buckets per outstanding order statistic (a partial-aggregated hash
  * aggregate whose output is model-sized: groups × statistics × 256
  * rows), the driver walks the counts to pick the bucket containing the
  * target rank, and 8 passes pin all 64 bits — the exact value, no
  * per-group buffering anywhere, shuffle carries bucket counts only.
  *
  * Cost shape: 1 + 8 full scans (the base frame is re-scanned per pass,
  * not persisted — at corpus scale a cached copy may not fit, and a
  * column-pruned parquet re-scan is the cheaper side of the trade; callers
  * iterating many quantile sets can persist upstream). Driver state and
  * every collect are model-sized. The group count must be driver-sized
  * (it is the output cardinality).
  *
  * Determinism: bucket counts are exact longs and the final interpolation
  * runs once on the driver — identical results under any partitioning.
  */
object Quantiles {

  private val B = 8 // bits per pass; 256-bucket histograms, 64/B passes

  /** Sentinel standing in for a NULL group key inside the narrowing state
    * (equi-joins drop null keys). No cast-to-string data value starts
    * with a NUL byte, so it cannot collide.
    */
  private val NullKey = "\u0000NULL"

  /** Early-resolve threshold: once a target's window (rows sharing its
    * prefix) holds at most this many rows, one pass collects the window's
    * distinct values + counts (≤ threshold rows per target) and finishes
    * it exactly — continuous-ish data resolves in 2–4 passes instead of
    * the full 8; heavy-duplicate windows keep narrowing and terminate at
    * the full 64 bits regardless.
    */
  private val ResolveWindow = 64L

  /** Exact 0-based order statistics per group: for each group key and
    * each requested rank, the rank-th smallest value (NULL values
    * excluded; a NULL group key is addressed by the internal sentinel —
    * use [[quantileCont]] for null-group-aware output). Requesting a key
    * with no rows fails loudly.
    */
  def orderStatistics(df: DataFrame, keyCol: String, valueCol: String,
                      ranksOf: Map[String, Seq[Long]]): Map[(String, Long), Double] = {
    val spark = df.sparkSession
    import spark.implicits._
    // NULL group keys are real groups (GROUP BY keeps them) — encode them
    // as a sentinel so the state equi-joins match; "\u0000NULL" cannot
    // collide with a cast-to-string key (no data value casts to a string
    // with a NUL prefix)
    val base = df.where(col(valueCol).isNotNull)
      .select(coalesce(col(keyCol).cast("string"), lit(NullKey)).as("__k"),
        graft.plans.Exprs.doubleSortBits(col(valueCol).cast("double")).as("__u"))
    // live: (prefix, remaining rank within window); toResolve: + bitsFixed
    val live = scala.collection.mutable.Map[(String, Long), (Long, Long)]()
    val toResolve = scala.collection.mutable.Map[(String, Long), (Long, Long, Int)]()
    val out = scala.collection.mutable.Map[(String, Long), Double]()
    for ((k, rs) <- ranksOf; r <- rs.distinct) live((k, r)) = (0L, r)
    if (live.isEmpty) return Map.empty
    var pass = 0
    while (live.nonEmpty && pass < 64 / B) {
      val bits = pass * B
      val stDf = live.toSeq.map { case ((k, r), (p, _)) => (k, r, p) }
        .toDF("__k", "__r", "__p")
      val joined = base.join(broadcast(stDf), "__k")
      // Java shifts wrap at 64, so the bits == 0 pass (empty prefix) must
      // skip the prefix test rather than shift by 64
      val matchesPrefix =
        if (bits == 0) lit(true)
        else shiftrightunsigned(col("__u"), 64 - bits) === col("__p")
      val counts = joined.where(matchesPrefix)
        .groupBy(col("__k"), col("__r"),
          shiftrightunsigned(col("__u"), 64 - bits - B).bitwiseAND(lit(255L)).as("__b"))
        .agg(count(lit(1)).as("__c"))
        .collect()
      if (pass == 0) {
        // a requested key with no matching rows would otherwise sit in the
        // state untouched and decode to garbage — fail loudly instead
        val present = counts.map(_.getString(0)).toSet
        val absent = live.keys.map(_._1).filterNot(present.contains)
        require(absent.isEmpty, s"no rows for requested group key(s): ${absent.mkString(", ")}")
      }
      counts.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (key, rows) =>
        val (p, rem) = live(key)
        var cum = 0L
        var done = false
        for ((b, c) <- rows.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1) if !done) {
          if (rem < cum + c) {
            val np = (p << B) | b
            if (c <= ResolveWindow) {
              live.remove(key)
              toResolve(key) = (np, rem - cum, bits + B)
            } else live(key) = (np, rem - cum)
            done = true
          } else cum += c
        }
        require(done, s"rank ${key._2} out of range for group ${key._1}")
      }
      pass += 1
    }
    // fully-narrowed targets: the 64-bit prefix IS the value
    out ++= live.map { case ((k, r), (p, _)) => (k, r) -> graft.plans.DoubleSortBits.decode(p) }
    if (toResolve.nonEmpty) {
      val stDf = toResolve.toSeq.map { case ((k, r), (p, _, b)) => (k, r, p, b) }
        .toDF("__k", "__r", "__p", "__bits")
      val vals = base.join(broadcast(stDf), "__k")
        .where(expr("shiftrightunsigned(__u, 64 - __bits)") === col("__p"))
        .groupBy(col("__k"), col("__r"), col("__u"))
        .agg(count(lit(1)).as("__c"))
        .collect()
      vals.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (key, rows) =>
        val rem = toResolve(key)._2
        var cum = 0L
        var done = false
        // walk the window's distinct values in UNSIGNED encoding order
        for ((u, c) <- rows.map(r => (r.getLong(2), r.getLong(3)))
            .sortBy(_._1 ^ Long.MinValue) if !done) {
          if (rem < cum + c) { out(key) = graft.plans.DoubleSortBits.decode(u); done = true }
          else cum += c
        }
        require(done, s"resolve rank ${key._2} out of range for group ${key._1}")
      }
    }
    out.toMap
  }

  /** Robust per-group location/scale: median, MAD (median absolute
    * deviation) and the count of |x − med| > 3·1.4826·MAD outliers — the
    * outlier-robust normalization statistics a curation pipeline uses
    * where mean/σ are poisoned by the very outliers being hunted. Both
    * medians come from [[quantileCont]]'s radix bisection, so the whole
    * computation is exact AND bounded-memory at any scale: two bisection
    * rounds + one counting scan, never a per-group value buffer. 1.4826
    * is the usual normal-consistency factor. Groups must be driver-sized
    * (they are the output).
    */
  def robustStats(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val meds = quantileCont(df, keyCol, valueCol, Seq(0.5 -> "__med"))
    val withDev = df.join(broadcast(meds), df(keyCol) <=> meds(keyCol))
      .select(meds(keyCol).as(keyCol),
        df(valueCol).as(valueCol),
        col("__med"),
        abs(df(valueCol) - col("__med")).as("__absdev"))
    val mads = quantileCont(withDev, keyCol, "__absdev", Seq(0.5 -> "__mad"))
    withDev.join(broadcast(mads), withDev(keyCol) <=> mads(keyCol))
      .groupBy(withDev(keyCol).as(keyCol))
      .agg(first(col("__med")).as("med"),
        first(col("__mad")).as("mad"),
        count(when(col("__absdev") > lit(3.0) * lit(1.4826) * col("__mad"), 1))
          .as("n_outliers"))
      .select(col(keyCol), round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"), col("n_outliers"))
  }

  /** `quantile_cont` per group: for each q, interpolate between the order
    * statistics at floor/ceil of q·(n−1) — the formula DuckDB/Postgres
    * use, evaluated in the same double arithmetic. Output: one row per
    * group, one column per (q, name). Values are UNROUNDED; apply
    * `round(col, 6)` downstream for oracle-parity output.
    */
  def quantileCont(df: DataFrame, keyCol: String, valueCol: String,
                   qs: Seq[(Double, String)]): DataFrame = {
    val spark = df.sparkSession
    val ns = df.where(col(valueCol).isNotNull)
      .groupBy(coalesce(col(keyCol).cast("string"), lit(NullKey)).as("__k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ranksOf = ns.map { case (k, n) =>
      k -> qs.flatMap { case (q, _) =>
        val pos = q * (n - 1)
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }
    }
    val stats = orderStatistics(df, keyCol, valueCol, ranksOf)
    val rows = ns.toSeq.sortBy(_._1).map { case (k, n) =>
      val vals = qs.map { case (q, _) =>
        val pos = q * (n - 1)
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val vlo = stats((k, lo))
        // integral positions return the order statistic DIRECTLY — the
        // interpolation form would turn an infinite endpoint into
        // Inf − Inf = NaN where percentile()/quantile_cont return ±Inf
        if (lo == hi) vlo
        else vlo + (pos - lo) * (stats((k, hi)) - vlo)
      }
      Row.fromSeq((if (k == NullKey) null else k) +: vals)
    }
    val schema = StructType(StructField(keyCol, StringType, nullable = true) +:
      qs.map { case (_, name) => StructField(name, DoubleType, nullable = false) })
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
