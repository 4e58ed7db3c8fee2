package graft.sources

import graft.operators.Incremental
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Output — the Spark-native replacement for the reference's
  * to_sql(if_exists="append") + S3 CSV uploads (main.py, ticker tables;
  * functions.py initialize_table). Parquet partitioned by day is the
  * at-scale equivalent of the reference's date-keyed SQL tables: partition
  * pruning serves the date-range reads, append is atomic per partition.
  */
object Sinks {

  /** Day-partitioned columnar append. `format` is any columnar source
    * Spark bundles ("parquet" default, "orc" for ORC-standardized lakes)
    * — partition pruning and predicate pushdown work identically
    * (SourcesSpec asserts the ORC scan's PushedFilters).
    */
  def writeByDay(df: DataFrame, path: String, tsCol: String,
                 format: String = "parquet"): Unit =
    df.withColumn("day", to_date(col(tsCol)))
      .write.mode(SaveMode.Append).partitionBy("day").format(format).save(path)

  /** Land a [[Sources.readJsonlCorpus]]-style frame as clean parquet plus
    * a quarantine: rows whose `corruptCol` is null go to `cleanPath`
    * (without the audit column), the rest keep the raw malformed line and
    * land under `rejectPath` — ingest never silently drops data, and the
    * reject side stays re-parseable once the producer is fixed. ONE scan
    * of the source: the split is two filtered writes over the same parsed
    * frame, so persist `df` first when the input is a raw JSON scan (also
    * required by Spark's corrupt-column-projection rule). Returns
    * (clean, rejected) row counts for THIS call — counted from the
    * metadata of the files this call's two write jobs committed, so a
    * second append (or pre-existing data in the paths) never inflates the
    * ledger with cumulative path totals.
    */
  def writeWithRejects(df: DataFrame, cleanPath: String, rejectPath: String,
                       corruptCol: String = "__corrupt"): (Long, Long) = {
    val clean = df.where(col(corruptCol).isNull).drop(corruptCol)
    val bad = df.where(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    (writeCounting(clean, cleanPath), writeCounting(bad, rejectPath))
  }

  /** Append `df` to `path` and return the number of rows THIS write
    * landed. The count rides on the write itself via `observe` (a
    * CollectMetrics node — retry-safe, codegen-transparent, no second
    * pass, no path re-read), so it is a per-call delta even when the path
    * already holds data.
    */
  private def writeCounting(df: DataFrame, path: String): Long = {
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Append).parquet(path)
    obs.get("n").asInstanceOf[Long]
  }

  private def spark(df: DataFrame): SparkSession = df.sparkSession

  /** Restatement: overwrite ONLY the day partitions present in `df`,
    * leaving every other day untouched — the correction path append-only
    * sinks can't express (a late upstream fix re-pulls a day; the daily
    * table must converge to the corrected values, not accumulate both).
    * Idempotent: re-running the same restatement converges to the same
    * state. NOT crash-atomic on a plain file sink — the commit protocol
    * deletes a touched partition before renaming the replacement in, so a
    * restatement that dies mid-commit must simply be re-run (which is what
    * the idempotency is for); a table format with a transaction log is the
    * upgrade when that window matters.
    *
    * The overwrite mode rides on the WRITER (takes precedence over the
    * session conf) — mutating the shared session conf here would race
    * with concurrent writers and could flip an unrelated overwrite to
    * static mode, wiping untouched partitions.
    */
  def restateDays(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("day", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(path)

  /** Streaming restatement into a quote-store catalog table
    * ([[graft.sources.v2.QuoteStoreCatalog]]): each micro-batch's rows
    * REPLACE the day partitions they touch (dynamic partition overwrite —
    * `restateDays` semantics, continuously). The always-on shape of the
    * reference's daily re-pull loop: a late correction feed lands and the
    * served table converges to the corrected day instead of accumulating
    * both versions. foreachBatch replays converge because dynamic
    * overwrite of identical batch content is idempotent; two batches
    * carrying the same day resolve to the LATEST batch (the restatement
    * contract: the newest pull of a day wins whole).
    */
  def restateDaysStream(stream: DataFrame, table: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) batch.writeTo(table).overwritePartitions()
    }

  /** Idempotent incremental append: filter the incoming frame to rows
    * strictly newer than the target's per-key max(ts) (the reference's
    * check_table_append_compatibility + to_sql append), then append. On an
    * empty/absent target, everything is new.
    */
  def appendNewerThan(
      spark: SparkSession,
      incoming: DataFrame,
      path: String,
      key: String,
      tsCol: String): Unit = {
    val fresh =
      try {
        val existing = spark.read.parquet(path)
        Incremental.newerThanExisting(existing, incoming, key, tsCol)
      } catch {
        // only "target doesn't exist yet" means first write — anything else
        // (corrupt files, permissions) must surface
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.toLowerCase.contains("path does not exist") =>
          incoming
      }
    fresh.write.mode(SaveMode.Append).parquet(path)
  }
}
