package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: type-2 dimension history and changelog→
  * snapshot merge — the warehouse maintenance layer around the reference's
  * append-only SQL tables (functions.py:23-39 append compatibility only
  * ever ADDS rows; these are the operators that let the same keyed tables
  * carry corrections and deletes without full rewrites).
  *
  * Both are one-window or one-join shapes: per-key state is bounded by the
  * key's own history, never the table, so they scale by adding keys —
  * the 100 TB direction — not by growing per-key state.
  */
object Cdc {

  /** Slowly-changing-dimension type-2 history: collapse a keyed event
    * stream to the intervals over which `attrCol` held each value.
    * Emits one row per VALUE RUN (consecutive equal values collapse),
    * with `valid_from` = first ts of the run, `valid_to` = start of the
    * next run (NULL while current), `is_current` on the open row.
    *
    * Two window passes over the same (key, ts) ordering — Catalyst plans
    * them in ONE sort+exchange since the windows share partitioning and
    * ordering; per-key memory is a single previous-row lag, so a key with
    * a billion events streams through without buffering.
    *
    * `tieCol` breaks equal-ts ties deterministically (an event id); the
    * run detection and the interval lead use the same total order.
    */
  def scd2(df: DataFrame, keyCol: String, attrCol: String, tsCol: String,
           tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val runs = df
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col(attrCol))
    runs
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(
        col(keyCol),
        col(attrCol),
        col(tsCol).as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Merge a changelog into a keyed snapshot (the MERGE INTO shape):
    * per key, EVENT TIME governs — the newest row by `tsCol` wins whether
    * it comes from the snapshot or the changelog, so a late-arriving
    * change older than already-merged state can never regress it (and a
    * stale tombstone cannot delete newer data). A change whose `opCol`
    * equals `deleteOp` is a tombstone and removes the key; keys untouched
    * by the changelog keep their snapshot row.
    *
    * Snapshot and changelog are unioned with a priority bit and resolved
    * by ONE row_number window — a single shuffle on the key, no join, so
    * AQE's skew split applies directly and the changelog never needs to
    * be broadcast-sized. Ordering is (ts, priority, tie) descending:
    * priority breaks exact-ts ties in the changelog's favor, which is
    * what makes REPLAY idempotent — a replayed change ties the merged
    * snapshot row's ts and still wins on priority, converging to the same
    * state; equal-ts changes resolve by `tieCol` descending.
    */
  def mergeChangelog(snapshot: DataFrame, changes: DataFrame, keyCol: String,
                     tsCol: String, tieCol: String, opCol: String,
                     deleteOp: String, valueCols: Seq[String]): DataFrame = {
    // the tie-break column must be numeric: a non-numeric tie would cast
    // to NULL below and equal-ts changes would resolve arbitrarily —
    // fail loudly instead (the engine's unsafe-shape discipline)
    require(changes.schema(tieCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"mergeChangelog tie column '$tieCol' must be numeric " +
        s"(got ${changes.schema(tieCol).dataType.simpleString}) — equal-timestamp " +
        "changes need a total order to resolve deterministically")
    val base: Seq[Column] = (col(keyCol) +: valueCols.map(col)) :+ col(tsCol)
    val snap = snapshot.select(base ++ Seq(
      lit("__snap").as(opCol), lit(0).as("__pri"), lit(-1L).as("__tie")): _*)
    val chg = changes.select(base ++ Seq(
      col(opCol), lit(1).as("__pri"), col(tieCol).cast("long").as("__tie")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col("__pri").desc, col("__tie").desc)
    snap.unionByName(chg)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col(opCol) =!= lit(deleteOp))
      .select((col(keyCol) +: valueCols.map(col)) :+ col(tsCol).as(tsCol) :+
        (col("__pri") === 1).as("from_changelog"): _*)
  }
}
