package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long→wide reshaping — the reference pivots holdings (ticker, shares) rows
  * into a date × ticker_shares wide table
  * (stock_data_pipeline/sector.py:156-173) and unions snapshots whose column
  * sets drift as tickers enter/leave the index (sector.py:70-84
  * add_missing_columns).
  */
object PivotOps {

  /** Pivot with a DECLARED vocabulary, as one conditional aggregation:
    * `agg(when(pivotCol = v, x)) as v` per value. Spark's `.pivot` API runs a
    * two-phase aggregate (two shuffles) even with explicit values; this is a
    * single hash-aggregate — one shuffle on the key, partial aggregation
    * map-side. At 100 TB the vocabulary (event types / tickers) is catalog
    * metadata, not something to re-derive from the data each run.
    *
    * `agg` receives the filtered input column and must produce the
    * aggregate, e.g. `c => sum(c.cast("decimal(28,6)")).cast("double")`.
    */
  def pivotAgg(
      df: DataFrame,
      key: String,
      pivotCol: String,
      values: Seq[String],
      valueCol: String,
      agg: Column => Column): DataFrame = {
    val aggs = values.map { v =>
      agg(when(col(pivotCol) === v, col(valueCol))).as(v)
    }
    df.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Unpivot (melt): the inverse of [[pivotAgg]] — wide columns back to
    * (key, value) rows via one `stack` projection. Narrow, codegen'd, no
    * shuffle: each input row expands to ≤ |valueCols| output rows in
    * place.
    *
    * NULL CONTRACT (explicit, both directions): every NULL cell drops —
    * both combinations the wide row never had AND combinations that
    * existed in the long form with only NULL values (their pivot
    * aggregate is NULL, indistinguishable in the wide cell). So
    * melt(pivotAgg(df)) ≡ the direct long aggregate FILTERED to non-NULL
    * totals (`HAVING total IS NOT NULL` — exactly what the q_unpivot
    * oracle declares). A caller who must distinguish "absent" from
    * "present but all-NULL" should pivot a count alongside the value;
    * spec'd as a round trip on NULL-bearing data.
    */
  def melt(df: DataFrame, idCol: String, valueCols: Seq[String],
           keyName: String = "key", valueName: String = "value"): DataFrame = {
    // Spark lexes adjacent string literals as CONCATENATION, so the
    // SQL-standard doubled-quote escape would silently drop the quote
    // ('it''s' reads back as "its") — escape with backslash instead, and
    // double backticks inside the quoted identifier
    val stackArgs = valueCols
      .map { c =>
        val lit0 = c.replace("\\", "\\\\").replace("'", "\\'")
        val ident = c.replace("`", "``")
        s"'$lit0', `$ident`"
      }.mkString(", ")
    df.select(col(idCol),
        expr(s"stack(${valueCols.size}, $stackArgs) as (`$keyName`, `$valueName`)"))
      .where(col(valueName).isNotNull)
  }

  /** Dynamic-vocabulary pivot (vocabulary discovered from the data) — the
    * built-in two-phase path, for when the value set is genuinely unknown.
    */
  def pivotDynamic(
      df: DataFrame,
      key: String,
      pivotCol: String,
      agg: Column): DataFrame =
    df.groupBy(col(key)).pivot(pivotCol).agg(agg)

  /** Union snapshots whose wide schemas drifted: missing columns become NULL
    * (the reference's ALTER TABLE ADD COLUMN ... NULL path, sector.py:70-84).
    */
  def unionEvolved(snapshots: Seq[(String, DataFrame)]): DataFrame =
    snapshots
      .map { case (tag, df) => df.withColumn("snapshot", lit(tag)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** Project a wide table onto a declared vocabulary: keep `keyCols` plus
    * exactly the `vocabulary` columns — dropping columns for entities that
    * left the index (the reference's old-ticker column removal,
    * sector.py:126-131) and adding typed NULL columns for entities not yet
    * seen. unionEvolved handles schema *growth*; this is the other half of
    * the drift story, and together they make any snapshot conform to the
    * current catalog vocabulary.
    */
  def projectToVocabulary(df: DataFrame, keyCols: Seq[String], vocabulary: Seq[String],
                          fillType: String = "double"): DataFrame = {
    val present = df.columns.toSet
    val cols = keyCols.map(col) ++ vocabulary.map { v =>
      if (present(v)) col(v) else lit(null).cast(fillType).as(v)
    }
    df.select(cols: _*)
  }
}
