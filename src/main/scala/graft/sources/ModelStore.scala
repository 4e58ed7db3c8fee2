package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Persistence for driver-trained, model-sized artifacts — the "train
  * once, apply across jobs" contract the persisted ANN indexes already
  * have, extended to the tokenizers. Models land as plain parquet (one
  * table per artifact, explicit ordering columns), so any engine can
  * inspect them and a scoring job on another cluster reconstructs the
  * EXACT model: order is part of the contract (BPE merges apply in rank
  * order) and is persisted as data, never inferred from file layout.
  */
object ModelStore {

  /** BPE merge list → (rank, left, right) parquet. */
  def saveBpe(spark: SparkSession, merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .repartition(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Inverse of [[saveBpe]]: merges in rank order. */
  def loadBpe(spark: SparkSession, path: String): Vector[(String, String)] =
    spark.read.parquet(path)
      .select("rank", "left", "right")
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
      .toVector

  /** Unigram-LM piece table → (piece, logp) parquet. */
  def saveUnigram(spark: SparkSession, model: Map[String, Double], path: String): Unit = {
    import spark.implicits._
    model.toSeq.sortBy(_._1).toDF("piece", "logp")
      .repartition(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Inverse of [[saveUnigram]]. */
  def loadUnigram(spark: SparkSession, path: String): Map[String, Double] =
    spark.read.parquet(path)
      .select("piece", "logp")
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
}
