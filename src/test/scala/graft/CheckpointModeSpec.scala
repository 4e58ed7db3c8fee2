package graft

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}

/** The iterative loops must produce identical results in BOTH
  * materialization modes of [[Graft.materialize]]: executor-local blocks
  * (default, single-JVM) and reliable checkpoints under
  * `spark.graft.checkpointDir` (the cluster mode, where loop state must
  * survive executor loss). Checked by running each loop twice and
  * comparing row sets exactly.
  */
class CheckpointModeSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def withReliableCheckpoints[T](f: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-spec").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try f
    finally {
      spark.conf.unset("spark.graft.checkpointDir")
      GraftBridge.clearCheckpointDir(spark)
      // best-effort cleanup of the spec's checkpoint files
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm))
        p.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  private def edges: DataFrame = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 10L), (5L, 5L),
      (6L, 7L), (7L, 8L), (8L, 6L), (20L, 21L))
      .toDF("src", "dst")
  }

  private def docs: DataFrame = Tables.documents(spark, sfDir)

  test("pagerank identical under local and reliable checkpoints") {
    val local = rows(Graph.pagerank(edges, iters = 5)
      .select(col("node"), round(col("rank"), 10).as("r")))
    val reliable = withReliableCheckpoints {
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
      val r = rows(Graph.pagerank(edges, iters = 5)
        .select(col("node"), round(col("rank"), 10).as("r")))
      // the conf was actually honored: the context now has a checkpoint dir
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      r
    }
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    assert(local == reliable)
  }

  test("BFS hops and label propagation identical under both modes") {
    val localHops = rows(Graph.shortestHops(edges, source = 1L, iters = 6))
    val localCc = rows(Graph.connectedComponents(edges, iters = 10))
    val (relHops, relCc) = withReliableCheckpoints {
      (rows(Graph.shortestHops(edges, source = 1L, iters = 6)),
        rows(Graph.connectedComponents(edges, iters = 10)))
    }
    assert(localHops == relHops)
    assert(localCc == relCc)
  }

  test("near-dedup pipeline identical under both modes") {
    val batch = docs.where(col("doc_id") % 2 === 1)
    val store = Dedup.minhashSignatures(docs.where(col("doc_id") % 2 === 0))
    def run(): Set[String] = rows(
      Dedup.nearDedupIncremental(batch, store, 0.7).select("doc_id"))
    val local = run()
    val reliable = withReliableCheckpoints(run())
    assert(local == reliable)
    assert(local.nonEmpty)
  }

  test("dedup connected components identical under both modes (incl. distributed rounds)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (9L, 9L))
      .toDF("id_a", "id_b")
    def run(): Set[String] = rows(Dedup.connectedComponents(pairs))
    // force the distributed label-propagation rounds too (local solve off)
    def runDistributed(): Set[String] =
      rows(Dedup.connectedComponents(pairs, localSolveMaxEdges = 0L))
    val (l1, l2) = (run(), runDistributed())
    val (r1, r2) = withReliableCheckpoints((run(), runDistributed()))
    assert(l1 == r1)
    assert(l2 == r2)
    assert(l1 == l2)
  }
}
