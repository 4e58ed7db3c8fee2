package graft

import graft.plans.{GraftFunctions, GroupTopKStrategy, RewriteWindowTopK}
import org.apache.spark.sql.SparkSession

/** One-call enablement of every graft extension on a live session: the
  * SQL functions (graft_dot, graft_dot_int8, graft_quantize_int8,
  * graft_minhash, graft_simhash, graft_hyperplane_lsh, graft_winnow), the
  * GroupTopK planner strategy, and the window-top-k rewrite rule. For
  * sessions built from config, `spark.sql.extensions=graft.plans
  * .GraftExtensions` does the same at construction time.
  */
object Graft {

  /** Drop all cross-query executor state between independent benchmark
    * queries: every persisted RDD (a finished query's localCheckpoint
    * blocks — garbage once its action returned, but pinned until an
    * explicit unpersist) and the SQL relation cache. Without this, a
    * multi-hundred-query battery accumulates every query's checkpointed
    * edge lists / gap frames / rank iterates in the block manager until
    * the heap gives out (observed: the 100× ScaleBench battery OOM'd on
    * q_bfs_hops's 120M-row symmetrized edge checkpoint after ~390 prior
    * query runs). Blocking=false: eviction proceeds asynchronously, the
    * next query's timing is unaffected.
    */
  /** Process-lived checkpoint-backed frames (the SparkEntry memo layer's
    * pair tables) register their RDD ids here so the between-queries
    * reaper below can evict everything else without re-paying the shared
    * builds the memos exist to amortize.
    */
  private val pinnedRddIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Register a memoized checkpoint-backed frame as process-lived. */
  def pinForProcess(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    org.apache.spark.sql.GraftBridge.checkpointRddIds(df).foreach(pinnedRddIds.add(_))
    df
  }

  def dropQueryState(spark: org.apache.spark.sql.SparkSession,
                     thresholdBytes: Long = 4L << 30): Unit = {
    // A finished query's checkpoint blocks are garbage the moment its
    // action returns, but the block manager pins them until an explicit
    // unpersist — and letting them accumulate between queries both leaks
    // toward OOM (observed on the 100× battery) and pressures every
    // later query's execution memory. Evict them unconditionally,
    // EXCEPT the registered process-lived memo frames (pinForProcess):
    // evicting those would re-pay the shared model/pair builds once per
    // query, which is the cost the memo layer exists to amortize.
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinnedRddIds.contains(id)) rdd.unpersist(blocking = false)
    }
    // Full flush only past a storage threshold: above it even the memos
    // go (the heap-OOM guard wins), and the memo MAP is cleared in the
    // same breath — its checkpoint blocks just vanished, and handing out
    // a stale frame would throw CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND; memos
    // rebuild lazily. TWO gauges: memory blocks against `thresholdBytes`,
    // disk blocks against 4× it — localCheckpoints persist at
    // MEMORY_AND_DISK, so under memory pressure blocks evict to disk,
    // where a memory-only gauge would sit below threshold while
    // checkpoint data accumulated unboundedly on this host's slow disk.
    val info = spark.sparkContext.getRDDStorageInfo
    val usedMem = info.map(_.memSize).sum
    val usedDisk = info.map(_.diskSize).sum
    if (usedMem > thresholdBytes || usedDisk > 4 * thresholdBytes) {
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      SparkEntry.clearShared()
      pinnedRddIds.clear()
    }
  }

  /** Scratch directory for shuffle/spill files in the single-node entry
    * points: RAM-backed /dev/shm when available (this container's disk
    * writes ~3 MB/s — every shuffle write would otherwise serialize on
    * it; tmpfs measures ~13× faster here), else the JVM tmpdir. A real
    * cluster sets SPARK_LOCAL_DIRS/spark.local.dir to NVMe per executor —
    * this helper only picks the local-mode default.
    *
    * /dev/shm is used only with real headroom (≥ 4 GiB usable): spilling
    * into a near-full RAM-backed mount (Docker's 64 MB tmpfs default)
    * trades an ENOSPC/OOM for the slow disk it was avoiding. The
    * GRAFT_LOCAL_DIR env var / graft.local.dir system property override
    * both choices; SPARK_LOCAL_DIRS still wins over everything where set.
    */
  def localScratchDir: String =
    sys.env.get("GRAFT_LOCAL_DIR")
      .orElse(sys.props.get("graft.local.dir"))
      .getOrElse {
        val shm = new java.io.File("/dev/shm")
        val minFree = 4L * 1024 * 1024 * 1024
        if (shm.isDirectory && shm.canWrite && shm.getUsableSpace >= minFree)
          "/dev/shm/graft-spark-local"
        else System.getProperty("java.io.tmpdir")
      }

  /** Materialize an intermediate a query re-reads: RELIABLE checkpoint
    * when a checkpoint location is configured (cluster runs — the frame
    * survives executor loss, which executor-local blocks do not), local
    * checkpoint otherwise (single-JVM sessions, where executor loss IS
    * process death). The location comes from the SparkContext checkpoint
    * dir if set, else the `spark.graft.checkpointDir` conf (wired to the
    * context on first use). `eager = false` pipelines materialization
    * into the first job that touches the frame instead of paying a
    * barrier job per frame — the right default inside iterative loops and
    * shared-subtree caches; `eager = true` when the caller immediately
    * needs an action over the frame anyway (e.g. a count that gates the
    * algorithm).
    */
  def materialize(df: org.apache.spark.sql.DataFrame, eager: Boolean): org.apache.spark.sql.DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      df.sparkSession.conf.getOption("spark.graft.checkpointDir")
        .filter(_.nonEmpty).foreach(sc.setCheckpointDir)
    if (sc.getCheckpointDir.isDefined) df.checkpoint(eager)
    else df.localCheckpoint(eager)
  }

  def enable(spark: SparkSession): Unit = {
    GraftFunctions.register(spark)
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteWindowTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteWindowTopK
    }
  }
}
