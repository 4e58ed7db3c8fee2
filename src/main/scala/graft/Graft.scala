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
  def dropQueryState(spark: org.apache.spark.sql.SparkSession,
                     thresholdBytes: Long = 4L << 30): Unit = {
    // purge only past a storage-memory threshold: an unconditional drop
    // would also evict the deliberately memoized cross-query frames
    // (SparkEntry.shared — the SemDeDup pair/centroid builds three keys
    // share) and re-pay their dominant build per query. Below the
    // threshold the leak is harmless; above it the whole block manager is
    // flushed INCLUDING the memo map (its checkpoint blocks just
    // vanished — handing out a stale frame would throw
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), and memos rebuild lazily.
    // TWO gauges: memory blocks against `thresholdBytes` (the heap-OOM
    // guard), disk blocks against 4× it — localCheckpoints persist at
    // MEMORY_AND_DISK, so under memory pressure stale blocks evict to
    // disk, where a memory-only gauge would sit below threshold while
    // dead checkpoint data accumulated unboundedly on this host's slow
    // disk. Disk gets the larger budget because it doesn't threaten the
    // heap: counting it into the 4 GiB memory threshold made the purge
    // trip on nearly every bench query and re-pay the shared model
    // builds the memo exists to amortize.
    val info = spark.sparkContext.getRDDStorageInfo
    val usedMem = info.map(_.memSize).sum
    val usedDisk = info.map(_.diskSize).sum
    if (usedMem > thresholdBytes || usedDisk > 4 * thresholdBytes) {
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      SparkEntry.clearShared()
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
