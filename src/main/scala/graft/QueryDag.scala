package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declarative DAG-of-queries runner — the orchestration face of the
  * engine. The reference drives its pipeline with an imperative driver
  * loop (stock_data_pipeline/main.py: load each ticker, then compute each
  * sector after its members, then append), which at 100 TB becomes a
  * workflow DAG over query stages. Here a pipeline is DATA — named stages
  * with explicit dependencies — and the runner contributes exactly the
  * three behaviors a hand-rolled loop gets wrong at scale:
  *
  *  - DETERMINISTIC topological order (Kahn's algorithm with a sorted
  *    ready set): the same DAG always runs in the same order, so logs,
  *    retries and artifact diffs line up across runs and engines; cycles
  *    and unknown dependencies fail loudly before anything runs.
  *  - ONE materialization per stage: each stage's frame is eagerly
  *    checkpointed before dependents read it, so a stage consumed by k
  *    dependents computes once, not k times, and no dependent's lineage
  *    nests the whole upstream DAG (the q_pagerank lineage lesson applied
  *    to orchestration). The deliberate trade against single-query
  *    composition (q_pipeline_e2e, where Catalyst fuses all stages into
  *    one plan): a DAG boundary is a materialization barrier — compose
  *    WITHIN a stage when fusion matters, cut stages where reuse,
  *    restatement or checkpointing matter.
  *  - Per-stage RESTATEMENT: recompute a changed stage and its
  *    TRANSITIVE dependents only, reusing every untouched stage's
  *    materialized output — the daily-correction shape (restate one
  *    day's load, refresh what reads it, leave the rest of the DAG
  *    alone), mirroring Sinks.restateDays at the orchestration level.
  */
object QueryDag {

  /** One stage: `build` receives (session, data dir, upstream outputs by
    * stage name — exactly the declared deps, already materialized).
    */
  final case class Stage(
      name: String,
      deps: Seq[String],
      build: (SparkSession, String, Map[String, DataFrame]) => DataFrame)

  /** Lift a dependency-free SparkEntry-style query into a stage. */
  def ofQuery(name: String, q: (SparkSession, String) => DataFrame): Stage =
    Stage(name, Nil, (s, dir, _) => q(s, dir))

  /** Deterministic topological order (Kahn's, lexicographic tie-break).
    * Fails loudly on duplicate names, unknown deps, and cycles.
    */
  def topoOrder(stages: Seq[Stage]): Seq[Stage] = {
    val byName = stages.map(s => s.name -> s).toMap
    require(byName.size == stages.size,
      "duplicate stage names: " + stages.groupBy(_.name)
        .collect { case (n, ss) if ss.size > 1 => n }.toSeq.sorted.mkString(", "))
    for (s <- stages; d <- s.deps)
      require(byName.contains(d), s"stage '${s.name}' depends on unknown stage '$d'")
    val remaining = scala.collection.mutable.Map(stages.map(s => s.name -> s.deps.toSet): _*)
    val dependents = stages.flatMap(s => s.deps.map(_ -> s.name))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val ready = scala.collection.mutable.SortedSet[String]()
    remaining.foreach { case (n, d) => if (d.isEmpty) ready += n }
    val out = scala.collection.mutable.ArrayBuffer[Stage]()
    while (ready.nonEmpty) {
      val n = ready.head
      ready -= n
      out += byName(n)
      dependents.getOrElse(n, Nil).foreach { m =>
        val rest = remaining(m) - n
        remaining(m) = rest
        if (rest.isEmpty) ready += m
      }
    }
    require(out.size == stages.size, "dependency cycle among stages: " +
      remaining.collect { case (n, d) if d.nonEmpty => n }.toSeq.sorted.mkString(", "))
    out.toSeq
  }

  /** The changed set plus every transitive dependent — what a
    * restatement must recompute.
    */
  def affected(stages: Seq[Stage], changed: Set[String]): Set[String] = {
    val edges = stages.flatMap(s => s.deps.map(_ -> s.name))
    var acc = changed
    var grew = true
    while (grew) {
      val next = acc ++ edges.collect { case (d, n) if acc(d) => n }
      grew = next.size != acc.size
      acc = next
    }
    acc
  }

  /** Run every stage once in topological order; each output eagerly
    * materializes before its dependents read it. Returns outputs by name
    * (checkpoint-backed — consume or persist before dropQueryState).
    */
  def run(spark: SparkSession, sfDir: String, stages: Seq[Stage]): Map[String, DataFrame] = {
    val outputs = scala.collection.mutable.Map[String, DataFrame]()
    topoOrder(stages).foreach { st =>
      outputs(st.name) =
        materialize(st.build(spark, sfDir, st.deps.map(d => d -> outputs(d)).toMap))
    }
    outputs.toMap
  }

  /** Restatement: recompute the `changed` stages and their transitive
    * dependents, reusing `prior` outputs for every untouched stage.
    */
  def restate(spark: SparkSession, sfDir: String, stages: Seq[Stage],
              prior: Map[String, DataFrame], changed: Set[String]): Map[String, DataFrame] = {
    changed.foreach(c => require(stages.exists(_.name == c), s"unknown stage '$c'"))
    val dirty = affected(stages, changed)
    stages.filterNot(s => dirty(s.name)).foreach(s => require(prior.contains(s.name),
      s"restate needs the prior output of untouched stage '${s.name}'"))
    val outputs = scala.collection.mutable.Map[String, DataFrame]()
    topoOrder(stages).foreach { st =>
      outputs(st.name) =
        if (!dirty(st.name)) prior(st.name)
        else materialize(st.build(spark, sfDir, st.deps.map(d => d -> outputs(d)).toMap))
    }
    outputs.toMap
  }

  /** Stage-boundary materialization: reliable checkpoint when a
    * checkpoint dir is configured (cluster runs — outputs survive
    * executor loss between stages), executor-local pinning otherwise.
    */
  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)
}
