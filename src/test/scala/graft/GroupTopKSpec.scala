package graft

import graft.plans.GroupTopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerKey returns exactly the window-rank result on a known frame") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 40.0),
      ("b", 5L, 5.0), ("b", 6L, 5.0), // tie on value → id breaks it
      ("c", 7L, 1.0)
    ).toDF("k", "id", "v")
    val top = GroupTopK.topKPerKey(df, Seq("k"), Seq($"v".desc, $"id".asc), 2)
      .select("k", "id").as[(String, Long)].collect().toSet
    assert(top === Set(("a", 4L), ("a", 2L), ("b", 5L), ("b", 6L), ("c", 7L)))
  }

  test("topKPerKey matches the window formulation on real data, any partitioning") {
    val orders = Tables.orders(spark, sfDir).repartition(7)
    val viaCustom = GroupTopK.topKPerKey(
      orders.select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq($"o_totalprice".desc, $"o_orderkey".asc), 3)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).where($"rn" <= 3)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    assert(viaCustom === viaWindow)
    assert(viaCustom.nonEmpty)
  }

  test("physical plan: heap partial below the exchange, sort only above it") {
    val df = Tables.orders(spark, sfDir).select("o_custkey", "o_orderkey", "o_totalprice")
    val top = GroupTopK.topKPerKey(df, Seq("o_custkey"), Seq($"o_totalprice".desc), 2)
    val plan = top.queryExecution.executedPlan.toString()
    assert(plan.contains("GroupTopK"), plan)
    assert(!plan.contains("Window"), plan)
    // the spill-capable sort sits on the partials' bounded output (between
    // final and exchange); the scan side below the partial must stay unsorted
    val partialSide = plan.substring(plan.lastIndexOf("GroupTopK"))
    assert(!partialSide.toLowerCase.contains("sort "), plan)
    assert(plan.indexOf("GroupTopK") < plan.indexOf("Exchange"), plan)
  }

  test("final stage fuses into whole-stage codegen (no silent fallback)") {
    // fallback=false turns a Janino compile error into a test failure
    // instead of a silent interpreted run
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
        ("b", 4L, 5.0), (null.asInstanceOf[String], 5L, 9.0), (null.asInstanceOf[String], 6L, 7.0))
        .toDF("k", "id", "v")
      val top = GroupTopK.topKPerKey(df, Seq("k"), Seq($"v".desc, $"id".asc), 1)
      // null keys form their own group; execution runs the generated code.
      // collect() on `top` ITSELF: a derived select would execute its own
      // query, leaving this one's adaptive plan unfinalized
      val got = top.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === Set(("a", 2L), ("b", 4L), (null, 5L)))
      // AQE finalizes (and codegen-collapses) the plan only on execution;
      // the `*(n)` star prefix marks operators fused into WholeStageCodegen
      // (query-stage wrappers are leaf nodes, so string-match the tree)
      val plan = top.queryExecution.executedPlan.toString()
      assert("""\*\(\d+\) GroupTopK""".r.findFirstIn(plan).isDefined,
        s"final GroupTopK not inside WholeStageCodegen:\n$plan")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("codegen and interpreted finals agree on string keys and real data") {
    val orders = Tables.orders(spark, sfDir)
    // string key exercises the UTF8String copy in the generated group test
    val byPriority = GroupTopK.topKPerKey(
      orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
      Seq("o_orderpriority"), Seq($"o_totalprice".desc, $"o_orderkey".asc), 5)
      .select("o_orderpriority", "o_orderkey").as[(String, Long)].collect().toSet
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val viaWindow = orders.withColumn("rn", row_number().over(w)).where($"rn" <= 5)
      .select("o_orderpriority", "o_orderkey").as[(String, Long)].collect().toSet
    assert(byPriority === viaWindow && byPriority.nonEmpty)
  }

  test("SQL metrics: output rows on both stages, pass-through counted on overflow") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = (1 to 2000).map(i => (i % 200, i.toLong, (i % 7).toDouble))
      .toDF("k", "id", "v").repartition(4)
    val top = GroupTopK.topKPerKey(df, Seq("k"), Seq($"v".desc, $"id".asc), 2,
      maxKeysPerTask = 4)
    top.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val gtk = flatten(top.queryExecution.executedPlan)
      .collect { case g: graft.plans.GroupTopKExec => g }
    assert(gtk.size === 2, top.queryExecution.executedPlan)
    val partial = gtk.find(_.partial).get
    val fin = gtk.find(!_.partial).get
    // 4-key map over 200 keys per task must have passed rows through
    assert(partial.metrics("passThroughRows").value > 0)
    assert(fin.metrics("numOutputRows").value === 400) // 200 keys × k=2
    assert(partial.metrics("numOutputRows").value >= 400)
  }

  test("bounded key map: pass-through overflow keeps results exact at high cardinality") {
    // 500 distinct keys but only 8 tracked per map task: most rows pass
    // through unreduced and the sorted final must still be exact
    val df = (1 to 5000).map(i => (i % 500, i.toLong, (i * 37 % 101).toDouble))
      .toDF("k", "id", "v").repartition(5)
    val viaSmallMap = GroupTopK.topKPerKey(
      df, Seq("k"), Seq($"v".desc, $"id".asc), 3, maxKeysPerTask = 8)
      .select("k", "id").as[(Int, Long)].collect().toSet
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val viaWindow = df.withColumn("rn", row_number().over(w)).where($"rn" <= 3)
      .select("k", "id").as[(Int, Long)].collect().toSet
    assert(viaSmallMap === viaWindow)
    assert(viaSmallMap.size === 1500)
  }
}
