package graft

/** Spark 4 ships with ANSI mode ON by default; graft sessions run it off
  * for DuckDB-oracle parity (legacy cast/division semantics), but every
  * operator should still EXECUTE under ANSI — a library that throws on
  * `spark.sql.ansi.enabled=true` isn't deployable on a stock Spark 4
  * cluster. This runs the full query surface with ANSI forced on and
  * asserts execution (not value parity — rounding/cast edge semantics may
  * legitimately differ; the oracle gate owns values).
  */
class AnsiModeSpec extends SparkSpec {

  test("every query executes under spark.sql.ansi.enabled=true") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage.take(200)}") }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
