package graft

import org.apache.spark.sql.functions._

/** Driver-side recounts for the statistical-audit keys (q_chi_square,
  * q_mannwhitney, q_robust_scale, q_fk_integrity): each differential
  * recomputes the statistic from collected rows with independent scalar
  * arithmetic, so a formula transcription error on the Spark side can't
  * hide behind an identically-wrong oracle.
  */
class StatsAuditSpec extends SparkSpec {
  import spark.implicits._

  private def eventRows(): Array[(String, java.time.LocalDateTime, Option[Double])] = {
    val ev = graft.functions.Fns.normalizeTsNtz(Tables.events(spark, sfDir), "ts")
    ev.select($"event_type", $"ts", $"value").collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
  }

  test("q_chi_square equals a driver-side contingency recount; contributions sum to the global statistic") {
    val got = SparkEntry.queries("q_chi_square")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap

    // independent recount: java.time weekday mapped to Spark's 1=Sunday base
    val rows = eventRows()
    val cells = rows.groupBy { case (t, ts, _) =>
      val dow = ts.getDayOfWeek.getValue % 7 + 1 // Mon=1..Sun=7 -> Sun=1..Sat=7
      (t, dow)
    }.map { case (k, rs) => k -> rs.length.toLong }
    val rowTot = cells.groupBy(_._1._1).map { case (t, cs) => t -> cs.values.sum }
    val colTot = cells.groupBy(_._1._2).map { case (d, cs) => d -> cs.values.sum }
    val n = cells.values.sum.toDouble
    val chi2ByType = cells.groupBy(_._1._1).map { case (t, cs) =>
      t -> cs.map { case ((_, d), o) =>
        val e = rowTot(t).toDouble * colTot(d).toDouble / n
        (o - e) * (o - e) / e
      }.sum
    }
    assert(got.keySet === chi2ByType.keySet)
    chi2ByType.foreach { case (t, expected) =>
      val (nGot, chi2, dof) = got(t)
      assert(nGot === rowTot(t), s"type $t n")
      assert(math.abs(chi2 - expected) < 5e-4, s"type $t chi2: $chi2 vs $expected")
      assert(dof === cells.keys.count(_._1 == t) - 1, s"type $t dof")
      assert(chi2 >= 0.0)
    }
  }

  test("q_mannwhitney equals a brute-force tie-averaged rank recount") {
    val got = SparkEntry.queries("q_mannwhitney")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap

    val half = java.time.LocalDateTime.parse("2024-01-20T00:00:00")
    val rows = eventRows().collect { case (t, ts, Some(v)) => (t, v, ts.isBefore(half)) }
    val byType = rows.groupBy(_._1)
    assert(got.keySet === byType.keySet)
    byType.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      // tie-averaged ranks: average of the 1-based positions of each value run
      val ranks = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Double)]
      var i = 0
      var tieSum = 0.0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
        val avg = (i + 1 + j).toDouble / 2.0 // mean of positions i+1 .. j
        val tlen = (j - i).toDouble
        tieSum += tlen * tlen * tlen - tlen
        (i until j).foreach(k => ranks += ((sorted(k)._3, avg)))
        i = j
      }
      val n1 = ranks.count(_._1).toDouble
      val n2 = ranks.length - n1
      val r1 = ranks.collect { case (true, r) => r }.sum
      val u1 = r1 - n1 * (n1 + 1.0) / 2.0
      val nn = n1 + n2
      val sigma = math.sqrt(n1 * n2 / 12.0 * ((nn + 1.0) - tieSum / (nn * (nn - 1.0))))
      val (gn1, gn2, gu1, gz) = got(t)
      assert(gn1 === n1.toLong && gn2 === n2.toLong, s"type $t counts")
      assert(math.abs(gu1 - u1) < 1e-6, s"type $t u1: $gu1 vs $u1")
      if (sigma > 0) {
        val z = (u1 - n1 * n2 / 2.0) / sigma
        assert(math.abs(gz.get - z) < 5e-4, s"type $t z: ${gz.get} vs $z")
      }
    }
  }

  test("q_robust_scale centers the median at zero and matches a driver quartile recount") {
    val out = SparkEntry.queries("q_robust_scale")(spark, sfDir)
      .select($"event_type", $"scaled").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))

    val rows = eventRows().collect { case (t, _, Some(v)) => (t, v) }
    // DuckDB quantile_cont interpolation: (1-f)*lo + f*hi at rank q*(n-1)
    def qc(sorted: Array[Double], q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val lo = sorted(pos.toInt)
      val hi = sorted(math.ceil(pos).toInt)
      val f = pos - math.floor(pos)
      if (lo == hi) lo else (1 - f) * lo + f * hi
    }
    val byType = rows.groupBy(_._1).map { case (t, rs) =>
      val sorted = rs.map(_._2).sorted
      t -> (qc(sorted, 0.25), qc(sorted, 0.5), qc(sorted, 0.75), rs.map(_._2))
    }
    byType.foreach { case (t, (q1, med, q3, vals)) =>
      val expected = vals.map(v =>
        if (q3 - q1 == 0.0) None else Some((v - med) / (q3 - q1)))
      val gotVals = out.collect { case (`t`, s) => s }
      assert(gotVals.length === vals.length, s"type $t row count")
      // compare as sorted multisets (row order differs); the query rounds
      // to 6dp, so mirror that and allow an ulp of quartile disagreement
      val e = expected.map(_.map(x => math.rint(x * 1e6) / 1e6)).sortBy(_.getOrElse(Double.NaN))
      val g = gotVals.sortBy(_.getOrElse(Double.NaN))
      assert(e.count(_.isEmpty) === g.count(_.isEmpty), s"type $t null count")
      e.zip(g).foreach {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) < 1e-5, s"type $t scaled: $a vs $b")
        case (a, b) => assert(a.isEmpty === b.isEmpty)
      }
    }
  }

  test("q_quantile_disc equals the order statistic at ceil(q*n)") {
    val got = SparkEntry.queries("q_quantile_disc")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = eventRows().collect { case (t, _, Some(v)) => (t, v) }
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val sorted = rs.map(_._2).sorted
      def disc(q: Double) = sorted(math.ceil(q * sorted.length).toInt - 1)
      val (p50, p95) = got(t)
      assert(p50 === math.rint(disc(0.5) * 1e6) / 1e6, s"type $t p50")
      assert(p95 === math.rint(disc(0.95) * 1e6) / 1e6, s"type $t p95")
    }
  }

  test("q_attribution equals a driver walk of each user's event sequence") {
    val got = SparkEntry.queries("q_attribution")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = graft.functions.Fns.normalizeTsNtz(Tables.events(spark, sfDir), "ts")
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2), r.getString(3)))
    val credit = scala.collection.mutable.Map.empty[String, Long]
    ev.groupBy(_._1).values.foreach { rs =>
      var touch: Option[String] = None
      rs.sortBy(r => (r._2.toString, r._3)).foreach { case (_, _, _, et) =>
        if (et == "purchase") touch.foreach(t => credit(t) = credit.getOrElse(t, 0L) + 1L)
        else touch = Some(et)
      }
    }
    assert(got === credit.toMap)
  }

  test("q_time_between gap count, mean and max equal a driver recount") {
    val df = SparkEntry.queries("q_time_between")(spark, sfDir)
    val idx = df.columns.zipWithIndex.toMap
    val got = df.collect().map { r =>
      r.getString(idx("event_type")) ->
        (r.getLong(idx("n_gaps")), r.getDouble(idx("mean_gap_us")),
          r.getLong(idx("max_gap_us")))
    }.toMap
    val ev = graft.functions.Fns.normalizeTsNtz(Tables.events(spark, sfDir), "ts")
      .select($"user_id", $"event_type", $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[java.time.LocalDateTime](2), r.getLong(3)))
    val gaps = ev.groupBy(r => (r._1, r._2)).values.flatMap { rs =>
      val sorted = rs.sortBy(r => (r._3.toString, r._4))
        .map(r => r._3.toInstant(java.time.ZoneOffset.UTC))
        .map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L)
      sorted.sliding(2).collect { case Array(a, b) => b - a }
    }.toArray
    val byType = ev.groupBy(r => (r._1, r._2)).toSeq.flatMap { case ((_, t), rs) =>
      val sorted = rs.sortBy(r => (r._3.toString, r._4))
        .map(r => r._3.toInstant(java.time.ZoneOffset.UTC))
        .map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L)
      sorted.sliding(2).collect { case Array(a, b) => (t, b - a) }.toSeq
    }.groupBy(_._1)
    assert(gaps.nonEmpty)
    byType.foreach { case (t, rs) =>
      val gs = rs.map(_._2)
      val (n, mean, mx) = got(t)
      assert(n === gs.length.toLong, s"type $t n_gaps")
      assert(mx === gs.max, s"type $t max")
      assert(math.abs(mean - gs.map(BigDecimal(_)).sum.toDouble / gs.length) < 1.0,
        s"type $t mean")
    }
  }

  test("q_market_basket support/confidence/lift equal a driver basket recount") {
    // resolve column order by name instead of position
    val df = SparkEntry.queries("q_market_basket")(spark, sfDir)
    val idx = df.columns.zipWithIndex.toMap
    val rows = df.collect().map { r =>
      (r.getLong(idx("pa")), r.getLong(idx("pb"))) ->
        (r.getLong(idx("n_ab")), r.getDouble(idx("support")),
          r.getDouble(idx("confidence")), r.getDouble(idx("lift")))
    }.toMap

    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).map { case (ok, rs) => ok -> rs.map(_._2).toSet }
    val nOrders = baskets.size.toDouble
    val itemN = li.groupBy(_._2).map { case (pk, rs) => pk -> rs.length.toLong }
    val pairN = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.values.foreach { items =>
      val s = items.toArray.sorted
      for (i <- s.indices; j <- i + 1 until s.length)
        pairN((s(i), s(j))) = pairN.getOrElse((s(i), s(j)), 0L) + 1L
    }
    val expected = pairN.filter(_._2 >= 2L)
    assert(rows.keySet === expected.keySet)
    expected.foreach { case ((pa, pb), nab) =>
      val (gn, gs, gc, gl) = rows((pa, pb))
      assert(gn === nab, s"($pa,$pb) n_ab")
      assert(math.abs(gs - nab / nOrders) < 1e-6, s"($pa,$pb) support")
      assert(math.abs(gc - nab.toDouble / itemN(pa)) < 1e-6, s"($pa,$pb) confidence")
      assert(math.abs(gl - nab * nOrders / (itemN(pa).toDouble * itemN(pb))) < 1e-5,
        s"($pa,$pb) lift")
    }
  }

  test("q_cube emits all four grouping sets and they agree with the detail level") {
    val df = SparkEntry.queries("q_cube")(spark, sfDir)
    val idx = df.columns.zipWithIndex.toMap
    val rows = df.collect().map { r =>
      (Option(r.get(idx("event_type"))).map(_.toString),
        r.getLong(idx("g_type")), r.getLong(idx("g_day")),
        r.getLong(idx("n")), r.getDouble(idx("total")))
    }
    // detail cells (g_type=0, g_day=0) roll up exactly to each coarser set
    val detailN = rows.filter(r => r._2 == 0 && r._3 == 0).map(_._4).sum
    val typeOnly = rows.filter(r => r._2 == 0 && r._3 == 1)
    val dayOnly = rows.filter(r => r._2 == 1 && r._3 == 0)
    val grand = rows.filter(r => r._2 == 1 && r._3 == 1)
    assert(grand.length === 1)
    assert(grand.head._4 === detailN)
    assert(typeOnly.map(_._4).sum === detailN)
    assert(dayOnly.map(_._4).sum === detailN)
    // per-type subtotal equals the sum of that type's detail cells
    val byType = rows.filter(r => r._2 == 0 && r._3 == 0)
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._4).sum }
    typeOnly.foreach { case (t, _, _, n, _) => assert(byType(t) === n, s"type $t") }
  }

  test("q_fk_integrity orphan counts equal a driver set-difference recount") {
    val got = SparkEntry.queries("q_fk_integrity")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size === 6)

    def keys(df: org.apache.spark.sql.DataFrame, c: String): (Long, Set[Long]) =
      (df.count(), df.select(col(c).cast("long")).where(col(c).isNotNull)
        .distinct().as[Long].collect().toSet)
    def childKeys(df: org.apache.spark.sql.DataFrame, c: String): Array[Option[Long]] =
      df.select(col(c).cast("long")).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))

    val cases = Seq(
      ("lineitem.l_orderkey->orders", Tables.lineitem(spark, sfDir), "l_orderkey",
        Tables.orders(spark, sfDir), "o_orderkey"),
      ("orders.o_custkey->customer", Tables.orders(spark, sfDir), "o_custkey",
        Tables.customer(spark, sfDir), "c_custkey"),
      ("nation.n_regionkey->region", Tables.nation(spark, sfDir), "n_regionkey",
        Tables.region(spark, sfDir), "r_regionkey"))
    cases.foreach { case (name, child, ck, parent, pk) =>
      val (nRows, parents) = (child.count(), keys(parent, pk)._2)
      val orphans = childKeys(child, ck).count(k => k.isEmpty || !parents.contains(k.get))
      val (gn, go) = got(name)
      assert(gn === nRows, s"$name n_rows")
      assert(go === orphans.toLong, s"$name n_orphans: $go vs $orphans")
    }
  }
}
