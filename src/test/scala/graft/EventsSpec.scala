package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events

/** Structural properties of the event-analytics rollups (the value
  * exactness is the DuckDB oracle's job; these pin the invariants a
  * correct funnel/retention must satisfy on ANY input).
  */
class EventsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("funnel stages are monotonically non-increasing with full conversion at stage 1") {
    val rows = Events.funnel(spark, sf).collect().sortBy(_.getAs[Int]("step"))
    assert(rows.map(_.getAs[Int]("step")).toSeq === Seq(1, 2, 3))
    val users = rows.map(_.getAs[Long]("n_users"))
    assert(users(0) >= users(1) && users(1) >= users(2),
      s"a strict-order funnel can never gain users downstream: ${users.toSeq}")
    assert(users(0) > 0, "corpus has view events, stage 1 must be populated")
    assert(rows(0).getAs[Double]("conversion") === 1.0)
    val conv = rows.map(_.getAs[Double]("conversion"))
    assert(conv.forall(c => c >= 0.0 && c <= 1.0))
  }

  test("retention offset 0 is exactly 1.0 and every cell is a valid fraction") {
    val rows = Events.retention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getAs[Int]("week_offset")
      val pct = r.getAs[Double]("retention_pct")
      assert(off >= 0, s"offset before the cohort week: $off")
      assert(pct > 0.0 && pct <= 1.0, s"retention out of range: $pct")
      if (off == 0)
        assert(pct === 1.0,
          "every user is active in their own first week by construction")
    }
    // Each cohort's offset-0 cell exists (the cohort definition).
    val byCohort = rows.groupBy(_.get(0))
    byCohort.values.foreach { rs =>
      assert(rs.exists(_.getAs[Int]("week_offset") == 0))
    }
  }

  test("json props rollup matches a driver-side JSON recount exactly") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_type", "props").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // In-memory oracle: parse {"k": <int>} ourselves (no JSON lib —
    // the corpus generator emits exactly this shape).
    val K = """"k"\s*:\s*(-?\d+)""".r
    val want = ev.groupBy(_._1).map { case (t, rs) =>
      val ks = rs.flatMap(r => K.findFirstMatchIn(r._2).map(_.group(1).toLong))
      t -> ((ks.size.toLong, ks.sum, ks.min, ks.max))
    }
    val got = Events.jsonProps(spark, sf).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap
    assert(got === want)
  }

  test("z-score outliers match a driver-side recomputation exactly") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // Mirror the operator's arithmetic step for step (same IEEE order):
    // exact integer-cents moments, then mean/var/z in doubles.
    val want = ev.groupBy(_._2).flatMap { case (_, rs) =>
      val cents = rs.map(t => math.round(t._3 * 100))
      val n = cents.length.toDouble
      val s = cents.map(BigInt(_)).sum
      val ss = cents.map(c => BigInt(c) * BigInt(c)).sum
      val mean = s.toDouble / n
      val variance = ss.toDouble / n - mean * mean
      val std = math.sqrt(variance)
      rs.zip(cents).toSeq.collect {
        case ((id, _, _), c) if math.abs((c.toDouble - mean) / std) > 2.5 =>
          id -> BigDecimal((c.toDouble - mean) / std)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    val got = Events.zscoreOutliers(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("zscore")).toMap
    assert(got === want)
    assert(got.nonEmpty, "corpus should contain tail values beyond 2.5 sigma")
  }

  test("cusum paths match a driver-side replay of the recurrence exactly") {
    val hourUs = 3600L * 1000000L
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", s"unix_micros(ts) div ${hourUs}L as h")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val hmin = ev.map(_._2).min
    val hmax = ev.map(_._2).max
    val want = ev.groupBy(_._1).flatMap { case (tpe, rs) =>
      val byHour = rs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val xs = (hmin to hmax).map(h => byHour.getOrElse(h, 0L))
      val n = xs.length.toDouble
      val mean = xs.sum.toDouble / n
      val variance = xs.map(x => x * x).sum.toDouble / n - mean * mean
      val std = math.sqrt(math.max(variance, 0.0))
      val slack = 0.5 * std
      var sp = 0.0; var sn = 0.0
      xs.zipWithIndex.map { case (x, i) =>
        sp = math.max(0.0, sp + ((x.toDouble - mean) - slack))
        sn = math.max(0.0, sn + ((mean - x.toDouble) - slack))
        (tpe, hmin + i) -> ((x,
          BigDecimal(sp).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(sn).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          sp > 4.0 * std || sn > 4.0 * std))
      }
    }
    val got = Events.cusum(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    }.toMap
    assert(got.size === want.size)
    assert(got === want.toMap)
    // The detector must actually fire somewhere on the real corpus —
    // a threshold that can never alarm pins nothing.
    assert(got.values.exists(_._4), "no CUSUM alarms on the corpus")
  }

  test("value histogram buckets partition the corpus exactly") {
    val rows = Events.valueHist(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_events")).sum
    val n = graft.sources.Tables.events(spark, sf).count()
    assert(total === n, "every event falls in exactly one bucket")
    rows.foreach { r =>
      val start = r.getAs[Double]("bucket_start")
      assert(start >= 0.0 && start % 25.0 == 0.0, s"bucket start $start")
      assert(r.getAs[Long]("n_events") > 0, "empty buckets are never emitted")
    }
  }

  test("moving average over a trailing hour matches a driver-side recount") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toInstant, r.getDouble(3)))
    val want = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._2))
      sorted.map { e =>
        val tUs = e._3.getEpochSecond * 1000000L + e._3.getNano / 1000L
        val in = sorted.filter { o =>
          val oUs = o._3.getEpochSecond * 1000000L + o._3.getNano / 1000L
          oUs >= tUs - 3600L * 1000000L && oUs <= tUs
        }
        val cents = in.map(x => math.round(x._4 * 100)).sum
        val avg = BigDecimal(cents.toDouble / (in.size.toDouble * 100.0))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        e._2 -> ((in.size.toLong, avg))
      }
    }.toMap
    val got = Events.movingAvg(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_1h"), r.getAs[Double]("avg_1h")))).toMap
    assert(got === want)
  }

  test("top-20 sequence mining matches a driver-side 3-gram recount") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toInstant, r.getLong(3)))
    // In-memory oracle: per user, order by (ts, event_id), every
    // consecutive type 3-gram; top-20 under the total (n desc, e1,
    // e2, e3) order; shares as exact rounded ratios of the total.
    val grams = ev.groupBy(_._1).values.flatMap { es =>
      val o = es.sortBy(e => (e._3, e._4)).map(_._2)
      o.zip(o.drop(1)).zip(o.drop(2)).map { case ((a, b), c) => (a, b, c) }
    }.toSeq
    val counts = grams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = grams.size.toLong
    val want = counts.toSeq.map { case (k, n) => (n, k._1, k._2, k._3) }
      .sortBy { case (n, a, b, c) => (-n, a, b, c) }.take(20)

    val got = Events.sequences(spark, sf).collect().map(r =>
      (r.getLong(3), r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(4)))
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq === want)
    got.foreach { case (n, _, _, _, share) =>
      val exact = BigDecimal(n.toDouble / total.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(share === exact, s"share of $n/$total")
    }
  }

  test("transition matrix matches a driver-side recount exactly") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toInstant, r.getLong(3)))
    // In-memory oracle: per user, order by (ts, event_id), count every
    // consecutive (from, to) pair; probabilities as exact ratios.
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._3, e._4))
      ordered.zip(ordered.drop(1)).map { case (a, b) => (a._2, b._2) }
    }.toSeq
    val want = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val fromTotals = trans.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }

    val got = Events.transitions(spark, sf).collect().map { r =>
      (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))
    }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (n, p)) =>
      assert(n === want(k), s"transition count $k")
      val exact = BigDecimal(n.toDouble / fromTotals(k._1).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(p === exact, s"probability $k")
    }
    // Probabilities per from_type sum to ~1 (d4 rounding slack).
    got.groupBy(_._1._1).values.foreach { g =>
      val s = g.map(_._2._2).sum
      assert(math.abs(s - 1.0) < 0.001, s"outgoing probabilities sum to $s")
    }
  }

  test("hopping windows cover each event exactly 4 times and recount one window") {
    val rows = Events.hoppingAgg(spark, sf).collect()
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === 4 * total,
      "a 1h/15min hop covers every event with exactly 4 windows")
    // Every window start sits on a 15-minute boundary.
    rows.foreach { r =>
      val us = r.getAs[java.sql.Timestamp]("window_start").toInstant
      assert(us.toEpochMilli % (15 * 60 * 1000L) === 0L,
        s"window start off the 15-min grid: $us")
    }
    // Driver recount of the busiest window: events with
    // start <= ts < start + 1h of that type.
    val busiest = rows.maxBy(_.getAs[Long]("n_events"))
    val start = busiest.getAs[java.sql.Timestamp]("window_start").toInstant
    val want = graft.sources.Tables.events(spark, sf)
      .select("ts", "event_type").collect()
      .count { r =>
        val t = r.getTimestamp(0).toInstant
        r.getString(1) == busiest.getAs[String]("event_type") &&
          !t.isBefore(start) && t.isBefore(start.plusSeconds(3600))
      }
    assert(busiest.getAs[Long]("n_events") === want.toLong)
  }

  test("user overlap matrix matches a driver-side set recomputation exactly") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val audiences = ev.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).toSet }
    val types = audiences.keys.toSeq.sorted
    val want = (for {
      a <- types; b <- types if a < b
      inter = (audiences(a) & audiences(b)).size
      if inter > 0
    } yield (a, b) -> ((audiences(a).size.toLong, audiences(b).size.toLong,
      inter.toLong))).toMap
    val got = Events.userOverlap(spark, sf).collect().map { r =>
      (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"),
          r.getAs[Double]("jaccard")))
    }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (na, nb, nBoth, j)) =>
      val (wa, wb, wBoth) = want(k)
      assert((na, nb, nBoth) === ((wa, wb, wBoth)), s"counts for $k")
      val exact = BigDecimal(nBoth.toDouble / (na + nb - nBoth).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j === exact, s"jaccard for $k")
    }
  }

  test("ewma path matches a driver-side replay of the recurrence exactly") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant))
    val hours = ev.map { case (t, i) =>
      (t, Math.floorDiv(i.getEpochSecond * 1000000L + i.getNano / 1000L, 3600000000L))
    }
    val hmin = hours.map(_._2).min
    val hmax = hours.map(_._2).max
    val byType = hours.groupBy(_._1)
    val want = byType.flatMap { case (t, hs) =>
      val counts = hs.groupBy(_._2).map { case (h, g) => h -> g.size.toLong }
      var s = 0.0
      (hmin to hmax).zipWithIndex.map { case (h, i) =>
        val x = counts.getOrElse(h, 0L).toDouble
        val e = if (i == 0) { s = x; 0.0 } else { val d = x - s; s = s + 0.25 * d; d }
        def r4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (t, h) -> ((counts.getOrElse(h, 0L), r4(s), r4(e)))
      }
    }
    val got = Events.ewma(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4)))
    }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(v === want(k), s"ewma at $k") }
  }

  test("holt path matches a driver-side replay; a planted ramp's trend converges to its slope") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant))
    val hours = ev.map { case (t, i) =>
      (t, Math.floorDiv(i.getEpochSecond * 1000000L + i.getNano / 1000L, 3600000000L))
    }
    val hmin = hours.map(_._2).min
    val hmax = hours.map(_._2).max
    val byType = hours.groupBy(_._1)
    val (alpha, beta) = (0.25, 0.3)
    val want = byType.flatMap { case (t, hs) =>
      val counts = hs.groupBy(_._2).map { case (h, g) => h -> g.size.toLong }
      var l = 0.0; var b = 0.0
      (hmin to hmax).zipWithIndex.map { case (h, i) =>
        val x = counts.getOrElse(h, 0L).toDouble
        val e = if (i == 0) { l = x; b = 0.0; 0.0 }
                else { val f = l + b; val d = x - f; l = f + alpha * d; b = b + alpha * beta * d; d }
        def r4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (t, h) -> ((counts.getOrElse(h, 0L), r4(l), r4(b), r4(e)))
      }
    }
    val got = Events.holt(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(v === want(k), s"holt at $k") }
    // The structural claim vs EWMA: on a pure ramp x_t = 5t the trend
    // state must converge to the slope and the residual to ~0 (EWMA's
    // residual on the same ramp stays permanently nonzero).
    val ramp = (1 to 200).map(t => 5.0 * t).toArray
    var l = 0.0; var b = 0.0
    var lastErr = Double.NaN
    ramp.zipWithIndex.foreach { case (x, i) =>
      if (i == 0) { l = x; b = 0.0 }
      else { val f = l + b; val d = x - f; l = f + alpha * d; b = b + alpha * beta * d; lastErr = d }
    }
    assert(math.abs(b - 5.0) < 0.05, s"trend must converge to the slope, got $b")
    assert(math.abs(lastErr) < 0.05, s"ramp residual must vanish, got $lastErr")
  }

  test("forecast backtest equals a driver recount over both replayed paths") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant))
    val hours = ev.map { case (t, i) =>
      (t, Math.floorDiv(i.getEpochSecond * 1000000L + i.getNano / 1000L, 3600000000L))
    }
    val hmin = hours.map(_._2).min
    val hmax = hours.map(_._2).max
    val (alpha, beta) = (0.25, 0.3)
    def x10000(v: Double): Long =
      (BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000).toLongExact
    val want = hours.groupBy(_._1).map { case (t, hs) =>
      val counts = hs.groupBy(_._2).map { case (h, g) => h -> g.size.toLong }
      val xs = (hmin to hmax).map(h => counts.getOrElse(h, 0L).toDouble)
      var s = 0.0
      val ewErr = xs.zipWithIndex.map { case (x, i) =>
        if (i == 0) { s = x; 0.0 } else { val d = x - s; s = s + alpha * d; d } }
      var l = 0.0; var b = 0.0
      val hoErr = xs.zipWithIndex.map { case (x, i) =>
        if (i == 0) { l = x; b = 0.0; 0.0 }
        else { val f = l + b; val d = x - f; l = f + alpha * d; b = b + alpha * beta * d; d } }
      val n = xs.size
      def fin(sum: Long) = sum / math.max(n - 1, 1) / 10000.0
      val (ae, ah) = (ewErr.drop(1).map(e => x10000(math.abs(e))).sum,
        hoErr.drop(1).map(e => x10000(math.abs(e))).sum)
      t -> ((n, fin(ae), fin(ah),
        fin(ewErr.drop(1).map(x10000).sum), fin(hoErr.drop(1).map(x10000).sum),
        if (ah < ae) "holt" else if (ae < ah) "ewma" else "tie"))
    }
    val got = Events.forecastBacktest(spark, sf).collect().map { r =>
      r.getString(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getString(6)))
    }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(v === want(k), s"backtest at $k") }
  }

  test("kmv_sketch keeps exactly the k smallest distinct hashes, any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, xxhash64, shiftrightunsigned}
    val vals = (1L to 1000L) ++ (1L to 1000L) // duplicates must not count twice
    val df = vals.toDF("v")
      .select(shiftrightunsigned(xxhash64(col("v")), 1).as("h"))
    val want = df.distinct().collect().map(_.getLong(0)).sorted.take(64).toSeq
    Seq(df, df.repartition(7), df.repartition(31)) foreach { d =>
      val got = d.agg(graft.functions.KmvSketch.kmvSketch(col("h"), 64))
        .collect()(0).getSeq[Long](0)
      assert(got === want, "KMV retention must be the exact k-smallest-distinct fold")
    }
  }

  test("user overlap sketch is exact below capacity and bounded-error above") {
    // Below capacity (k far above any audience here): every estimate
    // must DEGRADE TO EXACT — the sketch is the full distinct hash set.
    val exactRows = Events.userOverlapSketch(spark, sf, k = 1 << 20).collect()
    assert(exactRows.nonEmpty)
    exactRows.foreach { r =>
      assert(r.getAs[Double]("est_a") === r.getAs[Long]("n_a").toDouble)
      assert(r.getAs[Double]("est_b") === r.getAs[Long]("n_b").toDouble)
      assert(r.getAs[Double]("est_both") === r.getAs[Long]("n_both").toDouble,
        s"below-capacity intersection must be exact: $r")
      assert(r.getAs[Double]("jaccard_est") === r.getAs[Double]("jaccard"))
      assert(r.getAs[Double]("rel_err") === 0.0)
    }
    // Above capacity: estimates carry KMV error ~1/sqrt(k) on the
    // union; intersections compound it. The audiences here overlap
    // heavily (high Jaccard), so a loose multiplicative band is a
    // meaningful correctness check without flaking on sketch noise.
    val est = Events.userOverlapSketch(spark, sf, k = 32).collect()
    est.foreach { r =>
      val nBoth = r.getAs[Long]("n_both").toDouble
      val got = r.getAs[Double]("est_both")
      assert(got > 0.3 * nBoth && got < 3.0 * nBoth,
        s"k=32 intersection estimate implausibly far: est=$got exact=$nBoth")
    }
    // Determinism: the sketch fold is order-independent, so two runs
    // (different job, same data) must agree bit for bit.
    val again = Events.userOverlapSketch(spark, sf, k = 32).collect()
    assert(est.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("user overlap sketch no-audit mode: same estimates, corpus touched once") {
    // The 100 TB off-switch: estimates must be IDENTICAL to the audited
    // run's estimate columns (the audit only rides alongside, never
    // feeds the sketch), and the plan must scan the events corpus
    // exactly once with no multi-distinct Expand.
    val audited = Events.userOverlapSketch(spark, sf, k = 32).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
         r.getAs[Double]("est_union"), r.getAs[Double]("est_both"),
         r.getAs[Double]("jaccard_est"))).toMap
    val df = Events.userOverlapSketch(spark, sf, k = 32, audit = false)
    val bare = df.collect()
    assert(bare.map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
      (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
       r.getAs[Double]("est_union"), r.getAs[Double]("est_both"),
       r.getAs[Double]("jaccard_est"))).toMap === audited)
    assert(!bare.head.schema.fieldNames.contains("n_both"),
      "no exact columns in the production shape")
    // Executed (AQE-final) plan: the a/b sketch sides share one
    // canonically-equal aggregation exchange, so after exchange reuse
    // the corpus is scanned exactly once.
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    val scans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("events.parquet"))
    assert(scans === 1, s"no-audit sketch must scan events once, got $scans:\n$plan")
    assert(!plan.contains("Expand"),
      s"no multi-distinct Expand without the audit:\n$plan")
  }

  test("heatmap cells tile the corpus: counts sum to the event count") {
    val rows = Events.heatmap(spark, sf).collect()
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === total)
    rows.foreach { r =>
      val (d, h) = (r.getAs[Int]("dow"), r.getAs[Int]("hour"))
      assert(d >= 0 && d <= 6 && h >= 0 && h <= 23, s"bucket out of range: $r")
    }
  }

  test("heatmap dow arithmetic lands known dates on the right weekday") {
    // 2024-01-01 was a Monday; the integer formula (day+3)%7 with
    // Monday=0 must say 0 for it and 6 for Sunday 2024-01-07.
    val us0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay * 86400000000L
    assert((us0 / 86400000000L + 3) % 7 === 0L)
    val us6 = java.time.LocalDate.of(2024, 1, 7).toEpochDay * 86400000000L
    assert((us6 / 86400000000L + 3) % 7 === 6L)
  }

  test("interarrival gap census matches the per-series row arithmetic") {
    val rows = Events.interarrival(spark, sf).collect()
    // #gaps per type = #events of the type − #distinct (user, type)
    // series (each series loses exactly its first event).
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ev.groupBy(_._2)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val expected = byType(t).length - byType(t).distinct.length
      assert(r.getAs[Long]("n_gaps") === expected.toLong,
        s"gap count wrong for $t")
      assert(r.getAs[Double]("min_gap_s") >= 0.0)
      assert(r.getAs[Double]("min_gap_s") <= r.getAs[Double]("p50_gap_s"))
      assert(r.getAs[Double]("p50_gap_s") <= r.getAs[Double]("max_gap_s"))
      assert(r.getAs[Double]("avg_gap_s") >= r.getAs[Double]("min_gap_s"))
      assert(r.getAs[Double]("avg_gap_s") <= r.getAs[Double]("max_gap_s"))
    }
  }

  test("dau_mau: period containment orders the counts, recount-exact") {
    val rows = Events.dauMau(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau, mau) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
        r.getAs[Long]("mau"))
      assert(dau >= 1 && dau <= wau && wau <= mau,
        s"a day's actives are a subset of its week's, of its month's: $r")
      assert(r.getAs[Double]("dau_mau") <= r.getAs[Double]("dau_wau") + 1e-9)
    }
    // Driver recount of one cell: the first day's DAU and its month's MAU.
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 86400000000 as day", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val firstDay = ev.map(_._1).min
    val dauExp = ev.filter(_._1 == firstDay).map(_._2).distinct.length
    assert(rows.head.getAs[Long]("dau") === dauExp.toLong)
  }

  test("native session_window sessions equal the lag sessionizer row-for-row") {
    val native = Events.sessionizeNative(spark, sf).collect()
    val lagged = Events.sessionize(spark, sf).collect()
    // session_window splits only on STRICTLY-greater gaps — the same
    // contract as the lag sessionizer (empirically: an exact 30:00
    // gap merges in both) — so the two must agree session-for-session.
    assert(native.length === lagged.length,
      s"native=${native.length} lag=${lagged.length}")
    val nativeKeys = native.map(r => (r.getAs[Long]("user_id"),
      r.getAs[java.sql.Timestamp]("session_start").getTime,
      r.getAs[java.sql.Timestamp]("session_end").getTime,
      r.getAs[Long]("n_events"))).toSet
    val lagKeys = lagged.map(r => (r.getAs[Long]("user_id"),
      r.getAs[java.sql.Timestamp]("session_start").getTime,
      r.getAs[java.sql.Timestamp]("session_end").getTime,
      r.getAs[Long]("n_events"))).toSet
    assert(nativeKeys === lagKeys, "row-for-row session parity")
    // Event conservation either way.
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(native.map(_.getAs[Long]("n_events")).sum === total)
    assert(lagged.map(_.getAs[Long]("n_events")).sum === total)
  }

  test("session_stats conserves events and sessions") {
    val rows = Events.sessionStats(spark, sf).collect()
    val totalEvents = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("n_events") * r.getAs[Long]("n_sessions")).sum
      === totalEvents, "every event lives in exactly one session")
    val share = rows.map(_.getAs[Double]("session_share")).sum
    assert(math.abs(share - 1.0) < 0.001)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_duration_s") * r.getAs[Long]("n_sessions") <=
        r.getAs[Long]("total_duration_s") + r.getAs[Long]("n_sessions"),
        "floor-average consistency")
      if (r.getAs[Long]("n_events") == 1L)
        assert(r.getAs[Long]("total_duration_s") === 0L,
          "single-event sessions have zero span")
    }
  }

  test("conversion lag histogram covers exactly the stage-2 converters") {
    val lag = Events.conversionLag(spark, sf).collect()
    val funnel = Events.funnel(spark, sf).collect()
    val n2 = funnel.find(_.getAs[Int]("step") == 2).get.getAs[Long]("n_users")
    assert(lag.map(_.getAs[Long]("n_users")).sum === n2,
      "one histogram row per view->click converter")
    lag.foreach { r =>
      val h = r.getAs[Long]("lag_hours")
      assert(h >= 0 && h <= 72, s"lag must sit inside the 72h tolerance: $r")
    }
    assert(math.abs(lag.map(_.getAs[Double]("share")).sum - 1.0) < 0.001)
  }

  test("session mix labels are sorted type sets covering all sessions") {
    val rows = Events.sessionMix(spark, sf).collect()
    val nSessions = Events.sessionize(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_sessions")).sum === nSessions)
    rows.foreach { r =>
      val parts = r.getAs[String]("mix").split('+').toSeq
      assert(parts === parts.sorted, s"mix label must be sorted: $r")
      assert(parts.distinct === parts, s"mix label must be a set: $r")
      assert(r.getAs[Double]("avg_events") >= parts.length.toDouble - 0.01,
        "a session has at least one event per type in its mix")
    }
  }

  test("weekend contrast conserves events and rates match the floors") {
    val rows = Events.weekendContrast(spark, sf).collect()
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("n_weekday_events") +
      r.getAs[Long]("n_weekend_events")).sum === total)
    rows.foreach { r =>
      val wd = r.getAs[Long]("n_weekday_events")
      val wdDays = math.max(r.getAs[Long]("n_weekday_days"), 1L)
      assert(r.getAs[Double]("weekday_rate") === (100 * wd / wdDays) / 100.0)
      assert(r.getAs[Long]("n_weekday_days") <= 23,
        "a one-month corpus has at most 23 weekdays")
      assert(r.getAs[Long]("n_weekend_days") <= 10)
      // ratio may be 0 (weekend-silent type) or NULL (weekday-silent);
      // only assert it is non-negative when defined.
      if (!r.isNullAt(r.fieldIndex("weekend_ratio")))
        assert(r.getAs[Double]("weekend_ratio") >= 0)
    }
  }

  test("dist drift conserves events, bounds tvd, and the flag matches the pin") {
    val rows = Events.distDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("n1") + r.getAs[Long]("n2")).sum === total,
      "the two halves partition the corpus: their counts must conserve it")
    rows.foreach { r =>
      val t = r.fieldIndex("tvd")
      if (r.isNullAt(t)) {
        // A half-silent type has no distribution to compare — both
        // drift columns must be NULL together, never a fake zero.
        assert(r.getAs[Long]("n1") === 0L || r.getAs[Long]("n2") === 0L)
        assert(r.isNullAt(r.fieldIndex("drifted")))
      } else {
        val tvd = r.getAs[Double](t)
        assert(tvd >= 0.0 && tvd <= 1.0, s"TVD is a probability distance: $tvd")
        assert(r.getAs[Boolean]("drifted") === (tvd >= 0.1),
          "the alarm flag IS the pinned threshold on the published score")
        // The worst bucket's moved share can't exceed the whole
        // movement: |p1_b - p2_b| <= 2*TVD (one ulp of 4-dec rounding
        // slack on each side).
        assert(r.getAs[Double]("top_shift") <= 2 * tvd + 0.0002)
        assert(r.getAs[Double]("top_bucket") % 25.0 === 0.0,
          "top_bucket is a bucket START under the width-25 rule")
      }
    }
  }

  test("lifecycle states decompose actives and churn conserves across weeks") {
    val rows = Events.userLifecycle(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") ===
        r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") +
          r.getAs[Long]("n_resurrected"),
        "every active user is exactly one of new/retained/resurrected")
    }
    // First report week: nobody has history — all new, none retained.
    assert(rows.head.getAs[Long]("n_new") === rows.head.getAs[Long]("n_active"))
    // Every user is new exactly once.
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum === nUsers)
    // Flow conservation across CONSECUTIVE weeks: next week's retained
    // = this week's actives minus its forward-churners.
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val contiguous =
          b.getAs[java.sql.Date]("week").toLocalDate ===
            a.getAs[java.sql.Date]("week").toLocalDate.plusDays(7)
        if (contiguous) {
          assert(b.getAs[Long]("n_retained") ===
            a.getAs[Long]("n_active") - a.getAs[Long]("n_churning"))
          // wow_retention is retained over the prior week's actives.
          val want = math.round(b.getAs[Long]("n_retained") * 10000.0 /
            a.getAs[Long]("n_active")) / 10000.0
          assert(b.getAs[Double]("wow_retention") === want)
        }
      case _ => ()
    }
  }

  test("streak histogram matches a driver gaps-and-islands recount") {
    val rows = Events.streaks(spark, sf).collect()
    val ud = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val perUser = ud.groupBy(_._1).map { case (u, ds) =>
      val days = ds.map(_._2).distinct.sorted
      val lens = days.foldLeft(List.empty[(Long, Long)]) {
        case ((lastDay, len) :: rest, d) if d == lastDay + 1 =>
          (d, len + 1) :: rest
        case (acc, d) => (d, 1L) :: acc
      }.map(_._2)
      (u, lens.max, days.length.toLong)
    }
    val hist = perUser.groupBy(_._2).map { case (ms, us) =>
      ms -> (us.size.toLong, us.map(_._3).sum)
    }
    assert(rows.length === hist.size)
    assert(rows.map(_.getAs[Long]("n_users")).sum === perUser.size.toLong)
    rows.foreach { r =>
      val (nUsers, sumActive) = hist(r.getAs[Long]("max_streak"))
      assert(r.getAs[Long]("n_users") === nUsers)
      assert(r.getAs[Double]("mean_active_days") ===
        math.round(sumActive * 10000.0 / nUsers) / 10000.0)
    }
  }

  test("growth curve conserves users: new sums to the base, dau splits") {
    val rows = Events.growthCurve(spark, sf).collect()
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("new_users")).sum === nUsers,
      "every user is new exactly once")
    assert(rows.last.getAs[Long]("cum_users") === nUsers)
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("new_users")
      assert(r.getAs[Long]("cum_users") === cum, "prefix sum in day order")
      assert(r.getAs[Long]("new_users") + r.getAs[Long]("returning_users")
        === r.getAs[Long]("dau"))
      assert(r.getAs[Long]("returning_users") >= 0)
    }
  }

  test("activity islands are maximal above-average runs") {
    val rows = Events.activityIslands(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("island_start").getTime)
      sorted.foreach { r =>
        val span = (r.getAs[java.sql.Timestamp]("island_end").getTime -
          r.getAs[java.sql.Timestamp]("island_start").getTime) / 3600000L
        assert(span === r.getAs[Long]("n_hours"),
          s"an island's span is exactly its hour count: $r")
        assert(r.getAs[Long]("n_events") >= r.getAs[Long]("n_hours"),
          "every island hour is above the (>=1) average")
      }
      // Maximality: consecutive islands never touch (a shared boundary
      // hour would have merged them).
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("island_end").getTime <
            b.getAs[java.sql.Timestamp]("island_start").getTime)
        case _ => ()
      }
    }
  }

  test("autocorr matches a driver-side zero-padded Pearson recount") {
    val rows = Events.autocorr(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 as hr")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val hrs = ev.filter(_._1 == t).map(_._2)
      val (lo, hi) = (hrs.min, hrs.max)
      val counts = (lo to hi).map(h => hrs.count(_ == h).toDouble).toArray
      val x = counts.dropRight(1); val y = counts.drop(1)
      val n = x.length
      val (mx, my) = (x.sum / n, y.sum / n)
      val num = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
      val den = math.sqrt(x.map(a => (a - mx) * (a - mx)).sum) *
        math.sqrt(y.map(b => (b - my) * (b - my)).sum)
      val want = num / den
      assert(math.abs(r.getAs[Double]("lag1_autocorr") - want) < 1e-3,
        s"autocorr mismatch for $t: got ${r.getAs[Double]("lag1_autocorr")} want $want")
      assert(r.getAs[Double]("lag1_autocorr").abs <= 1.0 + 1e-9)
    }
  }

  test("winsorized mean sits between the cuts and clamps ~10% of rows") {
    val rows = Events.winsorized(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wm = r.getAs[Double]("winsorized_mean")
      val (lo, hi) = (r.getAs[Double]("p5_cut"), r.getAs[Double]("p95_cut"))
      assert(wm >= lo - 1e-6 && wm <= hi + 1e-6,
        s"a clamped average must live inside its clamp range: $r")
      val n = r.getAs[Long]("n_events")
      val clamped = r.getAs[Long]("n_clamped_low") + r.getAs[Long]("n_clamped_high")
      assert(clamped <= n / 5,
        s"a 5%/95% winsorize cannot clamp over 20% of the corpus: $r")
      // Winsorizing pulls the mean toward the center: it can never
      // move OUTSIDE the plain mean's clamp of itself.
      assert(math.abs(wm - r.getAs[Double]("mean_value")) <= hi - lo + 1e-6)
    }
  }

  test("hhi bounds: 1/n_users <= hhi <= 1, effective_users <= n_users") {
    val rows = Events.hhi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h, nu) = (r.getAs[Double]("hhi"), r.getAs[Long]("n_users"))
      assert(h >= 1.0 / nu - 1e-9 && h <= 1.0,
        s"HHI must sit between uniform (1/n) and monopoly (1): $r")
      val eff = r.getAs[Double]("effective_users")
      assert(eff >= 1.0 - 1e-9 && eff <= nu + 1e-9,
        s"effective users must be within [1, n_users]: $r")
    }
  }

  test("burstiness matches a driver-side zero-padded Fano recount") {
    val rows = Events.burstiness(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 as hr")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val hrs = ev.filter(_._1 == t).map(_._2)
      val span = hrs.max - hrs.min + 1
      val counts = hrs.groupBy(identity).map(_._2.length.toLong).toArray
      val n = counts.sum
      val sumC2 = counts.map(c => c * c).sum
      assert(r.getAs[Long]("n_hours") === span)
      assert(r.getAs[Long]("n_active_hours") === counts.length.toLong)
      // Zero hours contribute to neither moment: the closed form must
      // equal the literal zero-padded unbiased variance over mean.
      val mean = n.toDouble / span
      val varNum = counts.map(c => (c - mean) * (c - mean)).sum +
        (span - counts.length) * mean * mean
      val fanoExp = varNum / (span - 1) / mean
      // The operator presents fano d4w-rounded: within half an ulp of
      // the 4th decimal of the exact recount.
      assert(math.abs(r.getAs[Double]("fano") - fanoExp) < 5.1e-5,
        s"Fano mismatch for $t: got ${r.getAs[Double]("fano")} want $fanoExp")
    }
  }

  test("mad_outliers matches a driver-side exact median/MAD recount") {
    val rows = Events.madOutliers(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2)
      else {
        // lerp at frac 0.5 over integer-valued doubles — exact in any
        // operand arrangement, same as the engine's contract.
        val (a, b) = (s(n / 2 - 1), s(n / 2)); a + (b - a) * 0.5
      }
    }
    val byType = ev.groupBy(_._1)
    assert(rows.map(_.getAs[String]("event_type")).toSet === byType.keySet)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val cents = byType(t).map { case (_, v) => math.round(v * 100).toDouble }
      val med = medianOf(cents)
      val mad = medianOf(cents.map(c => math.abs(c - med)))
      val nOut = cents.count(c => math.abs(0.6745 * (c - med) / mad) > 3.5)
      assert(r.getAs[Long]("n_events") === cents.length.toLong)
      assert(r.getAs[Long]("n_outliers") === nOut.toLong,
        s"outlier census diverged from the exact recount for $t")
      assert(r.getAs[Double]("mad_value") >= 0.0)
      assert(r.getAs[Long]("n_outliers") < cents.length / 10,
        "a 3.5-sigma robust detector cannot flag 10% of the corpus")
    }
  }

  test("mad_outliers: a tied-median (MAD=0) type yields 0 outliers and NULL max_abs_z, not an abort") {
    // The degenerate-input contract: when >=50% of a type's values equal
    // the median, MAD = 0 and the modified z is undefined. Under ANSI an
    // unguarded divide ABORTS the whole query; the NULLIF guard must
    // instead produce n_outliers = 0 and NULL max_abs_z — the same
    // semantics the DuckDB oracle's NULLIF yields. The driver corpus has
    // no tied-median type, so this plants one.
    val sparkS = spark
    import sparkS.implicits._
    val ev = Seq(
      ("flat", 500L), ("flat", 500L), ("flat", 500L), ("flat", 500L),
      ("vary", 100L), ("vary", 200L), ("vary", 300L), ("vary", 90000L))
      .toDF("event_type", "cents")
    val rows = Events.madOutliersOf(ev).collect()
    val flat = rows.find(_.getAs[String]("event_type") == "flat").get
    assert(flat.getAs[Long]("n_outliers") === 0L)
    assert(flat.isNullAt(flat.fieldIndex("max_abs_z")),
      "degenerate MAD must surface as NULL max_abs_z")
    assert(flat.getAs[Double]("mad_value") === 0.0)
    // The healthy type still detects its planted outlier.
    val vary = rows.find(_.getAs[String]("event_type") == "vary").get
    assert(vary.getAs[Long]("n_outliers") === 1L)
  }

  test("attribution: planted last-touch / direct / stale-touch journeys") {
    val sparkS = spark
    import sparkS.implicits._
    def ts(h: Long) = new java.sql.Timestamp(1700000000000L + h * 3600000L)
    // user 1: view -> purchase(10)            => view
    // user 2: purchase(20) only               => direct (no prior touch)
    // user 3: click -> [8 days] purchase(30)  => direct (stale touch)
    // user 4: view -> click -> purchase(40)   => click (LAST touch wins)
    // user 5: purchase(5) -> purchase(6)      => both direct (a purchase
    //                                            never credits a purchase)
    val ev = Seq(
      (1L, ts(0), 1L, "view", 0.0), (2L, ts(1), 1L, "purchase", 10.0),
      (3L, ts(0), 2L, "purchase", 20.0),
      (4L, ts(0), 3L, "click", 0.0), (5L, ts(8 * 24), 3L, "purchase", 30.0),
      (6L, ts(0), 4L, "view", 0.0), (7L, ts(1), 4L, "click", 0.0),
      (8L, ts(2), 4L, "purchase", 40.0),
      (9L, ts(0), 5L, "purchase", 5.0), (10L, ts(1), 5L, "purchase", 6.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
    val tmp = java.nio.file.Files.createTempDirectory("attr").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Events.attribution(spark, tmp).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_conversions"), r.getAs[Double]("attributed_revenue")))
      .toMap
    assert(got("view") === (1L, 10.0))
    assert(got("click") === (1L, 40.0))
    assert(got("direct") === (4L, 61.0))
    assert(got.keySet === Set("view", "click", "direct"))
    // Shares are exact integer ratios over the 6 conversions.
    val shares = Events.attribution(spark, tmp).collect()
      .map(r => r.getAs[String]("channel") -> r.getAs[Double]("conversion_share"))
      .toMap
    assert(shares("direct") === 0.6667)
    assert(shares("view") === 0.1667)
  }

  test("pagerank: planted one-way graph ranks the sink above the source") {
    val sparkS = spark
    import sparkS.implicits._
    def ts(h: Long) = new java.sql.Timestamp(1700000000000L + h * 3600000L)
    // 10 users, each a -> b: the only edge is a->b, so b accumulates
    // a's forwarded mass and a keeps only the teleport base.
    val ev = (1L to 10L).flatMap { u =>
      Seq((u * 2 - 1, ts(0), u, "a", 0.0), (u * 2, ts(1), u, "b", 0.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
    val tmp = java.nio.file.Files.createTempDirectory("pr").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Events.pagerank(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("rank_ppb"))
      .toMap
    assert(got.keySet === Set("a", "b"))
    // Exact integer replay: N=2, r0 = 5e8 each. a has no in-edges:
    // every round r_a = 150e6 div 2 = 75e6. b: 75e6 + 85*r_a div 100.
    assert(got("a") === 75000000L)
    var ra = 500000000L; var rb = 0L
    (1 to 5).foreach { _ =>
      rb = 75000000L + (85L * ra) / 100L
      ra = 75000000L
    }
    assert(got("b") === rb)
    // Corpus run: total rank mass is conserved up to dangling loss and
    // floor residue (<= 1e9), every type present, all ranks positive.
    val corpus = Events.pagerank(spark, sf).collect()
    assert(corpus.nonEmpty)
    assert(corpus.forall(_.getAs[Long]("rank_ppb") > 0))
    assert(corpus.map(_.getAs[Long]("rank_ppb")).sum <= 1000000000L)
  }

  test("user_features: one row per user, recounted against raw events") {
    val rows = Events.userFeatures(spark, sf).collect()
    val raw = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts)", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(rows.length === raw.map(_._1).distinct.length)
    val byUser = raw.groupBy(_._1)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val evs = byUser(u)
      assert(r.getAs[Long]("n_events") === evs.length.toLong)
      assert(r.getAs[Long]("n_types") === evs.map(_._3).distinct.length.toLong)
      val days = evs.map(_._2 / 86400000000L).distinct
      assert(r.getAs[Long]("n_active_days") === days.length.toLong)
      assert(r.getAs[Long]("n_purchases") ===
        evs.count(_._3 == "purchase").toLong)
      val firstUs = evs.map(_._2).min
      val lastUs = evs.map(_._2).max
      assert(r.getAs[Long]("lifespan_days") === (lastUs - firstUs) / 86400000000L)
      // Intensity is the exact 4-place integer ratio.
      val want = math.round(evs.length * 10000.0 / math.max(days.length, 1)) / 10000.0
      assert(r.getAs[Double]("events_per_active_day") === want)
    }
  }
}
