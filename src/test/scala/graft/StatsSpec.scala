package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-6 statistics batch: the registered queries cross-checked
  * against independent driver-side (Scala) computations on sf0.001,
  * plus plan-shape assertions for the scale-critical joins. */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.all(name).fn(spark, TestSpark.sf)

  test("q_corr matches an exact driver-side co-moment computation") {
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select($"l_returnflag",
        round($"l_quantity" * 100).cast("long").as("x"),
        round($"l_extendedprice" * 100).cast("long").as("y"))
      .as[(String, Long, Long)].collect()
    val want = li.groupBy(_._1).map { case (f, rows) =>
      val n = rows.length.toDouble
      def s(g: ((String, Long, Long)) => BigInt) = rows.map(g).sum.toDouble
      val (sx, sy) = (s(r => BigInt(r._2)), s(r => BigInt(r._3)))
      val (sxx, syy, sxy) = (s(r => BigInt(r._2) * r._2), s(r => BigInt(r._3) * r._3),
        s(r => BigInt(r._2) * r._3))
      val corr = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      f -> BigDecimal(corr).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = run("q_corr").select($"l_returnflag", $"corr_qty_price")
      .as[(String, Double)].collect().toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (f, c) => assert(got(f) == c, s"flag $f") }
    // correlations are meaningful, not degenerate
    assert(got.values.forall(c => c > -1.0 && c < 1.0))
  }

  test("q_entropy: uniform distribution hits log2(k) bits; mode ties break lexicographically") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .groupBy($"lang", $"source").count().as[(String, String, Long)].collect()
    val want = docs.groupBy(_._1).map { case (lang, rows) =>
      val n = rows.map(_._3).sum
      val slc = rows.map(r => r._3 * math.round(math.log(r._3.toDouble) * 1e9)).sum
      val h = (math.log(n.toDouble) - slc.toDouble / 1e9 / n) / math.log(2.0)
      val mode = rows.sortBy(r => (-r._3, r._2)).head._2
      lang -> ((BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, mode))
    }
    val got = run("q_entropy")
      .select($"lang", $"entropy_bits", $"mode_source")
      .as[(String, Double, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want)
    // entropy of a k-way categorical is bounded by log2(k)
    val bounds = run("q_entropy").select($"entropy_bits", $"n_sources")
      .as[(Double, Long)].collect()
    assert(bounds.forall { case (h, k) => h >= 0.0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9 })
  }

  test("q_mad_outliers matches driver-side exact median/MAD and flags only >3*MAD") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .select($"event_type", round($"value" * 100).cast("long").as("vc"))
      .as[(String, Long)].collect()
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val p = (s.length - 1) * 0.5
      val (lo, hi) = (s(p.toInt), s(math.ceil(p).toInt))
      lo + (hi - lo) * (p - p.toInt)
    }
    val want = ev.groupBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2.toDouble)
      val med = medianOf(vs)
      val dev = vs.map(v => math.abs(v - med))
      val mad = medianOf(dev)
      t -> ((med / 100.0, mad / 100.0, dev.count(_ > 3 * mad).toLong))
    }
    val got = run("q_mad_outliers")
      .select($"event_type", $"median_value", $"mad_value", $"n_outliers")
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == want)
  }

  test("corpus_dsir: strict threshold split, quartile-size selection, target-domain lift") {
    import spark.implicits._
    val got = run("corpus_dsir").as[(Long, Double, Boolean)].collect()
    val n = got.length
    val (sel, unsel) = got.partition(_._3)
    assert(sel.nonEmpty && sel.length <= n / 4 + 1, s"${sel.length} of $n selected")
    // strict > threshold split: every selected score beats every unselected one
    assert(sel.map(_._2).min > unsel.map(_._2).max)
    // directional sanity: english (target) docs should score higher on average
    val lang = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val (en, other) = got.partition(r => lang(r._1) == "en")
    val avg = (xs: Array[(Long, Double, Boolean)]) => xs.map(_._2).sum / xs.length
    assert(avg(en) > avg(other), s"en avg ${avg(en)} vs other ${avg(other)}")
  }

  test("q_equidepth: ten buckets, ~equal depth, monotone non-overlapping value ranges") {
    import spark.implicits._
    val got = run("q_equidepth").as[(Long, Long, Double, Double)].collect()
    assert(got.map(_._1).sameElements(0L until 10L))
    val total = got.map(_._2).sum
    // equal-count within 25% of ideal depth (duplicate cent values can shift ties)
    got.foreach { case (b, n, _, _) =>
      assert(math.abs(n - total / 10.0) < total * 0.025, s"bucket $b depth $n of $total") }
    got.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._4 <= w(1)._3, s"ranges overlap at bucket ${w(1)._1}") }
  }

  test("corpus_weighted_sample: ~20% kept, longer docs proportionally favored, reproducible") {
    import spark.implicits._
    val got = run("corpus_weighted_sample")
      .as[(Long, Long, Long, Boolean)].collect()
    val (in, out) = got.partition(_._4)
    assert(in.nonEmpty && math.abs(in.length - got.length * 0.2) <= got.length * 0.05)
    val mean = (xs: Array[(Long, Long, Long, Boolean)]) => xs.map(_._2).sum.toDouble / xs.length
    assert(mean(in) > mean(out), s"sampled mean ${mean(in)} !> unsampled ${mean(out)}")
    // exact determinism: a second evaluation selects the identical set
    val again = run("corpus_weighted_sample").as[(Long, Long, Long, Boolean)].collect()
    assert(got.sameElements(again))
  }

  test("text_bpe_pairs matches a driver-side recount and is a valid BPE merge candidate list") {
    import spark.implicits._
    val texts = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select($"text").as[String].collect()
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").filter(_.length >= 2).foreach { w =>
      w.sliding(2).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1)
    })
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)
    val got = run("text_bpe_pairs").as[(String, Long)].collect().toSeq
    assert(got == want)
  }

  test("q_kanon: suppressed rows are exactly the members of sub-k groups") {
    import spark.implicits._
    val got = run("q_kanon")
      .select($"event_type", $"n_small_groups", $"n_suppressed", $"n_rows")
      .as[(String, Long, Long, Long)].collect()
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .select($"event_type", hour($"ts"), $"user_id" % 50)
      .as[(String, Int, Long)].collect()
    val want = ev.groupBy(_._1).map { case (t, rows) =>
      val gs = rows.groupBy(identity).values.map(_.length.toLong).toSeq
      t -> ((gs.count(_ < 5).toLong, gs.filter(_ < 5).sum, gs.sum))
    }
    got.foreach { case (t, small, sup, n) => assert(want(t) == ((small, sup, n)), t) }
    // every small group contributes 1..4 rows
    got.foreach { case (t, small, sup, _) =>
      assert(sup >= small && sup <= small * 4, s"$t: $sup vs $small") }
  }

  test("q_benford: digits 1-9, probabilities sum to 1, chi2 terms non-negative") {
    import spark.implicits._
    val got = run("q_benford")
      .select($"digit", $"obs", $"p_benford", $"chi2_term")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(_._1).sameElements(1L to 9L))
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-6)
    assert(got.forall(_._4 >= 0))
    // synthetic uniform totals are NOT Benford -- the audit must flag them
    assert(got.map(_._4).sum > 16.92, "chi2 should reject Benford on uniform data")
  }

  test("q_heatmap: full 7x24 grid, counts sum to the event count") {
    import spark.implicits._
    val got = run("q_heatmap").as[(Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet.size == got.length)
    assert(got.forall { case (d, h, _) => d >= 0 && d <= 6 && h >= 0 && h <= 23 })
    val total = graft.sources.Tables.events(spark, TestSpark.sf).count()
    assert(got.map(_._3).sum == total)
  }

  test("text_zipf: negative slope, r2 in [0,1]") {
    import spark.implicits._
    val Array((n, slope, r2)) = run("text_zipf").as[(Long, Double, Double)].collect()
    assert(n > 0 && slope < 0, s"slope $slope")
    assert(r2 >= 0 && r2 <= 1, s"r2 $r2")
  }

  test("q_cusum matches a driver-side exact scaled-CUSUM argmax") {
    import spark.implicits._
    val hourly = graft.sources.Tables.events(spark, TestSpark.sf)
      .groupBy($"event_type", floor(unix_millis($"ts").cast("double") / 3600000)
        .cast("long").as("hr"))
      .agg(sum(round($"value" * 100).cast("long")).as("x"))
      .as[(String, Long, Long)].collect()
    val want = hourly.groupBy(_._1).map { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      val n = sorted.length.toLong
      val stot = sorted.map(_._3).sum
      var run = 0L
      val cs = sorted.zipWithIndex.map { case ((_, hr, x), i) =>
        run += x; (hr, n * run - (i + 1) * stot)
      }
      val peak = cs.maxBy { case (hr, cn) => (math.abs(cn), -hr) }
      t -> ((peak._1, peak._2))
    }
    val got = run("q_cusum")
      .select($"event_type", $"peak_hr", $"peak_cusum", $"n_hours")
      .as[(String, Long, Double, Long)].collect()
    got.foreach { case (t, hr, pc, n) =>
      val (whr, wcn) = want(t)
      assert(hr == whr, s"$t peak hour")
      assert(math.abs(pc - wcn.toDouble / n / 100.0) < 1e-6, s"$t peak value")
    }
  }

  test("q_rfm: scores in 1..5, ~20% per quintile band, segments consistent with rules") {
    import spark.implicits._
    val got = run("q_rfm")
      .select($"r_score", $"f_score", $"m_score", $"segment")
      .as[(Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (r, f, m, _) =>
      Seq(r, f, m).forall(x => x >= 1 && x <= 5) })
    // monetary is continuous -> near-exact quintiles
    val n = got.length.toDouble
    (1L to 5L).foreach { q =>
      val share = got.count(_._3 == q) / n
      assert(share > 0.15 && share < 0.25, s"m quintile $q share $share") }
    got.filter(_._4 == "champion").foreach { case (r, f, m, _) =>
      assert(r >= 4 && f >= 4 && m >= 4) }
  }

  test("q_pareto: top-decile share exceeds the uniform 10% floor and counts add up") {
    import spark.implicits._
    val Array((n, nTop, total, share)) =
      run("q_pareto").as[(Long, Long, Double, Double)].collect()
    assert(nTop < n / 5 && nTop > 0)
    assert(share > 0.1 && share < 1.0, s"share $share")
    assert(total > 0)
  }

  test("corpus_interleave: positions are unique and prefixes stay source-proportional") {
    import spark.implicits._
    val got = run("corpus_interleave")
      .select($"source", $"position").as[(String, Long)].collect()
    assert(got.map(_._2).distinct.length == got.length, "positions collide")
    // any prefix of 3*S docs contains every source at least twice
    val srcs = got.map(_._1).distinct
    val prefix = got.sortBy(_._2).take(3 * srcs.length).map(_._1)
    srcs.foreach { s =>
      assert(prefix.count(_ == s) >= 2, s"source $s underrepresented in prefix") }
  }

  test("text_vocab_growth: identities hold (types <= tokens, hapax <= types)") {
    import spark.implicits._
    val got = run("text_vocab_growth")
      .select($"n_tokens", $"n_types", $"ttr", $"hapax_share")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (tok, typ, ttr, hs) =>
      assert(typ <= tok && ttr > 0 && ttr <= 1 && hs >= 0 && hs <= 1)
      assert(math.abs(ttr - typ.toDouble / tok) < 1e-12)
    }
  }

  test("q_markov: each row of the transition matrix sums to 1") {
    import spark.implicits._
    val got = run("q_markov").select($"from_type", $"p").as[(String, Double)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (f, rows) =>
      val s = rows.map(_._2).sum
      assert(math.abs(s - 1.0) < 1e-9, s"$f sums to $s") }
  }

  test("q_autocorr: full lag set, valid correlation range, plausible pair mass") {
    import spark.implicits._
    val got = run("q_autocorr").as[(Long, Long, Double)].collect()
    assert(got.map(_._1).sameElements(1L to 7L))
    assert(got.forall { case (_, _, r) => r >= -1.0 && r <= 1.0 })
    // day coverage is gappy at tiny sf, so counts aren't monotone in
    // lag — but every lag must find a decent share of the day pairs
    val maxPairs = got.map(_._2).max
    assert(got.forall { case (_, n, _) => n > maxPairs / 2 }, got.mkString(","))
  }

  test("q_basket_lift: metrics satisfy their definitional identities") {
    import spark.implicits._
    val got = run("q_basket_lift")
      .select($"nab", $"support", $"confidence", $"lift")
      .as[(Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (nab, sup, conf, lift) =>
      assert(nab >= 3 && sup > 0 && sup <= 1 && conf >= sup && conf <= 1)
      // lift = confidence / P(b): with positive association it exceeds 1 here
      assert(lift > 1.0, s"lift $lift")
    }
    // descending lift order
    val lifts = got.map(_._4)
    assert(lifts.sameElements(lifts.sortBy(-_)))
  }

  test("corpus_dsir plan: the 1024-bucket weight table joins as broadcast, never shuffle") {
    val plan = run("corpus_dsir").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"weight join not broadcast:\n$plan")
  }

  test("q_mad_outliers plan: per-group stat tables broadcast, events never shuffled for a join") {
    val plan = run("q_mad_outliers").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"stat join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"events side got shuffled for a join:\n$plan")
  }

  test("q_gini / q_skyline plans: unpartitioned windows only ever run over a bucket spine") {
    // The r6 verdict's two scale-killers: a window with an EMPTY
    // partitionSpec serializes its whole input through one task, so
    // the only admissible ones are those whose child is the ≤32-row
    // bucket aggregate (keys b / pid) — never customer- or
    // frontier-sized data. AQE off so the full tree is walkable.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq("q_gini", "q_skyline").foreach { name =>
        val plan = run(name).queryExecution.executedPlan
        val unpart = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        assert(unpart.nonEmpty, s"$name: expected a spine window in\n$plan")
        unpart.foreach { w =>
          val spine = w.child.collectFirst {
            case a: BaseAggregateExec
                if a.groupingExpressions.nonEmpty &&
                  a.groupingExpressions.forall(e => Set("b", "pid").contains(e.name)) => a
          }
          assert(spine.isDefined,
            s"$name: single-partition window over non-spine data:\n$w")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
