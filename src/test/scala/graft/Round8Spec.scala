package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted fixtures and invariants for the round-8 tier: CUSUM
  * changepoint, HHI concentration, price elasticity, cohort LTV,
  * Kaplan–Meier survival, MIPS top-k, the dim-truncation audit, and
  * the corpus data card. */
class Round8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("cusum changepoint: planted level shift is found at the exact day") {
    import spark.implicits._
    // 5 days at 10/day then 5 days at 30/day: the CUSUM argmax is the
    // last low day (k=5), rel_dev = |T·S_5 − 5·S_T| / (T·S_T) = 0.25
    val rows = (0 until 10).flatMap { day =>
      val n = if (day < 5) 10 else 30
      Seq.fill(n)(("a", f"2024-01-${day + 1}%02d 12:00:00"))
    }
    val ev = rows.toDF("event_type", "tss")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"))
    val r = operators.Insights2.cusumChangepoint(ev).collect()
    assert(r.length == 1)
    assert(r.head.getDate(1).toString == "2024-01-05", s"cp_day = ${r.head.getDate(1)}")
    assert(r.head.getLong(2) == 10L && r.head.getLong(3) == 200L)
    assert(r.head.getDouble(4) == 0.25)
  }

  test("hhi: bounds hold on real data (Cauchy–Schwarz floor, top-share consistency)") {
    val rows = operators.Insights2.q81.build(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val hhi = r.getDouble(3); val ts = r.getDouble(4)
      assert(hhi >= 10000.0 / n - 1e-6, s"HHI below the equal-shares floor: $hhi vs 1e4/$n")
      assert(hhi <= 10000.0 + 1e-6 && ts > 0 && ts <= 1.0)
      assert(hhi >= 10000.0 * ts * ts - 1e-6, "HHI must dominate the top firm's s^2")
    }
  }

  test("price elasticity: brands populated, r2 bounded, det guards leave no Inf/NaN") {
    val rows = operators.Insights2.q82.build(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      if (!r.isNullAt(4)) {
        val r2 = r.getDouble(4)
        assert(!r2.isNaN && !r2.isInfinite && r2 >= -1e-9 && r2 <= 1 + 1e-9)
      }
      if (!r.isNullAt(2)) assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
    }
  }

  test("cohort ltv: cumulative revenue is monotone per cohort and ltv = cum/size") {
    val rows = operators.Insights2.q83.build(spark, d).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getInt(0))
    byCohort.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      sorted.foreach { r =>
        assert(r.getInt(1) >= 0)
        // ltv is crc/(100·n) in ONE tree; (crc/100)/n differs in the
        // last ulp, so compare relatively
        val ltv = r.getDouble(5); val alt = r.getDouble(4) / r.getLong(2)
        assert(math.abs(ltv - alt) <= 1e-12 * math.max(1.0, math.abs(alt)),
          s"ltv $ltv vs cum/size $alt")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getDouble(4) >= a.getDouble(4) - 1e-9)
        case _ =>
      }
    }
  }

  test("km survival: planted 3-user corpus hits the closed form, censoring honored") {
    import spark.implicits._
    // weeks w0 < w1 < w2 (w2 = corpus max). u1: w0 only (life 0,
    // churned); u2: w0..w1 (life 1, churned); u3: w0..w2 (CENSORED).
    val ev = Seq(
      ("u1", "2024-01-01 10:00:00"),
      ("u2", "2024-01-01 10:00:00"), ("u2", "2024-01-08 10:00:00"),
      ("u3", "2024-01-01 10:00:00"), ("u3", "2024-01-15 10:00:00"))
      .toDF("user_id", "tss")
      .select(col("user_id"), col("tss").cast("timestamp").as("ts"))
    val r = operators.Insights2.survivalRetention(ev).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // at-risk 3,2,1; churned 1,1,0 (u3 censored, never an event)
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq ==
      Seq((3L, 1L), (2L, 1L), (1L, 0L)))
    val lnS1 = r(1).getDouble(4)
    val expected = math.rint(math.log(2.0 / 3.0) * 1e12) / 1e12 +
      math.rint(math.log(1.0 / 2.0) * 1e12) / 1e12
    assert(math.abs(lnS1 - expected) < 1e-9, s"ln S(1): $lnS1 vs $expected")
    assert(r(2).getDouble(3) == 0.0, "censored-only tail has zero hazard")
  }

  test("mips: ranks by raw dot product, not cosine (magnitude kept)") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),             // probe
      (10L, Seq(10.0f, 0.0f)),           // ip 10, cos 1.0
      (11L, Seq(0.9f, 0.1f)),            // ip 0.9, cos ~0.994
      (12L, Seq(5.0f, 5.0f)))            // ip 5,  cos ~0.707
      .toDF("vec_id", "embedding")
    val probes = Seq(1L).toDF("vec_id")
    val r = similarity.AnnApi.mipsTopK(emb, "vec_id", "embedding", probes, k = 3)
      .collect().map(_.getLong(2)).toSeq
    assert(r == Seq(10L, 12L, 11L),
      s"MIPS order must be by dot (10, 12, 11), got $r")
  }

  test("dim audit: recall bounded, dims surfaced, full-prefix self-consistency") {
    val r = similarity.Similarity.dimAudit.build(spark, d).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getLong(1) == similarity.Similarity.DimAuditPrefix.toLong)
      assert(x.getLong(2) >= 0 && x.getLong(2) <= 5)
      assert(x.getDouble(3) == x.getLong(2).toDouble / 5.0)
    }
  }

  test("data card: sections conserve the corpus (source/lang sums = total, shares sum to 1)") {
    val rows = functions.Pipeline.dataCard.build(spark, d).collect()
    val total = rows.find(_.getString(0) == "total").get
    val n = total.getLong(2); val t = total.getLong(3)
    val srcRows = rows.filter(_.getString(0) == "source")
    val lngRows = rows.filter(_.getString(0) == "lang")
    assert(srcRows.map(_.getLong(2)).sum == n && srcRows.map(_.getLong(3)).sum == t)
    assert(lngRows.map(_.getLong(2)).sum == n)
    assert(math.abs(lngRows.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    val dup = rows.find(_.getString(0) == "dup").get
    assert(dup.getLong(2) >= 0 && dup.getLong(2) < n)
  }

  test("hits: dominant supplier tops authorities; integer scores partition-invariant") {
    import spark.implicits._
    // suppliers 100..104; supplier 100 bought by ALL 8 customers,
    // others by one each
    val co = ((1L to 8L).map(c => (c, 100L)) ++
      (1L to 4L).map(c => (c, 100L + c))).toDF("c", "p")
    def run(parts: Int) = CacheScope.withScope { implicit sc =>
      val (h, a) = operators.Graph.hits(co.repartition(parts))
      a.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    val a2 = run(2); val a13 = run(13)
    assert(a2 == a13, "integer HITS must not depend on partitioning")
    val top = a2.maxBy(_._2)._1
    assert(top == 100L, s"the universally-bought supplier must top authority: $a2")
  }

  test("pr auc: bounded, 10 points, base rate consistent with the corpus") {
    val r = operators.Analytics.mlPrAuc.build(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 10L)
    val br = row.getDouble(1); val auc = row.getDouble(2)
    assert(br > 0 && br < 1)
    // PR-AUC of any ranker is within [~0, 1]; random ≈ base rate
    assert(auc > 0 && auc <= 1.0 + 1e-9, s"auc $auc")
  }

  test("benford: planted amounts land in the exact digit bins, terms cover all 9 digits") {
    import spark.implicits._
    val amounts = Seq(1L, 25L, 3100L, 99L, 987654321L, 12L).toDF("v")
    val r = operators.Insights2.benfordAudit(amounts).collect()
    assert(r.length == 9)
    val counts = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(counts == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L,
      6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 2L), s"got $counts")
    // empty digits still owe their full expectation term N·p
    val d4 = r.find(_.getLong(0) == 4L).get
    assert(d4.getDouble(4) > 0, "absent digit owes its chi2 term")
    assert(math.abs(r.map(_.getDouble(3)).sum - 1.0) < 1e-12, "benford p sums to 1")
  }

  test("minhash fidelity: exact-dup pairs estimate J=1; estimates bounded and consistent") {
    val r = dedup.Dedup.minhashFidelityQ.build(spark, d).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val m = x.getLong(2)
      assert(m >= 0 && m <= 16)
      assert(x.getDouble(3) == m.toDouble / 16)
    }
    // every exact-Jaccard-1 pair must have all 16 coordinates matching
    r.filter(_.getDouble(4) == 1.0).foreach { x =>
      assert(x.getLong(2) == 16L, s"J=1 pair with n_match=${x.getLong(2)}")
    }
  }

  test("chi2 independence: planted independent table has zero terms, dependent does not") {
    import spark.implicits._
    // independent: o(pr, seg) = rowTotal*colTotal/N exactly
    val ind = (Seq.fill(20)(("p1", "s1")) ++ Seq.fill(20)(("p1", "s2")) ++
      Seq.fill(10)(("p2", "s1")) ++ Seq.fill(10)(("p2", "s2"))).toDF("pr", "seg")
    val ri = operators.Insights2.chi2Independence(ind).collect()
    assert(ri.length == 4)
    ri.foreach(x => assert(math.abs(x.getDouble(4)) < 1e-12,
      s"independent cell must have zero chi2 term: $x"))
    // dependent: diagonal concentration
    val dep = (Seq.fill(30)(("p1", "s1")) ++ Seq.fill(30)(("p2", "s2"))).toDF("pr", "seg")
    val rd = operators.Insights2.chi2Independence(dep).collect()
    assert(rd.length == 4, "absent cells must still be enumerated")
    assert(rd.map(_.getDouble(4)).sum > 10.0, "dependence must show in the terms")
    val absent = rd.find(x => x.getString(0) == "p1" && x.getString(1) == "s2").get
    assert(absent.getLong(2) == 0L && absent.getDouble(4) > 0,
      "absent cell owes its full expectation term")
  }

  test("tokenizer fertility: fertility >= 1 on alnum text, counts populated per lang") {
    val rows = functions.TextAnalysis.tokenizerFertility.build(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      assert(x.getLong(1) > 0 && x.getLong(2) > 0)
      assert(x.getDouble(4) >= 1.0 - 1e-9,
        "regex tokens can never be fewer than whitespace words on alnum text")
    }
  }

  test("threshold sweep: survival is monotone non-increasing and bounded") {
    val rows = dedup.Dedup.thresholdSweep.build(spark, d).collect()
    assert(rows.length == 5)
    val th = rows.map(_.getDouble(0)).toSeq
    assert(th == Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    val nc = rows.head.getLong(2)
    rows.foreach { r =>
      assert(r.getLong(2) == nc, "one shared candidate denominator")
      assert(r.getLong(1) >= 0 && r.getLong(1) <= nc)
      assert(r.getDouble(3) == r.getLong(1).toDouble / nc)
    }
    rows.map(_.getLong(1)).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "raising the threshold cannot admit pairs")
      case _ =>
    }
  }

  test("seasonal naive backtest: exactly weekly-periodic series scores zero error") {
    import spark.implicits._
    // 21 days, volume depends only on day-of-week -> lag-7 forecast exact
    val rows = (0 until 21).flatMap { day =>
      val n = 5 + (day % 7)
      Seq.fill(n)(("a", f"2024-01-${day + 1}%02d 09:00:00"))
    }
    val ev = rows.toDF("event_type", "tss")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"))
    val r = operators.Insights2.seasonalNaiveBacktest(ev).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 14L, "21 days minus the 7-day warmup")
    assert(r.head.getDouble(2) == 0.0 && r.head.getDouble(3) == 0.0,
      s"periodic series must backtest perfectly: ${r.head}")
  }
}
