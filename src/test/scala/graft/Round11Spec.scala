package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 fixtures: the ADVICE regressions (case-insensitive tracker
  * stripping, scheme-less URL pass-through) plus this round's operators. */
class Round11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("url canonicalization strips UPPERCASE tracker spellings; surviving params keep their case") {
    import spark.implicits._
    val urls = Seq(
      1L -> "http://ex.com/p?UTM_SOURCE=x&b=2",
      2L -> "http://ex.com/p?utm_source=y&b=2",
      3L -> "http://ex.com/p?REF=tw&Gclid=g&FBCLID=f&b=2",
      // 'B=2' is a DIFFERENT param than 'b=2': value case survives
      4L -> "http://ex.com/p?B=2",
      // 'reformat' is NOT 'ref' — prefix must not over-match
      5L -> "http://ex.com/p?reformat=1&b=2")
    val out = functions.UrlCanon.withCanonicalUrl(urls.toDF("doc_id", "url"), "url")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(Set(1L, 2L, 3L).map(out) == Set("http://ex.com/p?b=2"), out.toString)
    assert(out(4L) == "http://ex.com/p?B=2", out(4L))
    assert(out(5L) == "http://ex.com/p?b=2&reformat=1", out(5L))
  }

  test("scheme-less URLs canonicalize to NULL and never merge unless byte-identical") {
    import spark.implicits._
    val df = Seq(
      (1L, "s", "Foo/x"),              // relative, case-sensitive path
      (2L, "s", "foo/x"),              // distinct from 1
      (3L, "s", "foo/x"),              // byte-identical to 2 → merges with 2
      (4L, "s", "http://foo/x")        // absolute → canonicalizes normally
    ).toDF("doc_id", "source", "url")
    val canon = functions.UrlCanon.withCanonicalUrl(df, "url")
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(canon(1L).isEmpty && canon(2L).isEmpty && canon(3L).isEmpty, canon.toString)
    assert(canon(4L).contains("http://foo/x"), canon.toString)
    val st = functions.UrlCanon.urlDedupStats(df, "doc_id", "url", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // only doc 3 (byte-dup of 2) is removable; 1 vs 2 stay distinct
    assert(st.toSeq == Seq(("s", 4L, 1L)), st.toSeq.toString)
  }

  test("ffd packing: harmonic classes pack exactly k per bin, remainders re-enter, every fill <= capacity") {
    import spark.implicits._
    // capacity 10, one salt: classes are closed-form.
    //   lens 5,5,5        -> class 2: bins of 2+1, fills {10, 5}
    //   lens 3,3,3,3 (+ the len-23 doc's remainder 3) -> class 3: 5 units,
    //        bins of 3+2, fills {9, 6}
    //   len 10            -> class 1: one bin, fill 10
    //   len 1             -> class 10: one bin, fill 1
    //   len 23            -> 2 full windows (not in assignments) + rem 3
    val dl = Seq(1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 3L, 5L -> 3L, 6L -> 3L,
      7L -> 3L, 8L -> 10L, 9L -> 23L, 10L -> 1L).toDF("doc_id", "n")
    val asg = functions.Pipeline.ffdAssignmentsOfLengths(dl, 10, 1)
    val rows = asg.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 10, rows.toSeq.toString) // 9 docs <= cap + 1 remainder
    // the over-capacity doc appears only as its len-3 remainder unit
    assert(rows.filter(_._1 == 9L).toSeq.map(_._2) == Seq(3L), rows.toSeq.toString)
    val fills = rows.groupBy(r => (r._3, r._4, r._5)).map { case (k, us) =>
      (k._1, us.map(_._2).sum, us.size) }.toSeq
    assert(fills.forall(_._2 <= 10L), fills.toString)
    def cls(k: Long) = fills.filter(_._1 == k).map(f => (f._2, f._3)).sortBy(-_._1)
    assert(cls(2L) == Seq((10L, 2), (5L, 1)), cls(2L).toString)
    assert(cls(3L) == Seq((9L, 3), (6L, 2)), cls(3L).toString)
    assert(cls(1L) == Seq((10L, 1)), cls(1L).toString)
    assert(cls(10L) == Seq((1L, 1)), cls(10L).toString)
  }

  test("ffd packing: assignments are partition-invariant and salted bins never exceed capacity") {
    import spark.implicits._
    val dl = (1L to 200L).map(i => (i, 1L + (i * 7) % 40)).toDF("doc_id", "n")
    def run(parts: Int) = functions.Pipeline.ffdAssignmentsOfLengths(
      dl.repartition(parts), 40, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val a = run(1)
    assert(a == run(7), "assignments must not depend on physical partitioning")
    val fills = a.groupBy(r => (r._3, r._4, r._5)).map { case (k, us) =>
      (k, us.toSeq.map(_._2).sum, us.size) }
    assert(fills.forall(f => f._2 <= 40L), fills.filter(f => f._2 > 40L).toString)
    // k per bin: every bin in class k holds exactly k units except at
    // most one partial bin per (class, salt) bucket
    for (((k, s), bins) <- a.groupBy(r => (r._3, r._4))) {
      val sizes = bins.groupBy(_._5).map(_._2.size).toSeq
      assert(sizes.count(_ < k) <= 1, s"class $k salt $s sizes $sizes")
    }
  }

  test("bm25TopK: equal-score candidates rank by id, the probe excludes itself, term-free docs never surface") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana"),             // the probe (query = its tokens)
      (1L, "apple banana xray"),        // identical tf/dl to doc 2 → exact tie
      (2L, "apple banana yankee"),
      (3L, "apple cucumber dirt elm"),  // one query term, longer → lower score
      (4L, "zebra zebra zebra")         // no query term → absent
    ).toDF("doc_id", "text")
    val out = CacheScope.withScope { implicit s =>
      similarity.AnnApi.bm25TopK(docs, "doc_id", "text",
        docs.filter(col("doc_id") === 0L).select(col("doc_id")), 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDecimal(3)))
    }
    assert(out.forall(_._1 == 0L))
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L), out.toSeq.toString)
    val byId = out.map(r => r._2 -> ((r._3, r._4))).toMap
    assert(byId(1L)._2 == byId(2L)._2, s"docs 1 and 2 must tie exactly: $byId")
    assert(byId(1L)._1 == 1 && byId(2L)._1 == 2, s"ties break by id: $byId")
    assert(byId(3L)._1 == 3, byId.toString)
  }

  test("mixtureSample: uniform flattening up-samples the rare slice with guaranteed floor copies, down-samples the common one") {
    import spark.implicits._
    // slice a: 8 rows, slice b: 2 rows, uniform target 50/50 over N=10:
    //   rep(a) = (1e6*10) div (2*8) = 625000 ppm  -> 0 or 1 copies
    //   rep(b) = (1e6*10) div (2*2) = 2500000 ppm -> 2 or 3 copies
    val docs = ((1L to 8L).map(i => (i, "a")) ++ Seq(9L -> "b", 10L -> "b"))
      .toDF("doc_id", "src")
    val rep = functions.Pipeline.mixtureRepPpm(docs, "src")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rep == Map("a" -> 625000L, "b" -> 2500000L), rep.toString)
    val out = functions.Pipeline.mixtureSample(docs, "src")
      .select(col("src"), col("doc_id"), col("copy")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perDoc = out.groupBy(_._2).view.mapValues(_.length).toMap
    for (i <- 9L to 10L) assert(perDoc(i) >= 2 && perDoc(i) <= 3, s"b doc $i: $perDoc")
    for (i <- 1L to 8L) assert(perDoc.getOrElse(i, 0) <= 1, s"a doc $i: $perDoc")
    // copy indexes are dense 0..copies-1 per doc
    for ((id, rows) <- out.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq, s"doc $id: ${rows.toSeq}")
    // partition invariance
    val again = functions.Pipeline.mixtureSample(docs.repartition(7), "src")
      .select(col("src"), col("doc_id"), col("copy")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == again.toSet, "emission must not depend on partitioning")
    // explicit targets: 90/10 over the same slices
    val t = Seq("a" -> 900000L, "b" -> 100000L).toDF("src", "target_ppm")
    val rep2 = functions.Pipeline.mixtureRepPpm(docs, "src", Some(t))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rep2 == Map("a" -> 1125000L, "b" -> 500000L), rep2.toString)
  }

  test("percentileBands: a row EQUAL to an edge lands in the band above; degenerate tied edges collapse bands deterministically") {
    import spark.implicits._
    // group A {10,10,10,20,30}: p25 = p50 = 10 (exact order stats),
    // p75 = 20 — every 10 ties BOTH lower edges and must land in
    // p50_p75; 20 ties p75 and lands in p75_p100.
    // group B {1,2,3,4}: interpolated edges, one row per band.
    val df = (Seq(10.0, 10.0, 10.0, 20.0, 30.0).map(("A", _)) ++
      Seq(1.0, 2.0, 3.0, 4.0).map(("B", _))).toDF("g", "v")
    val out = CacheScope.withScope { implicit s =>
      operators.Insights2.percentileBands(df, "g", "v").collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(4), r.getDouble(5)))).toMap
    }
    assert(out.keySet.filter(_._1 == "A") ==
      Set(("A", "p50_p75"), ("A", "p75_p100")), out.keySet.toString)
    assert(out(("A", "p50_p75")) == ((3L, 0.6, 10.0)), out(("A", "p50_p75")).toString)
    assert(out(("A", "p75_p100")) == ((2L, 0.4, 25.0)), out(("A", "p75_p100")).toString)
    for ((band, v) <- Seq("p00_p25" -> 1.0, "p25_p50" -> 2.0, "p50_p75" -> 3.0, "p75_p100" -> 4.0))
      assert(out(("B", band)) == ((1L, 0.25, v)), s"B/$band: ${out(("B", band))}")
  }

  test("mixturePackStats: up-sampled copies pack as DISTINCT units (composite identity), bins stay within capacity") {
    import spark.implicits._
    // lang a: 1 doc, lang b: 4 docs, all 5 tokens; uniform 50/50 →
    // rep(a) = 2.5 (2-3 copies of doc 1), rep(b) = 0.625. Capacity 10
    // → every unit is class 2, bins of exactly 2 + ≤ 1 partial.
    val docs = (Seq((1L, "a")) ++ (2L to 5L).map((_, "b")))
      .map { case (i, l) => (i, l, "w w w w w") }.toDF("doc_id", "lang", "text")
    CacheScope.withScope { implicit s =>
      val mixed = functions.Pipeline.mixtureSample(docs, "lang")
        .select(col("doc_id"), col("copy")).collect().map(r => (r.getLong(0), r.getLong(1)))
      val copies1 = mixed.count(_._1 == 1L)
      assert(copies1 >= 2 && copies1 <= 3, s"doc 1 must up-sample: ${mixed.toSeq}")
      val st = functions.Pipeline.mixturePackStats(docs, "lang", capacity = 10, salts = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
      assert(st.forall(_._1 == 2L), s"every 5-token unit is class 2: ${st.toSeq}")
      val (_, nUnits, nBins, maxFill) = st.head
      // copies counted as SEPARATE units — a collided composite key
      // would merge doc 1's copies and shrink n_units below emitted
      assert(nUnits == mixed.length, s"$nUnits units vs ${mixed.length} emitted rows")
      assert(nBins == (nUnits + 1) / 2 && maxFill <= 10L, st.head.toString)
    }
  }

  test("averagePrecisionOfScores: threshold-sum closed forms with ties, at any partitioning; perfect and degenerate rankings bound it") {
    import spark.implicits._
    def ap(rows: Seq[(Double, Double)], parts: Int = 1): Double =
      CacheScope.withScope { implicit s =>
        operators.Analytics.averagePrecisionOfScores(rows.toDF("z", "y").repartition(parts))
          .collect().head.getDouble(3)
      }
    // pos {3,2}, neg {1,2}: thresholds desc 3 → P=1, 2 → P=2/3 (tie
    // collapses to one value-grain row); AP = (1 + round(2/3, 12))/2
    val tied = Seq((3.0, 1.0), (2.0, 1.0), (1.0, 0.0), (2.0, 0.0))
    val expect = (1.0 + 0.666666666667) / 2
    for (p <- Seq(1, 7)) assert(ap(tied, p) == expect, s"parts=$p: ${ap(tied, p)}")
    assert(ap(Seq((5.0, 1.0), (4.0, 1.0), (1.0, 0.0))) == 1.0, "perfect ranking")
    assert(ap(Seq((1.0, 1.0), (5.0, 0.0))) == 0.5, "positive ranked last of two")
    // all-tied: one threshold, precision = base rate
    assert(ap(Seq((2.0, 1.0), (2.0, 0.0), (2.0, 1.0))) == 1.333333333333 / 2)
  }

  test("brierOfScores: single-bin closed form (res = 0, bs = bs_binned when p is constant per bin), two-bin resolution, partition invariance") {
    import spark.implicits._
    def brier(rows: Seq[(Double, Double)], parts: Int = 1): org.apache.spark.sql.Row =
      operators.Analytics.brierOfScores(rows.toDF("z", "y").repartition(parts))
        .collect().head
    // z = 0 → p = 0.5 EXACTLY (1/(1+exp(0))); one bin, ȳ = 3/4:
    // unc = 3/16, rel = (0.5 − 0.75)² = 1/16, res = 0,
    // bs = (p − y)² mean = 1/4 = bs_binned (p constant within the bin)
    val one = brier(Seq((0.0, 1.0), (0.0, 1.0), (0.0, 1.0), (0.0, 0.0)))
    assert(one.getLong(0) == 4L && one.getLong(1) == 3L, one.toString)
    assert(one.getDouble(2) == 0.25 && one.getDouble(3) == 0.1875, one.toString)
    assert(one.getDouble(4) == 0.0625 && one.getDouble(5) == 0.0, one.toString)
    assert(one.getDouble(6) == 0.25, one.toString)
    // two bins, each pure (bin ȳ_k ∈ {0, 1}): resolution = unc (the
    // binning resolves ALL base-rate variance), reliability = the
    // per-bin squared forecast error
    val zHi = 5.0
    // p̄ of the hi bin is the 12-dp-rounded p (the DECIMAL sp discipline)
    val p12 = math.rint(1.0 / (1.0 + math.exp(-zHi)) * 1e12) / 1e12
    val two = Seq((zHi, 1.0), (zHi, 1.0), (0.0, 0.0), (0.0, 0.0))
    val r2 = brier(two)
    assert(r2.getDouble(5) == r2.getDouble(3), s"res == unc: $r2")
    val relExp = (math.rint((2.0 * (p12 - 1.0) * (p12 - 1.0)) * 1e12) / 1e12 +
      math.rint((2.0 * 0.5 * 0.5) * 1e12) / 1e12) / 4.0
    assert(math.abs(r2.getDouble(4) - relExp) < 1e-15, s"rel: $r2 vs $relExp")
    // partition invariance: DECIMAL sums are merge-order free
    val mixed = Seq((0.0, 1.0), (zHi, 0.0), (zHi, 1.0), (0.0, 0.0), (-3.0, 1.0))
    assert(brier(mixed, 1).toString == brier(mixed, 7).toString)
  }

  test("delongOfScores: tied-placement closed form at any partitioning; separable scores give se = 0 and a degenerate CI") {
    import spark.implicits._
    def dl(rows: Seq[(Double, Double)], parts: Int = 1): org.apache.spark.sql.Row =
      CacheScope.withScope { implicit s =>
        operators.Analytics.delongOfScores(rows.toDF("z", "y").repartition(parts))
          .collect().head
      }
    // pos {3, 2}, neg {2, 1}: AUC = (1 + 1 + 1 + ½)/4 = 0.875;
    // V10 = {1, ¾}, V01 = {¾, 1} (the tie at 2 places at ½), so
    // s10 = s01 = 2·(0.125)²/(2−1) = 0.03125 and
    // Var = 0.03125/2 + 0.03125/2 = 0.03125 — all dyadic, hence EXACT
    val tied = Seq((3.0, 1.0), (2.0, 1.0), (2.0, 0.0), (1.0, 0.0))
    val se = math.sqrt(0.03125)
    for (p <- Seq(1, 5)) {
      val r = dl(tied, p)
      assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"parts=$p: $r")
      assert(r.getDouble(2) == 0.875 && r.getDouble(3) == se, s"parts=$p: $r")
      assert(r.getDouble(4) == 0.875 - 1.96 * se && r.getDouble(5) == 0.875 + 1.96 * se,
        s"parts=$p: $r")
    }
    // perfectly separable: every placement equals AUC = 1 → zero
    // variance, CI collapses to the point
    val sep = dl(Seq((9.0, 1.0), (8.0, 1.0), (2.0, 0.0), (1.0, 0.0)))
    assert(sep.getDouble(2) == 1.0 && sep.getDouble(3) == 0.0, sep.toString)
    assert(sep.getDouble(4) == 1.0 && sep.getDouble(5) == 1.0, sep.toString)
  }

  test("domainStats: per-host dup rates, strict flag boundary at exactly 25%, scheme-less rows roll up under host ''") {
    import spark.implicits._
    val rows = Seq(
      // host a.com: 4 docs, 1 canonical → dup 0.75, flagged
      (1L, "http://a.com/x", "aaaa"), (2L, "HTTP://A.com:80/x#f", "bb"),
      (3L, "http://a.com/x/", "cccccc"), (4L, "http://a.com/x?utm_source=t", "dd"),
      // host b.com: 4 docs, 4 canonicals → dup 0, not flagged
      (5L, "http://b.com/1", "eee"), (6L, "http://b.com/2", "fff"),
      (7L, "http://b.com/3", "ggg"), (8L, "http://b.com/4", "hhh"),
      // host c.com: 4 docs, 3 canonicals → dup EXACTLY 0.25 → strict >
      // threshold must NOT flag
      (9L, "http://c.com/1", "i"), (10L, "http://c.com/1", "j"),
      (11L, "http://c.com/2", "k"), (12L, "http://c.com/3", "l"),
      // scheme-less → '' bucket, byte-identical pair merges
      (13L, "rel/x", "mm"), (14L, "rel/x", "nn"), (15L, "other/y", "oo"))
      .toDF("doc_id", "url", "text")
    val st = functions.UrlCanon.domainStats(rows, "doc_id", "url", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(st("a.com") == ((4L, 1L, 0.75, 3.5, 1L)), st("a.com").toString)
    assert(st("b.com") == ((4L, 4L, 0.0, 3.0, 0L)), st("b.com").toString)
    assert(st("c.com") == ((4L, 3L, 0.25, 1.0, 0L)), st("c.com").toString)
    assert(st("") == ((3L, 2L, 0.333333, 2.0, 1L)), st("").toString)
  }

  test("linkPredictionTopK: closed-form Adamic-Adar ranking, existing edges anti-joined out, hub cap excludes middles before expansion") {
    import spark.implicits._
    // square 1-2-4-3-1 with diagonal 2-3 and pendant 4-5:
    // deg: 1→2, 2→3, 3→3, 4→3, 5→1
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    def lp(maxDeg: Long) = CacheScope.withScope { implicit s =>
      operators.Graph.linkPredictionTopK(g, 20, maxDeg).collect()
    }
    val rows = lp(1000L)
    // wedge (2,3) through middle 1 IS an edge → must not appear
    assert(!rows.exists(r => r.getLong(0) == 2L && r.getLong(1) == 3L))
    val r13 = math.rint(1.0 / math.log(3.0) * 1e12) / 1e12
    val aa14 = new java.math.BigDecimal(2).multiply(
      new java.math.BigDecimal(r13)).doubleValue()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 4L), (2L, 5L), (3L, 5L)), rows.mkString("; "))
    val top = rows.head
    assert(top.getLong(2) == 2L && top.getLong(3) == 2L && top.getLong(4) == 3L, top.toString)
    assert(top.getDouble(5) == 0.666667 && top.getDouble(6) == aa14, top.toString)
    assert(rows(1).getLong(2) == 1L && rows(1).getDouble(5) == 0.333333
      && rows(1).getDouble(6) == r13, rows(1).toString)
    // cap 2: every wedge middle has deg 3 → nothing expands
    assert(lp(2L).isEmpty)
  }

  test("shapLinear: closed-form attributions with a zero-weight feature, partition invariance") {
    import spark.implicits._
    // x1 = {1,2,3} (mean 2), x2 = {1,1,1} (mean 1), w = (0, 2, −1):
    // |φ1| = {2,0,2} → mean 4/3, share 1; |φ2| ≡ 0 → share 0
    val b = Seq((1.0, 1.0, 0.0), (2.0, 1.0, 1.0), (3.0, 1.0, 0.0))
      .toDF("x1", "x2", "y")
    val w = operators.Analytics.weightsOf(spark, 0.0, 2.0, -1.0)
    for (parts <- Seq(1, 3)) {
      val rows = CacheScope.withScope { implicit s =>
        operators.Analytics.shapLinear(b.repartition(parts), w).collect()
      }
      val m = rows.map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
      assert(m("x1") == ((2.0, 4.0 / 3.0, 1.0)), s"parts=$parts: ${m("x1")}")
      assert(m("x2") == ((-1.0, 0.0, 0.0)), s"parts=$parts: ${m("x2")}")
    }
  }

  test("activeUsersRolling: island merge at the exactly-W gap, split at W+1, coverage tails count, WAU matches the brute per-day distinct") {
    import spark.implicits._
    // (user, active epoch-day): u1 {0,10} two islands; u2 {3,8} one
    // island (gap 5); u3 {20,27} ONE island (gap exactly 7 merges);
    // u5 {40,48} TWO islands (gap 8 splits); u4 {26}, u6 {47} probes
    val act = Seq(1L -> 0L, 1L -> 10L, 2L -> 3L, 2L -> 8L, 3L -> 20L,
      3L -> 27L, 4L -> 26L, 5L -> 40L, 5L -> 48L, 6L -> 47L)
    val ev = act.map { case (u, day) =>
      (u, new java.sql.Timestamp(day * 86400000L)) }.toDF("user_id", "ts")
    val out = CacheScope.withScope { implicit s =>
      operators.Insights2.activeUsersRolling(ev, "ts", "user_id").collect()
    }
    val off = Portable.EpochWeekOffsetUs / 86400000000L
    val wau = out.map(r => (r.getLong(0) - off) -> r.getLong(1)).toMap
    val expect = Map(0L -> 1L, 3L -> 2L, 8L -> 1L, 10L -> 2L, 20L -> 1L,
      26L -> 2L, 27L -> 2L, 40L -> 1L, 47L -> 1L, 48L -> 2L)
    assert(wau == expect, wau.toString)
    // brute per-day trailing-7 distinct over the same facts agrees
    val brute = expect.keys.map(d =>
      d -> act.filter { case (_, a) => a >= d - 6 && a <= d }.map(_._1).distinct.size.toLong).toMap
    assert(wau == brute, s"$wau vs $brute")
  }

  test("scorecardOfScores: every composed metric equals its standalone readout on a planted frame") {
    import spark.implicits._
    val b = Seq((1.0, 0.0, 1.0), (2.0, 1.0, 1.0), (3.0, 0.0, 0.0),
      (4.0, 1.0, 0.0), (5.0, 0.0, 1.0), (2.0, 1.0, 0.0))
      .toDF("x1", "x2", "y")
    val w = operators.Analytics.weightsOf(spark, 0.5, 1.0, -2.0)
    val card = CacheScope.withScope { implicit s =>
      operators.Analytics.scorecardOfScores(b, w).collect()
    }.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card.size == 13, card.toString)
    val (dl, ap, br, sh) = CacheScope.withScope { implicit s =>
      val zz = operators.Analytics.scoreWith(b, w)
      (operators.Analytics.delongOfScores(zz).collect().head,
        operators.Analytics.averagePrecisionOfScores(zz).collect().head,
        operators.Analytics.brierOfScores(zz).collect().head,
        operators.Analytics.shapLinear(b, w).collect())
    }
    assert(card("n1") == dl.getLong(0).toDouble && card("n0") == dl.getLong(1).toDouble)
    assert(card("auc_roc") == dl.getDouble(2) && card("se_delong") == dl.getDouble(3))
    assert(card("ci_lo") == dl.getDouble(4) && card("ci_hi") == dl.getDouble(5))
    assert(card("avg_precision") == ap.getDouble(3))
    assert(card("brier") == br.getDouble(2) && card("brier_unc") == br.getDouble(3))
    assert(card("brier_rel") == br.getDouble(4) && card("brier_res") == br.getDouble(5))
    val shm = sh.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(card("shap_share_x1") == shm("x1") && card("shap_share_x2") == shm("x2"))
  }

  test("collocationsTopK: closed-form lift with the exact IEEE tree, min-support drop, single-token docs are pair-free") {
    import spark.implicits._
    val docs = (Seq.fill(3)("red apple pie") ++ Seq.fill(2)("apple sauce jar") ++
      Seq("red jar", "x")).toDF("text")
    val rows = CacheScope.withScope { implicit s =>
      functions.TextAnalysis.collocationsTopK(docs).collect()
    }
    // N_tok = 18, N_pairs = 11; support ≥ 3 keeps only (red,apple)=3
    // and (apple,pie)=3; c_red=4, c_apple=5, c_pie=3
    def lift(cab: Long, ca: Long, cb: Long): Double =
      cab.toDouble * 18.0 / ca.toDouble * 18.0 / cb.toDouble / 11.0
    assert(rows.length == 2, rows.mkString("; "))
    val top = rows.head
    assert((top.getString(0), top.getString(1)) == (("apple", "pie")), top.toString)
    assert(top.getLong(2) == 3L && top.getLong(3) == 5L && top.getLong(4) == 3L)
    assert(top.getDouble(5) == lift(3, 5, 3), top.toString)
    assert(top.getDouble(6) == math.rint(math.log(lift(3, 5, 3)) * 1e12) / 1e12)
    val snd = rows(1)
    assert((snd.getString(0), snd.getString(1)) == (("red", "apple")))
    assert(snd.getDouble(5) == lift(3, 4, 5), snd.toString)
  }

  test("rollingRobust: even/odd window medians, MAD cutoff flags the spike and not the ramp, zero-filled hole participates") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val ev = (
      (1 to 7).map(d => ("a", t(d), 10.0)) ++ Seq(("a", t(8), 1000.0)) ++
      Seq(("b", t(1), 1.0), ("b", t(2), 3.0), ("b", t(3), 5.0), ("b", t(4), 100.0)) ++
      Seq(("c", t(1), 10.0), ("c", t(3), 10.0))  // hole at day 2 zero-fills
    ).toDF("event_type", "ts", "value")
    val out = operators.Insights2.rollingRobust(ev).collect()
      .map(r => (r.getString(0), r.getString(1).takeRight(2).toInt) ->
        ((r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))).toMap
    // 'a' day 8: window {10×6, 1000} → med 10, mad 0, spike flags
    assert(out(("a", 8)) == ((1000.0, 7L, 10.0, 0.0, 1L)), out(("a", 8)).toString)
    assert(out(("a", 7)) == ((10.0, 7L, 10.0, 0.0, 0L)), out(("a", 7)).toString)
    // 'b': even-window medians (n = 2 → 2.0; n = 4 → 4.0 with MAD 2.0)
    assert(out(("b", 2)) == ((3.0, 2L, 2.0, 1.0, 0L)), out(("b", 2)).toString)
    assert(out(("b", 3)) == ((5.0, 3L, 3.0, 2.0, 0L)), out(("b", 3)).toString)
    assert(out(("b", 4)) == ((100.0, 4L, 4.0, 2.0, 1L)), out(("b", 4)).toString)
    // 'c': the zero-filled day 2 is a real window member
    assert(out(("c", 2)) == ((0.0, 2L, 5.0, 5.0, 0L)), out(("c", 2)).toString)
    assert(out(("c", 3)) == ((10.0, 3L, 10.0, 0.0, 0L)), out(("c", 3)).toString)
  }

  test("mcnemarOfScores: continuity-corrected statistic closed forms, zero-margin counts as predicted negative, no-discordant case is NULL not 0") {
    import spark.implicits._
    def mc(rows: Seq[(Double, Double, Double)]) =
      operators.Analytics.mcnemarOfScores(rows.toDF("za", "zb", "y")).collect().head
    // n01 = 6, n10 = 1 → (|5|−1)²/7 = 16/7, below 3.841
    val r = mc(Seq.fill(2)((1.0, 1.0, 1.0)) ++ Seq.fill(6)((-1.0, 1.0, 1.0)) ++
      Seq((1.0, -1.0, 1.0), (-1.0, -1.0, 1.0)))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((10L, 3L, 8L, 6L, 1L)), r.toString)
    assert(r.getDouble(5) == 16.0 / 7.0 && r.getLong(6) == 0L, r.toString)
    // n01 = 10, n10 = 0 → 81/10 = 8.1 > 3.841 → significant
    val s = mc(Seq.fill(10)((-1.0, 1.0, 1.0)))
    assert(s.getDouble(5) == 8.1 && s.getLong(6) == 1L, s.toString)
    // za = 0 predicts NEGATIVE (the > 0 boundary): correct on y = 0
    val z = mc(Seq((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)))
    assert(z.getLong(1) == 2L && z.getLong(2) == 2L, z.toString)
    assert(z.isNullAt(5) && z.getLong(6) == 0L, z.toString)
  }

  test("kappaOfScores: closed-form 2x2 kappa, constant raters give NULL (pe = 1), not 0") {
    import spark.implicits._
    def kp(rows: Seq[(Double, Double)]) =
      operators.Analytics.kappaOfScores(rows.toDF("za", "zb")).collect().head
    // n11 = 4, n10 = 1, n01 = 2, n00 = 3 → po = 0.7, pe = 0.5, κ = 0.4
    val r = kp(Seq.fill(4)((1.0, 1.0)) ++ Seq((1.0, -1.0)) ++
      Seq.fill(2)((-1.0, 1.0)) ++ Seq.fill(3)((-1.0, -1.0)))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((10L, 4L, 1L, 2L, 3L)), r.toString)
    assert(r.getDouble(5) == 0.7 && r.getDouble(6) == 0.5 && r.getDouble(7) == 0.4, r.toString)
    // both raters constant: pe = 1 → κ undefined → NULL
    val c = kp(Seq.fill(5)((1.0, 1.0)))
    assert(c.getDouble(5) == 1.0 && c.getDouble(6) == 1.0 && c.isNullAt(7), c.toString)
    // perfect agreement with both classes present: κ = 1
    val p = kp(Seq.fill(3)((1.0, 1.0)) ++ Seq.fill(2)((-1.0, -1.0)))
    assert(p.getDouble(7) == 1.0, p.toString)
  }

  test("hosmerLemeshow: closed-form single-bin term at p = 0.5, a round(p,12) = 1 bin is excluded from stat and df") {
    import spark.implicits._
    // bin at z = 0 (p = 0.5 exactly): n = 4, pos = 3, E = 2 →
    // (3−2)²/(2·(1−0.5)) = 1.0; the z = 40 bin rounds p to 1.0 at
    // 12 dp → sp = n → degenerate, excluded from stat AND df
    val zz = (Seq.fill(3)((0.0, 1.0)) ++ Seq((0.0, 0.0)) ++
      Seq.fill(2)((40.0, 1.0))).toDF("z", "y")
    val r = operators.Analytics.hosmerLemeshowOfScores(zz).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((6L, 5L, 2L, 1L, -1L)), r.toString)
    assert(r.getDouble(5) == 1.0, r.toString)
    // df < 1: the test is UNDEFINED → verdict is NULL, not a fake
    // "not significant" 0 (the wilcoxonVerdictSql discipline)
    assert(r.isNullAt(6), r.toString)
  }

  test("mannKendall: monotone series with continuity correction, constant series is NULL (tied variance), short decline is 'none'") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    def series(tpe: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, i) => Seq.fill(c)((tpe, t(i + 1))) }
    val ev = (series("a", Seq(1, 2, 3, 4, 5)) ++ series("b", Seq(2, 2, 2)) ++
      series("c", Seq(5, 3, 1))).toDF("event_type", "ts")
    val out = operators.Insights2.mannKendall(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a") // strictly increasing: S = C(5,2) = 10, no ties
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == ((5L, 10L, 10L)), a.toString)
    assert(a.getDouble(4) == 300.0 / 18.0, a.toString)
    assert(a.getDouble(5) == 9.0 / math.sqrt(300.0 / 18.0), a.toString)
    assert(a.getString(6) == "increasing", a.toString)
    val b = out("b") // constant: every pair tied → Var = 0 → NULL, not 0
    assert(b.getLong(3) == 0L && b.getDouble(4) == 0.0, b.toString)
    assert(b.isNullAt(5) && b.isNullAt(6), b.toString)
    val c = out("c") // S = −3 over 3 days: z = −2/√(66/18) ≈ −1.04 → none
    assert(c.getLong(3) == -3L, c.toString)
    assert(c.getDouble(5) == -2.0 / math.sqrt(66.0 / 18.0), c.toString)
    assert(c.getString(6) == "none", c.toString)
  }

  test("runsTest: oscillation rejects, clustering within bounds, equal-to-mean days drop, constant series yields no row") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    def series(tpe: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, i) => Seq.fill(c)((tpe, t(i + 1))) }
    val ev = (series("a", Seq(5, 1, 5, 1, 5, 1, 5, 1, 5, 1)) ++
      series("b", Seq(5, 5, 5, 1, 1, 1)) ++
      series("c", Seq(5, 1, 5, 1, 3)) ++ // day 5 sits exactly on the mean
      series("d", Seq(2, 2))).toDF("event_type", "ts")
    val out = operators.Insights2.runsTest(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!out.contains("d"), out.keys.toString) // constant: no classified days
    val a = out("a") // perfect alternation: R = 10 vs E = 6 → z ≈ 2.68, rejects
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) ==
      ((10L, 5L, 5L, 10L)), a.toString)
    assert(a.getDouble(5) == 6.0 && a.getDouble(6) == 4.0 / math.sqrt(2000.0 / 900.0), a.toString)
    assert(a.getLong(7) == 0L, a.toString)
    val b = out("b") // two blocks: R = 2 vs E = 4 → z ≈ −1.83, within bounds
    assert(b.getLong(4) == 2L && b.getDouble(6) == -2.0 / math.sqrt(1.2), b.toString)
    assert(b.getLong(7) == 1L, b.toString)
    val c = out("c") // the mean-valued day never classifies
    assert((c.getLong(1), c.getLong(2), c.getLong(3), c.getLong(4)) ==
      ((4L, 2L, 2L, 4L)), c.toString)
    assert(c.getDouble(6) == 1.0 / math.sqrt(32.0 / 48.0) && c.getLong(7) == 1L, c.toString)
  }

  test("isotonicOfScores: PAV pools the violating pair (weighted), endpoints survive, output is monotone") {
    import spark.implicits._
    // bins via distinct z: −3 → bin 0, −1 → bin 2, 0 → bin 5, 3 → bin 9
    def bin(z: Double, n: Int, pos: Int) =
      Seq.fill(pos)((z, 1.0)) ++ Seq.fill(n - pos)((z, 0.0))
    // raw rates [.2, .4, .3, .8] → PAV pools (.4, .3) → .35
    val zz = (bin(-3.0, 10, 2) ++ bin(-1.0, 10, 4) ++ bin(0.0, 10, 3) ++
      bin(3.0, 10, 8)).toDF("z", "y")
    val out = operators.Analytics.isotonicOfScores(zz).collect()
      .map(r => r.getInt(0).toLong -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(0L) == ((10L, 2L, 0.2, 0.2)), out.toString)
    assert(out(2L) == ((10L, 4L, 0.4, 0.35)), out.toString)
    assert(out(5L) == ((10L, 3L, 0.3, 0.35)), out.toString)
    assert(out(9L) == ((10L, 8L, 0.8, 0.8)), out.toString)
    // weighted pool: (n=2, r=.5) vs (n=8, r=.25) → pooled 3/10 = 0.3
    val zw = (bin(-3.0, 2, 1) ++ bin(0.0, 8, 2)).toDF("z", "y")
    val ow = operators.Analytics.isotonicOfScores(zw).collect()
      .map(r => r.getInt(0).toLong -> r.getDouble(4)).toMap
    assert(ow == Map(0L -> 0.3, 5L -> 0.3), ow.toString)
  }

  test("hashFeaturesOf: dim/sign derive from h60, tf-weighted sums match an independent per-token computation") {
    import spark.implicits._
    val docs = Seq("alpha alpha beta", "beta gamma", "delta epsilon zeta eta")
      .toDF("text")
    // independent expectation: hash each DISTINCT token once via the
    // same Portable.h60, aggregate in Scala
    val toks = Seq("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L, "delta" -> 1L,
      "epsilon" -> 1L, "zeta" -> 1L, "eta" -> 1L)
    val hs = toks.map(_._1).toDF("tok")
      .select(col("tok"), graft.Portable.h60(col("tok")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = toks.groupBy { case (t, _) => hs(t) % 512 }
      .map { case (dim, ts) =>
        val nTok = ts.size.toLong
        val tf = ts.map(_._2).sum
        val sgn = ts.map { case (t, c) => (if ((hs(t) / 512) % 2 == 0) 1L else -1L) * c }.sum
        dim -> ((nTok, tf, sgn))
      }
    val out = functions.TextAnalysis.hashFeaturesOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == exp, s"got $out expected $exp")
    // the cut is by (total_tf DESC, dim): with 7 tokens all dims fit in top-20
    assert(out.values.map(_._2).sum == 9L, out.toString)
  }

  test("multiProbeTopK: Hamming-1 probing never loses recall vs the single-probe floor, no self-hits, ranks dense") {
    import spark.implicits._
    // deterministic synthetic 64-dim corpus (Similarity.Dim is fixed)
    val corpus = (0L until 40L).map { i =>
      (i, (0 until 64).map(j => ((i * 131 + j * 31 + 7) % 97) / 97.0 - 0.5).toArray)
    }.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") < 5).select(col("vec_id"))
    def hits(res: Array[(Long, Long)], truth: Map[Long, Set[Long]]): Int =
      res.count { case (p, c) => truth(p).contains(c) }
    val truth = similarity.AnnApi.bruteTopK(corpus, "vec_id", "embedding", probes)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (p, cs) => p -> cs.map(_._2).toSet }
    def run(flips: Int) = CacheScope.withScope { implicit s =>
      similarity.AnnApi.multiProbeTopK(corpus, "vec_id", "embedding", probes,
        flipBits = flips)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    }
    val mp = run(4)
    val sp = run(0)
    // superset candidates → recall is monotone (any displacing item
    // with higher cosine than a brute-top5 member IS a brute-top5 member)
    assert(hits(mp.map(t => (t._1, t._3)), truth) >=
      hits(sp.map(t => (t._1, t._3)), truth), s"mp ${mp.length} sp ${sp.length}")
    assert(hits(mp.map(t => (t._1, t._3)), truth) > 0)
    assert(mp.forall(t => t._1 != t._3), "no self hits")
    for ((p, rows) <- mp.groupBy(_._1))
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq, s"probe $p ranks")
  }

  test("cochranQOfScores: all-integer closed forms, full-agreement gives NULL, strong discordance rejects") {
    import spark.implicits._
    def cq(rows: Seq[(Double, Double, Double, Double)]) =
      operators.Analytics.cochranQOfScores(rows.toDF("za", "zb", "zc", "y")).collect().head
    // 6 all-correct + 2 A-only + 1 B-only + 1 none:
    // G = (8, 7, 6), T = 21, ΣL² = 57 → Q = 2(3·149 − 441)/6 = 2.0
    val r = cq(Seq.fill(6)((1.0, 1.0, 1.0, 1.0)) ++
      Seq.fill(2)((1.0, -1.0, -1.0, 1.0)) ++ Seq((-1.0, 1.0, -1.0, 1.0)) ++
      Seq((-1.0, -1.0, -1.0, 1.0)))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((10L, 8L, 7L, 6L, 21L, 57L)), r.toString)
    assert(r.getDouble(6) == 2.0 && r.getLong(7) == 0L, r.toString)
    // every row decided identically by all three → zero discordance → NULL
    val u = cq(Seq.fill(4)((1.0, 1.0, 1.0, 1.0)) ++ Seq.fill(3)((-1.0, -1.0, -1.0, 1.0)))
    assert(u.isNullAt(6) && u.getLong(7) == 0L, u.toString)
    // A correct everywhere, B and C never: Q = 2(1200 − 400)/40 = 40 → rejects
    val s = cq(Seq.fill(20)((1.0, -1.0, -1.0, 1.0)))
    assert(s.getDouble(6) == 40.0 && s.getLong(7) == 1L, s.toString)
  }

  test("spearmanOfScores: monotone maps give rho 1/-1, midrank ties match the replicated fold, constant column is NULL") {
    import spark.implicits._
    def sp(rows: Seq[(Double, Double)]) = CacheScope.withScope { implicit s =>
      operators.Analytics.spearmanOfScores(rows.toDF("za", "zb")).collect().head
    }
    val up = sp((1 to 5).map(i => (i.toDouble, (i * i).toDouble)))
    assert(math.abs(up.getDouble(1) - 1.0) < 1e-12, up.toString)
    val dn = sp((1 to 5).map(i => (i.toDouble, -i.toDouble)))
    assert(math.abs(dn.getDouble(1) + 1.0) < 1e-12, dn.toString)
    // ties: replicate the normalized-midrank Pearson fold exactly
    val rows = Seq((1.0, 3.0), (1.0, 1.0), (2.0, 1.0), (3.0, 2.0))
    def fracRank(vs: Seq[Double]): Map[Double, Double] = {
      val n = vs.size
      vs.groupBy(identity).map { case (v, g) =>
        val below = vs.count(_ < v)
        v -> (2.0 * below + g.size + 1).toDouble / (2.0 * n)
      }
    }
    val (ru, rv) = (fracRank(rows.map(_._1)), fracRank(rows.map(_._2)))
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val (su, sv) = (rows.map(r => r12(ru(r._1))).sum, rows.map(r => r12(rv(r._2))).sum)
    val suv = rows.map(r => r12(ru(r._1) * rv(r._2))).sum
    val su2 = rows.map(r => r12(ru(r._1) * ru(r._1))).sum
    val sv2 = rows.map(r => r12(rv(r._2) * rv(r._2))).sum
    val n = rows.size.toDouble
    val exp = (n * suv.toDouble - su.toDouble * sv.toDouble) /
      math.sqrt((n * su2.toDouble - su.toDouble * su.toDouble) *
        (n * sv2.toDouble - sv.toDouble * sv.toDouble))
    val t = sp(rows)
    assert(t.getDouble(1) == exp, s"${t.getDouble(1)} vs $exp")
    // constant za: zero rank variance → NULL
    assert(sp(Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0))).isNullAt(1))
  }

  test("acf/ljung-box: alternating series closed forms, a zero-filled hole participates, constant series is NULL") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    def series(tpe: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, i) => Seq.fill(c)((tpe, t(i + 1))) }
    // NOTE: a trailing zero-count day generates no rows, so the
    // calendar ends at the LAST OBSERVED day — series end on a count.
    // 'a': [4,0,4,0,4] (n=5) → acf1 = −384/480, acf2 = 272/480
    // 'b': days 1 and 3 only — the day-2 hole zero-fills and must
    //      participate: acf1 = −16/24
    // 'c': constant → zero variance → NULL
    val ev = (series("a", Seq(4, 0, 4, 0, 4)) ++
      Seq(("b", t(1)), ("b", t(1)), ("b", t(3)), ("b", t(3))) ++
      series("c", Seq(5, 5)) ++
      series("d", Seq(3, 0, 3, 0, 3, 0, 3, 0, 3))).toDF("event_type", "ts")
    // the gates read an events table from a directory — plant one
    val dir = java.nio.file.Files.createTempDirectory("graft-acf").toString
    ev.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = operators.Insights2.q101.build(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out(("a", 1L)) == Some(-384.0 / 480.0), out(("a", 1L)).toString)
    assert(out(("a", 2L)) == Some(272.0 / 480.0), out(("a", 2L)).toString)
    assert(out(("b", 1L)) == Some(-16.0 / 24.0), out(("b", 1L)).toString)
    assert(out(("c", 1L)) == None, out(("c", 1L)).toString)
    // Ljung–Box: 'a' has only 4 possible lags (n = 5) → NULL propagates;
    // 'd' (n = 9) has all 7 — replicate the all-integer acf components
    // independently from the raw series, then the same IEEE tree
    val lb = operators.Insights2.q102.build(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(2)) None else Some(r.getDouble(2))),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(lb("a") == ((None, None)), lb("a").toString)
    assert(lb("c") == ((None, None)), lb("c").toString)
    val xs = Seq(3L, 0L, 3L, 0L, 3L, 0L, 3L, 0L, 3L)
    val n = xs.size
    val s = xs.sum
    val ss = xs.map(x => x * x).sum
    def acfK(k: Int): Double = {
      val sxy = (k until n).map(i => xs(i) * xs(i - k)).sum
      val sa = (k until n).map(xs).sum
      val sb = (0 until n - k).map(xs).sum
      val num = BigInt(n) * n * sxy - BigInt(n) * s * (sa + sb) + BigInt(n - k) * s * s
      val den = BigInt(n) * n * ss - BigInt(n) * s * s
      num.toDouble / den.toDouble
    }
    val expQ = n.toDouble * (n + 2).toDouble *
      (1 to 7).map(k => acfK(k) * acfK(k) / (n - k).toDouble).reduceLeft(_ + _)
    assert(lb("d")._1 == Some(expQ), s"${lb("d")} vs $expQ")
    assert(lb("d")._2 == Some(0L), "alternation is structure, not white noise")
  }

  test("spanCorruption: sentinel assembly matches a Scala reconstruction, no-span docs keep their bytes, counts bound") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val text = "a b c d e f g" // 7 tokens → blocks [a b c][d e f][g]
    val docs = (1L to 50L).map(i => (i, text)).toDF("doc_id", "text")
    // replicate the per-(doc, block) selection with the same portable hash
    val sel = docs.selectExpr("doc_id",
      s"""filter(sequence(0, 2), b -> CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', CAST(b AS STRING))),1,15),16,10) AS BIGINT) % 100 < ${functions.Pipeline.SpanMaskPct}) AS selb""")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val out = functions.Pipeline.spanCorruption(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val blocks = Seq("a b c", "d e f", "g")
    for (i <- 1L to 50L) {
      val sb = sel(i)
      val r = out(i)
      val corrupted = (0 to 2).map(b =>
        if (sb.contains(b)) s"<extra_id_${sb.count(_ < b)}>" else blocks(b)).mkString(" ")
      val target = sb.map(b => s"<extra_id_${sb.count(_ < b)}> ${blocks(b)}").mkString(" ")
      assert(r.getLong(3) == sb.size.toLong, s"doc $i n_spans")
      assert(r.getLong(4) == sb.map(b => math.min(3, 7 - b * 3)).sum.toLong, s"doc $i n_masked")
      assert(r.getString(6) == md5hex(corrupted), s"doc $i corrupted")
      assert(r.getString(7) == md5hex(target), s"doc $i target")
      if (sb.isEmpty) assert(r.getString(6) == md5hex(text) && r.getString(7) == md5hex(""))
    }
    // the 15% rate shows up across (doc, block) draws — loose sanity bound
    val masked = sel.values.map(_.size).sum
    assert(masked > 0 && masked < 70, s"selected blocks: $masked of 150")
  }

  test("localClustering: triangle corners credit all three nodes, pendant and leaf nodes drop, buckets aggregate exactly") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 4 on node 1; star center 10 over 11..14
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L)).toDF("u", "v")
    val out = CacheScope.withScope { implicit s =>
      operators.Graph.localClustering(e).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    }
    // bucket 2 = deg ∈ [2,4): nodes 1 (deg 3, cc 1/3), 2 and 3 (deg 2, cc 1)
    // avg = (1000000 + 1000000 + 333333) / 3e6
    assert(out(2L) == ((3L, 3L, 5L, 2333333.0 / 3000000.0)), out(2L).toString)
    // bucket 4: the triangle-free star center; leaves (deg 1) are absent
    assert(out(4L) == ((1L, 0L, 6L, 0.0)), out(4L).toString)
    assert(out.size == 2, out.toString)
  }

  test("oovRateOf: vocab cut is (count DESC, token ASC) over the train split only, held-out OOV matches a Scala replication") {
    import spark.implicits._
    val texts = Seq("aa bb", "aa cc", "bb cc dd", "aa aa ee", "dd ee", "cc aa bb")
    val docs = (1L to 60L).map(i => (i, if (i % 2 == 0) "en" else "de",
      texts((i % texts.size).toInt))).toDF("doc_id", "lang", "text")
    // replicate the content-stable split assignment
    val isTrain = docs.select(col("doc_id"),
        (pmod(graft.Portable.h60(col("doc_id").cast("string")), lit(100)) < 90).as("t"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val rows = (1L to 60L).map(i => (i, if (i % 2 == 0) "en" else "de",
      texts((i % texts.size).toInt).split(" ").toSeq))
    val trainToks = rows.filter(r => isTrain(r._1)).flatMap(_._3)
    val vocab = trainToks.groupBy(identity).toSeq
      .sortBy { case (t, g) => (-g.size, t) }.take(2).map(_._1).toSet
    val exp = rows.filterNot(r => isTrain(r._1))
      .flatMap(r => r._3.map(t => (r._2, t)))
      .groupBy(_._1).map { case (lang, ts) =>
        lang -> ((ts.size.toLong, ts.count(t => !vocab.contains(t._2)).toLong)) }
    assert(exp.nonEmpty && exp.values.exists(_._2 > 0), s"fixture needs a held-out OOV tail: $exp")
    val out = functions.Corpus.oovRateOf(docs, vocabK = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == exp, s"got $out expected $exp")
  }

  test("langidEval: confusion cells with closed-form counts, abstentions land in 'und', shares sum to 1 per true lang") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the fast small thing"),   // en markers → en
      (2L, "en", "der und nicht text"),     // de markers on an en doc → confusion
      (3L, "de", "der die und nicht"),      // de → de
      (4L, "de", "nothing matches here"),   // no markers → und
      (5L, "fr", "le et les mot"),          // fr → fr
      (6L, "fr", "le et les mot")
    ).toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lid").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = functions.TextAnalysis.langidEval.build(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("en", "en")) == ((1L, 2L, 0.5)), out.toString)
    assert(out(("en", "de")) == ((1L, 2L, 0.5)), out.toString)
    assert(out(("de", "de")) == ((1L, 2L, 0.5)), out.toString)
    assert(out(("de", "und")) == ((1L, 2L, 0.5)), out.toString)
    assert(out(("fr", "fr")) == ((2L, 2L, 1.0)), out.toString)
    assert(out.size == 5, out.toString)
  }

  test("dowAnova: replicated IEEE fold over a two-week design, single-day groups give NULL F, short designs give NULL verdict") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    def series(tpe: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, i) => Seq.fill(c)((tpe, t(i + 1))) }
    // 2024-01-01 is a MONDAY (dow 1). 'a': two full weeks, Mondays
    // hot (10, 12), every other dow (1, 2) — within-group variance
    // real, k = 7, df2 = 7 (< 120 → NULL verdict, F non-NULL)
    val aCounts = (0 until 14).map(i => if (i % 7 == 0) Seq(10, 12)(i / 7) else Seq(1, 2)(i / 7))
    // 'b': single week Mon..Sat (6 days) → every group has ONE day →
    // SSW = 0 → F NULL
    val ev = (series("a", aCounts) ++ series("b", Seq(3, 1, 4, 1, 5, 9)))
      .toDF("event_type", "ts")
    val out = operators.Insights2.dowAnova(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert((a.getLong(1), a.getInt(2), a.getInt(4), a.getLong(5)) ==
      ((14L, 7, 6, 7L)), a.toString)
    // replicate the exact fold: group terms in dow order 0..6
    val dowOf = (i: Int) => (i + 1) % 7 // day i (0-based from Monday): Mon=1..Sun=0 cycle
    val groups = (0 until 14).groupBy(dowOf).map { case (g, is) =>
      g -> is.map(aCounts) }
    val gsq = (0 to 6).map(g => groups.get(g).map(xs =>
      (xs.sum.toDouble * xs.sum.toDouble) / xs.size.toDouble).getOrElse(0.0)).reduceLeft(_ + _)
    val s = aCounts.sum.toDouble
    val ss = aCounts.map(x => x.toLong * x).sum.toDouble
    val ssb = gsq - (s * s) / 14.0
    val ssw = ss - gsq
    val expF = (ssb / 6.0) / (ssw / 7.0)
    assert(a.getDouble(3) == expF, s"${a.getDouble(3)} vs $expF")
    assert(a.isNullAt(6), "df2 < 120 must yield a NULL verdict, not a fake one")
    val b = out("b")
    assert(b.getInt(2) == 6 && b.isNullAt(3) && b.isNullAt(6), b.toString)
  }

  test("c2st drift verdict: separable halves flag drift, tied halves do not") {
    import spark.implicits._
    def verdict(zz: org.apache.spark.sql.DataFrame) = CacheScope.withScope { implicit s =>
      operators.Analytics.rocAucOfScores(zz)
        .selectExpr("auc_roc",
          s"CAST(CASE WHEN abs(auc_roc - 0.5) > ${operators.Analytics.C2stAucBand} THEN 1 ELSE 0 END AS BIGINT) AS drift")
        .collect().head
    }
    val sep = verdict(Seq((2.0, 1.0), (3.0, 1.0), (-1.0, 0.0), (-2.0, 0.0)).toDF("z", "y"))
    assert(sep.getDouble(0) == 1.0 && sep.getLong(1) == 1L, sep.toString)
    val tie = verdict(Seq((1.0, 1.0), (1.0, 0.0), (2.0, 1.0), (2.0, 0.0)).toDF("z", "y"))
    assert(tie.getDouble(0) == 0.5 && tie.getLong(1) == 0L, tie.toString)
  }

  test("wilcoxonOfScores: midrank-tied closed form, zero differences drop, all-positive rejects, all-tied is NULL") {
    import spark.implicits._
    def wx(rows: Seq[(Double, Double)]) = CacheScope.withScope { implicit s =>
      operators.Analytics.wilcoxonOfScores(rows.toDF("za", "zb")).collect().head
    }
    // d = {+2, +2, −1, +3, 0}: the zero drops; ranks of |d| 1,2,2,3 are
    // 1, 2.5, 2.5, 4 → W⁺ = 9; 48·Var = 2·4·5·9 − (2³−2) = 354
    val r = wx(Seq((3.0, 1.0), (5.0, 3.0), (1.0, 2.0), (4.0, 1.0), (2.0, 2.0)))
    assert(r.getLong(0) == 4L && r.getDouble(1) == 9.0, r.toString)
    assert(r.getDouble(2) ==
      (18.0 / 2.0 - 4.0 * 5.0 / 4.0) / math.sqrt(354.0 / 48.0), r.toString)
    assert(r.getLong(3) == 0L, r.toString)
    // all differences positive and distinct (1..10): W⁺ = 55, z ≈ 2.80
    val s = wx((1 to 10).map(i => (i * 2.0 + i, i * 2.0))) // d = i
    assert(s.getDouble(1) == 55.0, s.toString)
    assert(s.getDouble(2) == (110.0 / 2.0 - 10.0 * 11.0 / 4.0) / math.sqrt(4620.0 / 48.0), s.toString)
    assert(s.getLong(3) == 1L, s.toString)
    // identical margins: nothing to rank → NULL, not 0
    val t = wx(Seq((1.0, 1.0), (2.0, 2.0)))
    assert(t.isNullAt(2) && t.isNullAt(3), t.toString)
  }

  test("costOptOfScores: asymmetric costs move the operating point, argmin tiebreaks to the lowest threshold") {
    import spark.implicits._
    // z = 5 (above every edge, y = 1), z = −5 (below every edge, y = 0),
    // z = 0 (positive for t ≤ 0.4 — logit(0.5) = 0 is NOT exceeded, y = 1):
    // cost 0 for t ≤ 0.4, cost CostFn for t ≥ 0.5 → best = 0.1 by tiebreak
    val zz = Seq((5.0, 1.0), (-5.0, 0.0), (0.0, 1.0)).toDF("z", "y")
    val out = CacheScope.withScope { implicit s =>
      operators.Analytics.costOptOfScores(zz).collect()
        .map(r => r.getDouble(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    }
    for (t <- Seq(0.1, 0.2, 0.3, 0.4))
      assert(out(t) == (((0L, if (t == 0.1) 1L else 0L))), s"$t: ${out(t)}")
    for (t <- Seq(0.5, 0.6, 0.7, 0.8, 0.9))
      assert(out(t) == ((operators.Analytics.CostFn, 0L)), s"$t: ${out(t)}")
    assert(out.values.map(_._2).sum == 1L, "exactly one operating point")
  }

  test("modelCompareOfScores: every composed metric equals its standalone readout on a planted frame") {
    import spark.implicits._
    val A = operators.Analytics
    // mixed decisions, tied margins, both classes — all readouts live
    val zz = Seq(
      (2.0, 1.0, -1.0, 1.0), (1.0, 1.0, 1.0, 1.0), (-1.0, 2.0, 1.0, 0.0),
      (3.0, -1.0, 2.0, 1.0), (-2.0, -2.0, -1.0, 0.0), (1.0, 3.0, -2.0, 1.0),
      (2.0, 1.0, 2.0, 0.0), (-1.0, -3.0, 1.0, 1.0), (1.0, 1.0, -1.0, 0.0),
      (4.0, 2.0, 3.0, 1.0)).toDF("za", "zb", "zc", "y")
    val composed = CacheScope.withScope { implicit s =>
      A.modelCompareOfScores(s.persist(zz)).collect()
        .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    }
    def single(f: graft.CacheScope => org.apache.spark.sql.DataFrame, c: String) =
      CacheScope.withScope { implicit s =>
        val r = f(s).collect().head
        Option(r.get(r.fieldIndex(c))).map(x => (x: Any) match {
          case d: Double => d
          case l: Long => l.toDouble
        })
      }
    assert(composed("n") == single(s => A.mcnemarOfScores(zz.select(col("za"), col("zb"), col("y"))), "n_pairs"))
    assert(composed("mcnemar_stat") == single(s => A.mcnemarOfScores(zz.select(col("za"), col("zb"), col("y"))), "mcnemar_stat"))
    assert(composed("kappa") == single(s => A.kappaOfScores(zz.select(col("za"), col("zb"))), "kappa"))
    assert(composed("kappa_po") == single(s => A.kappaOfScores(zz.select(col("za"), col("zb"))), "po"))
    assert(composed("kappa_pe") == single(s => A.kappaOfScores(zz.select(col("za"), col("zb"))), "pe"))
    assert(composed("cochran_q") == single(s => A.cochranQOfScores(zz), "q_stat"))
    assert(composed("spearman_rho") == single(implicit s => A.spearmanOfScores(zz.select(col("za"), col("zb"))), "rho"))
    assert(composed("wilcoxon_z") == single(implicit s => A.wilcoxonOfScores(zz.select(col("za"), col("zb"))), "z_stat"))
  }

  test("matryoshkaEval: full width recalls exactly 1, prefix-constant widths collapse to the id-tiebreak ranking") {
    import spark.implicits._
    // dims 1..32 CONSTANT (prefix rankings are pure id tiebreaks and
    // identical at widths 8/16/32); the signal lives in dims 33..64
    val emb = (0L until 20L).map { i =>
      (i, "x", (Array.fill(32)(0.5f) ++
        (32 until 64).map(j => (((i * 131 + j * 31 + 7) % 97) / 97.0f - 0.5f)).toArray))
    }.toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-mrl").toString
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = similarity.Similarity.matryoshkaEval.build(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(8L, 16L, 32L, 64L), out.toString)
    assert(out(64L) == ((10L, 50L, 1.0)), "full width must self-agree: " + out(64L))
    // all-tied prefixes rank by candidate id → identical hits at 8/16/32
    assert(out(8L) == out(16L) && out(16L) == out(32L), out.toString)
    assert(out(32L)._3 < 1.0, "id-order must not accidentally equal the true ranking: " + out(32L))
    assert(out.values.forall(v => v._3 >= 0.0 && v._3 <= 1.0), out.toString)
  }
}
