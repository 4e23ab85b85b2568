package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted fixtures for the round-9 items: the r8 snapshot pair's
  * closed forms (cluster-size histogram, confusion/MCC incl. the
  * zero-denominator NULL arms), the q87 calendar-lag semantics, the
  * sweep's unrounded-Jaccard contract, and the frontier-only BFS
  * rewrite's fixpoint equality. */
class Round9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cluster stats: planted two-cluster assignment hits the closed-form histogram") {
    import spark.implicits._
    // clusters: {1,2,3}, {4,5}, {6} — sizes 3, 2, 1 over 6 docs
    val asg = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L))
      .toDF("node", "cluster")
    val r = dedup.DedupApi.clusterSizeStats(asg).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq ==
      Seq((1L, 1L, 1L, 0L), (2L, 1L, 2L, 1L), (3L, 1L, 3L, 2L)))
    assert(r.map(_.getDouble(4)).toSeq == Seq(1.0 / 6, 2.0 / 6, 3.0 / 6))
    // removable mass = docs - clusters
    assert(r.map(_.getLong(3)).sum == 6L - 3L)
  }

  test("confusion/MCC: planted matrix hits the closed form") {
    import spark.implicits._
    val cm = Seq((2L, 1L, 1L, 3L)).toDF("tp", "fp", "fn", "tn")
    val r = operators.Analytics.confusionReadout(cm).collect().head
    assert(r.getDouble(4) == 4.0 / 6, s"f1 = ${r.getDouble(4)}")
    // mcc = (2*3 - 1*1) / sqrt(3*3*4*4) = 5/12
    assert(math.abs(r.getDouble(5) - 5.0 / 12) < 1e-15, s"mcc = ${r.getDouble(5)}")
  }

  test("confusion/MCC: degenerate marginals surface NULL, not NaN/Inf") {
    import spark.implicits._
    // all predicted negative: tp + fp = 0 -> mcc NULL; f1 defined (0)
    val r1 = operators.Analytics.confusionReadout(
      Seq((0L, 0L, 2L, 3L)).toDF("tp", "fp", "fn", "tn")).collect().head
    assert(r1.getDouble(4) == 0.0 && r1.isNullAt(5))
    // no positives anywhere: 2tp + fp + fn = 0 -> f1 NULL too
    val r2 = operators.Analytics.confusionReadout(
      Seq((0L, 0L, 0L, 3L)).toDF("tp", "fp", "fn", "tn")).collect().head
    assert(r2.isNullAt(4) && r2.isNullAt(5))
  }

  test("confusion counts: z > 0 operating point over planted scores") {
    import spark.implicits._
    val zz = Seq((1.0, 1.0), (-1.0, 1.0), (1.0, 0.0), (-1.0, 0.0), (-1.0, 0.0))
      .toDF("z", "y")
    val r = operators.Analytics.confusionOfScores(zz).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L, 2L)))
  }

  test("q87: forecast is the same CALENDAR weekday last week, not 7 rows back") {
    import spark.implicits._
    // sparse series: days 1, 8, 15 only (each a Monday-step apart).
    // Row-lag(7) would find NO forecastable day (only 3 rows); the
    // calendar join scores day 8 (fc = day 1) and day 15 (fc = day 8).
    val rows =
      Seq.fill(10)("2024-01-01 12:00:00") ++
      Seq.fill(10)("2024-01-08 12:00:00") ++
      Seq.fill(12)("2024-01-15 12:00:00")
    val ev = rows.map(("a", _)).toDF("event_type", "tss")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"))
    val r = operators.Insights2.seasonalNaiveBacktest(ev).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 2L, s"n_days = ${r.head.getLong(1)}")
    // wape = (|10-10| + |12-10|) / (10 + 12) = 2/22
    assert(r.head.getDouble(2) == 2.0 / 22, s"wape = ${r.head.getDouble(2)}")
    // mape = (0/10 + 2/12)/2 with the 12-dp term rounding
    val mape = r.head.getDouble(3)
    assert(math.abs(mape - (math.rint(2.0 / 12 * 1e12) / 1e12) / 2) < 1e-12)
  }

  test("q87: a day with no activity exactly a week earlier is unscoreable and drops") {
    import spark.implicits._
    // days 1 and 9: 9 - 7 = day 2 (absent) -> nothing scoreable
    val ev = Seq(("a", "2024-01-01 12:00:00"), ("a", "2024-01-09 12:00:00"))
      .toDF("event_type", "tss")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"))
    assert(operators.Insights2.seasonalNaiveBacktest(ev).count() == 0)
  }

  test("minhashPairs roundJaccard=false surfaces the raw verification value") {
    import spark.implicits._
    // identical docs share every shingle (j = 1.0 both ways); a pair
    // with a non-terminating jaccard must come back UNROUNDED
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma delta zeta"))
      .toDF("doc_id", "text")
    val raw = dedup.DedupApi.minhashPairs(docs, "doc_id", "text",
      threshold = 0.0, roundJaccard = false).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(raw(((1L, 2L))) == 1.0)
    // 3-shingles of 5 words: 3 each; docs 1 and 3 share 2 of them
    // -> j = 2 / (3 + 3 - 2) = 0.5 exactly; the raw/rounded split is
    // pinned by VALUE equality with the exact rational
    raw.get((1L, 3L)).foreach(j => assert(j == 2.0 / 4))
    // and the rounded default still rounds (contract unchanged)
    val rounded = dedup.DedupApi.minhashPairs(docs, "doc_id", "text",
      threshold = 0.0).collect().map(_.getDouble(2))
    assert(rounded.forall(j => j == math.rint(j * 1e6) / 1e6))
  }

  test("frontier-only bfs: fixpoint equals brute shortest paths on a planted graph") {
    import spark.implicits._
    // 0-1-2-3-4 path + chord 0-3: dist(3) = 1 via the chord even
    // though the path route reaches it later; plus a diamond 1-5, 5-3
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L), (1L, 5L), (5L, 3L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = operators.Graph.bfs(e, seeds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
  }

  test("anf: path-graph closed form, exact 90%-boundary, partition invariance") {
    import spark.implicits._
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val e = (path ++ path.map(_.swap)).toDF("src", "dst")
    // one seed at 0: N(r) = r+1, tot 5; 90% first reached at radius 4
    val r1 = operators.Graph.anf(e, Seq(0L).toDF("node")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(3)))
    assert(r1.toSeq == Seq((0L, 1L, false), (1L, 2L, false), (2L, 3L, false),
      (3L, 4L, false), (4L, 5L, true)))
    // seeds {0, 2}: N = 2,5,8,9,10 — the radius-3 row sits EXACTLY on
    // the 90% boundary (9*10 >= 10*9), pinning the integer comparison
    val r2 = operators.Graph.anf(e, Seq(0L, 2L).toDF("node")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(3)))
    assert(r2.toSeq == Seq((0L, 2L, false), (1L, 5L, false), (2L, 8L, false),
      (3L, 9L, true), (4L, 10L, true)))
    val r2p = operators.Graph.anf(e.repartition(7), Seq(0L, 2L).toDF("node"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(3)))
    assert(r2p.toSeq == r2.toSeq)
  }

  test("join skew report: planted frequency histograms hit the closed form") {
    import spark.implicits._
    // key A: freqs {1,1,1,1,16} -> avg 4, skew 4, salt ceil(16/16)=1
    // key B: freqs {1,1,1,1,96} -> avg 20, skew 4.8, salt ceil(96/80)=2
    val f = (Seq.fill(4)(("A", 1L)) ++ Seq(("A", 16L)) ++
      Seq.fill(4)(("B", 1L)) ++ Seq(("B", 96L))).toDF("kc", "f")
    val r = operators.Insights2.joinSkewReport(f).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getDouble(5), x.getDouble(6), x.getLong(7))).toList
    assert(r.map(_._1) == List("A", "B"))
    val a = r.head
    assert((a._2, a._3, a._4) == ((5L, 20L, 16L)))
    assert(a._5 == 1.0, s"p50 = ${a._5}")
    // percentile_cont(0.99) over 5 values: 1 + 0.96 * 15 = 15.4
    assert(math.abs(a._6 - 15.4) < 1e-9, s"p99 = ${a._6}")
    assert(a._7 == 4.0 && a._8 == 1L, s"skew/salt = ${(a._7, a._8)}")
    val b = r(1)
    assert((b._2, b._3, b._4) == ((5L, 100L, 96L)))
    assert(b._7 == 96.0 / 20.0 && b._8 == 2L, s"skew/salt = ${(b._7, b._8)}")
  }

  test("pipeline_graph_centrality: the composed report equals both singles off one BFS") {
    import spark.implicits._
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (1L, 5L), (5L, 3L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(0L, 2L).toDF("node")
    val composed = operators.Graph.pipelineGraphCentrality(e, seeds).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val cl = operators.Graph.closeness(e, seeds).collect()
      .map(r => ("closeness", r.getLong(0).toString, r.getLong(1), r.getDouble(2)))
    val an = operators.Graph.anf(e, seeds).collect()
      .map(r => ("anf", r.getLong(0).toString, r.getLong(1), r.getDouble(2)))
    assert(composed.toSeq == (an ++ cl).toSeq,
      s"composed must equal the singles:\n${composed.toSeq}\nvs\n${(an ++ cl).toSeq}")
  }

  test("pipeline_graph_centrality: seed ids above 2^53 stay distinct in the report key (r10)") {
    import spark.implicits._
    // 2^53 and 2^53 + 1 are the SAME double — the r9 DOUBLE report key
    // collapsed them; the STRING key must keep both closeness rows
    val a = (1L << 53)
    val b = a + 1
    val und = Seq((a, 7L), (b, 7L), (7L, 8L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(a, b).toDF("node")
    val rows = operators.Graph.pipelineGraphCentrality(e, seeds).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val clKeys = rows.filter(_._1 == "closeness").map(_._2).toSet
    assert(clKeys == Set(a.toString, b.toString), s"keys collapsed: $clKeys")
    // both seeds see the same neighborhood: 7 at d=1, {8, the other seed} at d=2
    rows.filter(_._1 == "closeness").foreach { r =>
      assert(r._3 == 3L && r._4 == 1.0 + 2.0 / 2, r.toString) }
  }

  test("frontier-only closeness: partition count cannot change the result") {
    import spark.implicits._
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (1L, 5L), (5L, 3L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(0L, 2L).toDF("node")
    val a = operators.Graph.closeness(e, seeds).collect().toSeq
    val b = operators.Graph.closeness(e.repartition(7), seeds).collect().toSeq
    assert(a == b)
    // seed 0 reaches 1,3 at d=1 and 2,5 at d=2: closeness = 2 + 2/2 = 3
    val s0 = a.find(_.getLong(0) == 0L).get
    assert(s0.getLong(1) == 4L && s0.getDouble(2) == 3.0)
  }

  test("rrf fusion: planted disagreeing lists hit the closed form") {
    import spark.implicits._
    // lexical says A then B; vector says B then C — fused order is
    // B (both lists), A (lex only, rank 1), C (vec only, rank 2)
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("id_p", "doc_id", "rk")
    val vec = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("id_p", "doc_id", "rk")
    val r = similarity.AnnApi.rrfFuse(lex, vec, 60, 10).collect()
      .map(x => (x.getInt(1), x.getLong(2), x.getDouble(3),
        if (x.isNullAt(4)) -1L else x.getLong(4),
        if (x.isNullAt(5)) -1L else x.getLong(5))).toList
    assert(r == List(
      (1, 11L, 1.0 / 62 + 1.0 / 61, 2L, 1L),
      (2, 10L, 1.0 / 61, 1L, -1L),
      (3, 12L, 1.0 / 62, -1L, 2L)))
  }

  test("ndcg: perfect list scores exactly 1.0, a head swap and a miss score the closed form") {
    import spark.implicits._
    val exact = (1 to 10).map(i => (0L, i, 100L + i)).toDF("id_p", "rk", "id_c")
    val perfect = similarity.AnnApi.ndcgReadout(exact, exact, 10).collect().head
    assert(perfect.getLong(1) == 10L && perfect.getDouble(3) == 1.0,
      s"perfect ndcg = ${perfect.getDouble(3)}")
    val disc = similarity.AnnApi.ndcgDiscounts(10)
    val idcg = similarity.AnnApi.ndcgIdcg(10)
    // swap the top two: gains 9,10 at positions 1,2 instead of 10,9
    val swapped = ((Seq((0L, 1, 102L), (0L, 2, 101L)) ++
      (3 to 10).map(i => (0L, i, 100L + i)))).toDF("id_p", "rk", "id_c")
    val sw = similarity.AnnApi.ndcgReadout(swapped, exact, 10).collect().head
    val expSwap = (idcg
      .subtract(disc(0).multiply(java.math.BigDecimal.ONE))
      .add(disc(1).multiply(java.math.BigDecimal.ONE))).doubleValue() / idcg.doubleValue()
    assert(math.abs(sw.getDouble(3) - expSwap) < 1e-15,
      s"swapped ndcg = ${sw.getDouble(3)} vs $expSwap")
    assert(sw.getDouble(3) < 1.0)
    // last slot replaced by a non-neighbor: rel 0 at position 10
    val missed = ((1 to 9).map(i => (0L, i, 100L + i)) :+ (0L, 10, 999L))
      .toDF("id_p", "rk", "id_c")
    val ms = similarity.AnnApi.ndcgReadout(missed, exact, 10).collect().head
    val expMiss = idcg.subtract(disc(9)).doubleValue() / idcg.doubleValue()
    assert(ms.getLong(1) == 9L && math.abs(ms.getDouble(3) - expMiss) < 1e-15,
      s"missed ndcg = ${ms.getDouble(3)} vs $expMiss")
  }

  test("pipeline_retrieval_eval: the composed report equals both singles off one ranking pair") {
    import spark.implicits._
    val emb = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 31 + j * 17) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val probes = emb.filter(col("vec_id") < 4).select(col("vec_id"))
    val composed = CacheScope.withScope { implicit sc =>
      similarity.AnnApi.retrievalEval(emb, "vec_id", "embedding", probes).collect()
    }.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val b10 = similarity.AnnApi.bruteTopK(emb, "vec_id", "embedding", probes, 10)
    val l10 = similarity.AnnApi.lshTopK(emb, "vec_id", "embedding", probes, 10)
    val nd = similarity.AnnApi.ndcgReadout(l10, b10, 10).collect()
      .map(r => ("ndcg10", r.getLong(0), r.getLong(1), r.getDouble(3)))
    val l5 = l10.filter(col("rk") <= 5).select(col("id_p").as("lp"), col("id_c").as("lc"))
    val rec = b10.filter(col("rk") <= 5)
      .join(broadcast(l5), col("id_p") === col("lp") && col("id_c") === col("lc"), "left")
      .groupBy(col("id_p")).agg(count(col("lc")).cast("long").as("nh"))
      .orderBy(col("id_p")).collect()
      .map(r => ("recall5", r.getLong(0), r.getLong(1), r.getLong(1).toDouble / 5.0))
    assert(composed.toSeq == (nd ++ rec).toSeq,
      s"composed:\n${composed.toSeq}\nvs singles:\n${(nd ++ rec).toSeq}")
  }

  test("dq audit: planted violations hit exact counts per check class") {
    import spark.implicits._
    // orders: 4 rows — one dup pk (1), one NULL price, one bad status,
    // one negative price, one orphan custkey (90 has no customer)
    val orders = Seq(
      (1L, 10L, "F", Some(10.0), Some("2024-01-01"), "1-URGENT"),
      (1L, 10L, "O", Some(20.0), Some("2024-01-02"), "5-LOW"),
      (2L, 20L, "X", None, Some("2024-01-03"), "2-HIGH"),
      (3L, 90L, "P", Some(-5.0), None, "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "od", "o_orderpriority")
      .withColumn("o_orderdate", col("od").cast("timestamp")).drop("od")
    // lineitem: 3 rows — one orphan orderkey (99), one bad discount,
    // one bad qty + bad tax
    val lineitem = Seq(
      (1L, 1.0, 0.05, 0.02, "A", Some("2024-01-05")),
      (99L, 5.0, 1.5, 0.0, "N", None),
      (2L, -1.0, 0.0, -0.1, "Z", Some("2024-01-06")))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_tax", "l_returnflag", "sd")
      .withColumn("l_shipdate", col("sd").cast("timestamp")).drop("sd")
    val customer = Seq((10L, Some(5.0), "AUTO"), (20L, None, "AUTO"))
      .toDF("c_custkey", "c_acctbal", "c_mktsegment")
    val documents = Seq((1L, Some("a"), Some("en")), (1L, None, None))
      .toDF("doc_id", "text", "lang")

    val r = operators.Insights2.dqAudit(orders, lineitem, customer, documents)
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2)) ->
        (x.getLong(3), x.getLong(4), x.getBoolean(6))).toMap
    assert(r(("completeness", "orders", "o_totalprice")) == ((1L, 4L, false)))
    assert(r(("completeness", "orders", "o_orderdate")) == ((1L, 4L, false)))
    assert(r(("completeness", "lineitem", "l_shipdate")) == ((1L, 3L, false)))
    assert(r(("completeness", "customer", "c_acctbal")) == ((1L, 2L, false)))
    assert(r(("completeness", "documents", "text")) == ((1L, 2L, false)))
    assert(r(("completeness", "documents", "lang")) == ((1L, 2L, false)))
    assert(r(("domain", "orders", "o_orderstatus")) == ((1L, 4L, false)))
    assert(r(("domain", "orders", "o_orderpriority")) == ((0L, 4L, true)))
    assert(r(("domain", "lineitem", "l_returnflag")) == ((1L, 3L, false)))
    assert(r(("range", "orders", "o_totalprice")) == ((1L, 4L, false)))
    assert(r(("range", "lineitem", "l_quantity")) == ((1L, 3L, false)))
    assert(r(("range", "lineitem", "l_discount")) == ((1L, 3L, false)))
    assert(r(("range", "lineitem", "l_tax")) == ((1L, 3L, false)))
    assert(r(("uniqueness", "orders", "o_orderkey")) == ((1L, 4L, false)))
    assert(r(("uniqueness", "customer", "c_custkey")) == ((0L, 2L, true)))
    assert(r(("uniqueness", "documents", "doc_id")) == ((1L, 2L, false)))
    assert(r(("fk_orphans", "lineitem", "l_orderkey")) == ((1L, 3L, false)))
    assert(r(("fk_orphans", "orders", "o_custkey")) == ((1L, 4L, false)))
    assert(r(("cardinality", "customer", "c_mktsegment")) == ((1L, 2L, true)))
    assert(r(("cardinality", "documents", "lang")) == ((1L, 2L, true)))
    // 6-dp half-up rate on the planted 1/3 ratio
    assert(r.size == 20)
    val rate = operators.Insights2.dqAudit(orders, lineitem, customer, documents)
      .filter(col("tbl") === "lineitem" && col("check_name") === "fk_orphans")
      .collect().head.getDouble(5)
    assert(rate == 0.333333, s"rate = $rate")
  }

  test("order statistics: exact 0-based selection on a planted shuffle") {
    import spark.implicits._
    val df = (1 to 10).reverse.map(i => ("g", i.toDouble)).toDF("g", "x")
    val ranks = Seq(("g", 0L), ("g", 4L), ("g", 9L)).toDF("g", "k")
    val r = operators.ExactPercentiles.orderStatistics(df.repartition(5), "g", "x", ranks)
      .orderBy(col("k")).collect().map(x => (x.getLong(1), x.getDouble(2)))
    assert(r.toSeq == Seq((0L, 1.0), (4L, 5.0), (9L, 10.0)))
  }

  test("conformal interval: planted exact plane hits the closed form") {
    import spark.implicits._
    // train folds {0,1}: y sits EXACTLY on y = 10 + 2*q + 0*disc, so
    // the Cramer solve is exact and every residual is the planted
    // offset. cal fold 2: residuals 1..9 -> k = ceil(0.9*10) = 9,
    // qhat = 9. test fold 3: |resid| {0.5, 9.0, 9.5, 10} -> 2/4 covered.
    def plane(q: Double, disc: Double): Double = 10.0 + 2.0 * q
    val train = Seq((1.0, 0.0), (2.0, 0.0), (3.0, 1.0), (1.0, 1.0), (2.0, 1.0), (4.0, 0.0))
      .zipWithIndex.map { case ((q, ds), i) =>
        (i.toLong * 4 + (i % 2), q, ds, plane(q, ds)) }
    val cal = (1 to 9).map(j => (j.toLong * 4 + 2, 1.0 + j, 0.0, plane(1.0 + j, 0.0) + j))
    val test = Seq(0.5, -9.0, 9.5, -10.0).zipWithIndex.map { case (off, j) =>
      (j.toLong * 4 + 3, 2.0 + j, 1.0, plane(2.0 + j, 1.0) + off) }
    val li = (train ++ cal ++ test)
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    val r = operators.Analytics.conformalInterval(li).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((6L, 9L, 4L, 9L)),
      s"counts/k = $r")
    assert(r.getDouble(4) == 9.0, s"qhat = ${r.getDouble(4)}")
    assert(r.getDouble(5) == 18.0)
    assert(r.getDouble(6) == 0.5 && !r.getBoolean(7), s"coverage = ${r.getDouble(6)}")
  }

  test("markov stationary: planted 2-state chain converges to 1/3, 2/3; sink dropped; partition-invariant") {
    import spark.implicits._
    // one user's journey A,B,B,A,B,C: transitions A->B x2, B->B, B->A,
    // B->C. C never occurs as `cur` (sink) -> the B->C row is dropped
    // and B renormalizes over {A: 1, B: 1}. Chain: p(A->B)=1,
    // p(B->A)=p(B->B)=1/2 -> stationary (1/3, 2/3); the +-1/2-factor
    // deviation decay leaves < 2e5 units of error after 20 rounds.
    val ev = Seq("A", "B", "B", "A", "B", "C").zipWithIndex.map { case (t, i) =>
      (1L, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$i"), i.toLong, t)
    }.toDF("user_id", "ts", "event_id", "event_type")
    val r = operators.Insights2.markovStationary(ev).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    assert(r.map(_._1).toSeq == Seq("A", "B"), s"states = ${r.toSeq}")
    assert(math.abs(r(0)._3 - 1.0 / 3) < 1e-5 && math.abs(r(1)._3 - 2.0 / 3) < 1e-5,
      s"pi = ${r.toSeq}")
    // floor-only leakage: total units never exceed the initial mass
    assert(r.map(_._2).sum <= 1000000000000L)
    val rp = operators.Insights2.markovStationary(ev.repartition(7)).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(rp.toSeq == r.map(x => (x._1, x._2)).toSeq, "pi_units must be partition-invariant")
  }

  test("theil-sen: planted outlier day leaves the median slope at the clean trend") {
    import spark.implicits._
    // daily counts 1,2,3,4,100 on days 0..4: the six outlier-free
    // pairwise slopes are all 1, the four outlier pairs are 24.75..96
    // -> median of 10 = 1 (OLS would report ~19). residuals under
    // slope 1 are [1,1,1,1,96] -> intercept median 1.
    val ev = (0 to 4).flatMap { day =>
      val n = if (day == 4) 100 else day + 1
      (1 to n).map(j =>
        ("up", java.sql.Timestamp.valueOf(f"2024-01-0${day + 1}%d 00:00:${j % 60}%02d.${j}%03d")))
    }.toDF("event_type", "ts")
    val r = operators.Insights2.theilSen(ev).collect().head
    assert((r.getLong(1), r.getLong(2)) == ((5L, 10L)), s"counts = $r")
    assert(r.getDouble(3) == 1.0, s"ts_slope = ${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"ts_intercept = ${r.getDouble(4)}")
  }

  test("feature importance: planted exact plane puts all importance on quantity") {
    import spark.implicits._
    // y = 10 + 2*q exactly, discount uncorrelated: full fit R^2 = 1,
    // dropping discount refits perfectly (delta 0), dropping quantity
    // loses fit entirely -> share(quantity) = 1, share(discount) = 0
    val li = Seq((1.0, 0.0), (2.0, 0.0), (3.0, 1.0), (1.0, 1.0), (2.0, 1.0), (4.0, 0.0))
      .map { case (q, ds) => (q, ds, 10.0 + 2.0 * q) }
      .toDF("l_quantity", "l_discount", "l_extendedprice")
    val r = operators.Analytics.featureImportance(li).collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2), x.getDouble(3),
        x.getDouble(4), x.getDouble(5))).toMap
    assert(r("l_quantity") == ((2.0, 1.0, r("l_quantity")._3, r("l_quantity")._4, 1.0)))
    assert(r("l_quantity")._4 > 0.5, s"quantity delta = ${r("l_quantity")}")
    assert(r("l_discount")._1 == 0.0 && r("l_discount")._3 == 1.0
      && r("l_discount")._4 == 0.0 && r("l_discount")._5 == 0.0,
      s"discount = ${r("l_discount")}")
  }

  test("filtered search: pre-filter keeps only allowed candidates, closer outsiders excluded") {
    import spark.implicits._
    // probe 0 = [1,0]; candidate 1 = [1,0] (cos 1, NOT allowed),
    // 2 = [0.8,0.6] (cos 0.8), 3 = [0,1] (cos 0). allowed = {2,3}:
    // the slice's top-2 must be (2, 3) — a post-filtered global top-2
    // would have returned only {2} (1 occupied a slot)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.8f, 0.6f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = similarity.AnnApi.filteredTopK(emb, "vec_id", "embedding",
      Seq(0L).toDF("vec_id"), Seq(2L, 3L).toDF("vec_id"), k = 2).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq((0L, 1, 2L, 0.8), (0L, 2, 3L, 0.0)), r.toSeq.toString)
  }

  test("learning curve: planted exact plane scores zero held-out error at every size") {
    import spark.implicits._
    // y = 10 + 2q + 3disc exactly; every fold holds the same
    // nonsingular 4-point design so each cumulative train set solves
    // to the true plane and the moment-identity SSE must be ~0
    val pts = Seq((1.0, 0.0), (2.0, 0.0), (3.0, 1.0), (1.0, 1.0))
    val li = (0 until 5).flatMap { f =>
      pts.zipWithIndex.map { case ((q, ds), i) =>
        (f.toLong + 5L * i, q, ds, 10.0 + 2.0 * q + 3.0 * ds) }
    }.toDF("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    val r = operators.Analytics.learningCurve(spark, li).collect()
    assert(r.map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1, 4L, 4L), (2, 8L, 4L), (3, 12L, 4L), (4, 16L, 4L)), r.toSeq.toString)
    r.foreach { x =>
      assert(x.getDouble(3) == 0.0, s"k=${x.getInt(0)} rmse = ${x.getDouble(3)}")
      assert(x.getDouble(4) == 1.0, s"k=${x.getInt(0)} r2 = ${x.getDouble(4)}")
    }
  }

  test("source dedup stats: removables attribute to their OWN source, keepers stay") {
    import spark.implicits._
    // clusters {1,2,3} (keep 1), {4,5} (keep 4), {6}; sources:
    // A = {1,2,6}, B = {3,4,5}. removable 2 -> A; 3, 5 -> B
    val asg = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L))
      .toDF("node", "cluster")
    val ds = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"), (5L, "B"), (6L, "A"))
      .toDF("doc_id", "source")
    val r = dedup.Dedup.sourceDedupStats(asg, ds).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(("A", 3L, 1L, 0.333333), ("B", 3L, 2L, 0.666667)),
      r.toSeq.toString)
  }

  test("novelty curve: repeats score zero, fresh content scores by shingle share, short docs NULL") {
    import spark.implicits._
    // batch 0: docs 0 ("a..f" -> 2 shingles) + 1 ("g..k" -> 1) all new;
    // batch 1: doc 50 repeats doc 0 verbatim -> 0 new; batch 2:
    // doc 100 shares one 5-shingle with doc 0 -> 1 of 2 new;
    // batch 3: doc 150 too short for k=5 -> 0 shingles, NULL rate
    val docs = Seq(
      (0L, "a b c d e f"), (1L, "g h i j k"),
      (50L, "a b c d e f"),
      (100L, "a b c d e x"),
      (150L, "w x")).toDF("doc_id", "text")
    val r = functions.TextAnalysis.noveltyCurveOf(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        if (x.isNullAt(4)) None else Some(x.getDouble(4))))
    assert(r.toSeq == Seq(
      (0L, 2L, 3L, 3L, Some(1.0)),
      (1L, 1L, 2L, 0L, Some(0.0)),
      (2L, 1L, 2L, 1L, Some(0.5)),
      (3L, 1L, 0L, 0L, None)), r.toSeq.toString)
  }

  test("equi-depth histogram: uniform values split evenly; total ties empty the tail buckets") {
    import spark.implicits._
    val r = operators.Insights2.equidepthHistogram(
      (1 to 16).map(_.toDouble).toDF("x")).collect()
      .map(x => (x.getInt(0), if (x.isNullAt(1)) -1.0 else x.getDouble(1),
        x.getDouble(2), x.getLong(3)))
    assert(r.toSeq == (1 to 8).map(i =>
      (i, if (i == 1) -1.0 else 2.0 * (i - 1), 2.0 * i, 2L)).toSeq, r.toSeq.toString)
    // 8 identical values: every boundary is 5.0 -> bucket 1 holds all,
    // buckets 2..8 surface EMPTY (lo = hi), not dropped
    val t = operators.Insights2.equidepthHistogram(
      Seq.fill(8)(5.0).toDF("x")).collect()
      .map(x => (x.getInt(0), x.getLong(3)))
    assert(t.toSeq == ((1, 8L) +: (2 to 8).map(i => (i, 0L))), t.toSeq.toString)
  }

  test("join size estimate: sum f_a*f_b equals the materialized join row count") {
    import spark.implicits._
    val fa = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("k", "f")
    val fb = Seq((1L, 4L), (2L, 1L), (9L, 5L)).toDF("k", "f")
    val r = operators.Insights2.joinSizeEstimate("t", fa, fb).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((6L, 3L, 10L, 3L, 11L)), r.toString)
    assert(r.getDouble(6) == 1.1, s"fanout = ${r.getDouble(6)}")
    // the estimate IS the join size: materialize the expansion and check
    val a = fa.as[(Long, Long)].collect().flatMap { case (k, f) => Seq.fill(f.toInt)(k) }
      .toSeq.toDF("k")
    val b = fb.as[(Long, Long)].collect().flatMap { case (k, f) => Seq.fill(f.toInt)(k) }
      .toSeq.toDF("kb")
    assert(a.join(b, col("k") === col("kb")).count() == 11L)
  }

  test("boilerplate fraction: a footer in 3 docs flags, a 2-doc repeat does not") {
    import spark.implicits._
    // "all rights reserved" appears in docs 1,2,3 (df 3 = threshold);
    // "see you soon" only in 1,2 (df 2, below); unique bodies differ
    val docs = Seq(
      (1L, "Alpha body one. All rights reserved! See you soon."),
      (2L, "Beta body two. All rights reserved. See you soon!"),
      (3L, "Gamma body three? All rights reserved."),
      (4L, "Delta body four.")).toDF("doc_id", "text")
    val r = functions.TextAnalysis.boilerplateOf(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      (1L, 3L, 1L, 0.333333), (2L, 3L, 1L, 0.333333),
      (3L, 2L, 1L, 0.5), (4L, 1L, 0L, 0.0)), r.toSeq.toString)
  }

  test("ks two-sample: planted ECDF gap hits D exactly; disjoint supports reject; partition-invariant") {
    import spark.implicits._
    def frame(a: Seq[Double], b: Seq[Double]) =
      (a.map((_, 1L, 0L)) ++ b.map((_, 0L, 1L))).toDF("x", "ia", "ib")
    // A = {1,2,3,4}, B = {3,4,5,6}: sup|F_A - F_B| = 1/2 at x = 2..4
    val r = operators.Analytics.ksTwoSample(
      frame(Seq(1, 2, 3, 4), Seq(3, 4, 5, 6))).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 4L, 6L)), r.toString)
    assert(r.getDouble(3) == 0.5, s"d = ${r.getDouble(3)}")
    assert(!r.getBoolean(5), "lambda 0.707 must not reject at 0.05")
    // disjoint supports: D = 1, lambda = sqrt(50) >> 1.358
    val s2 = operators.Analytics.ksTwoSample(
      frame((1 to 100).map(_.toDouble), (101 to 200).map(_.toDouble))).collect().head
    assert(s2.getDouble(3) == 1.0 && s2.getBoolean(5), s2.toString)
    // two-level scan must be partition-count invariant bit-for-bit
    val rp = operators.Analytics.ksTwoSample(
      frame(Seq(1, 2, 3, 4), Seq(3, 4, 5, 6)).repartition(7)).collect().head
    assert(rp.getDouble(3) == r.getDouble(3) && rp.getDouble(4) == r.getDouble(4))
  }

  test("trend panel: composed rows equal the three singles field-for-field") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("ts"))
    val panel = operators.Insights2.trendPanel(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val cus = operators.Insights2.cusumChangepoint(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val sn = operators.Insights2.seasonalNaiveBacktest(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val ts = operators.Insights2.theilSen(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(panel.keySet == cus.keySet && panel.keySet == ts.keySet, "type sets")
    panel.foreach { case (t, p) =>
      assert(p.getLong(1) == cus(t).getLong(2) && p.getLong(2) == cus(t).getLong(3)
        && p.getDate(3) == cus(t).getDate(1) && p.getDouble(4) == cus(t).getDouble(4),
        s"$t cusum fields: $p vs ${cus(t)}")
      assert(p.getDouble(5) == sn(t).getDouble(2) && p.getDouble(6) == sn(t).getDouble(3),
        s"$t snaive fields: $p vs ${sn(t)}")
      assert(p.getDouble(7) == ts(t).getDouble(3) && p.getDouble(8) == ts(t).getDouble(4),
        s"$t theil-sen fields: $p vs ${ts(t)}")
    }
  }
}
