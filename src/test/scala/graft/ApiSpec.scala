package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the user-facing operator APIs (AsOfJoin, DedupApi). */
class ApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AsOfJoin attaches most recent right row, inclusive, null when none") {
    import spark.implicits._
    val quotes = Seq( // key, time, price
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 100.0),
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), 101.0),
      (2L, Timestamp.valueOf("2024-01-01 10:03:00"), 200.0)
    ).toDF("sym", "qts", "price")
    val trades = Seq( // key, time, qty
      (1L, Timestamp.valueOf("2024-01-01 10:04:59"), 5L),  // → 100.0
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), 6L),  // inclusive → 101.0
      (2L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L),  // no prior quote → null
      (3L, Timestamp.valueOf("2024-01-01 11:00:00"), 8L)   // key unseen → null
    ).toDF("sym", "tts", "qty")

    val out = operators.AsOfJoin.join(trades, quotes,
        key = "sym", leftTime = "tts", rightTime = "qts", rightCols = Seq("price"))
      .orderBy("sym", "tts")
      .select(col("sym"), col("qty"), col("asof_price"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    assert(out.toSeq == Seq(
      (1L, 5L, Some(100.0)), (1L, 6L, Some(101.0)), (2L, 7L, None), (3L, 8L, None)))
  }

  test("AsOfJoin tolerance nulls matches older than the window, keeps fresh ones") {
    import spark.implicits._
    val quotes = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 100.0),
      (2L, Timestamp.valueOf("2024-01-01 08:00:00"), 200.0)
    ).toDF("sym", "qts", "price")
    val trades = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:30:00"), 5L), // 30 min old → kept
      (1L, Timestamp.valueOf("2024-01-01 11:00:00"), 6L), // exactly 1 h → inclusive, kept
      (1L, Timestamp.valueOf("2024-01-01 11:00:01"), 7L), // 1 h + 1 s → nulled
      (2L, Timestamp.valueOf("2024-01-01 10:00:00"), 8L)  // 2 h old → nulled
    ).toDF("sym", "tts", "qty")
    val out = operators.AsOfJoin.join(trades, quotes,
        key = "sym", leftTime = "tts", rightTime = "qts", rightCols = Seq("price"),
        toleranceSeconds = Some(3600L))
      .orderBy("sym", "tts")
      .select(col("qty"), col("asof_price"))
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(out.toSeq == Seq(
      (5L, Some(100.0)), (6L, Some(100.0)), (7L, None), (8L, None)))
  }

  test("z-score anomaly moments flag exactly the >2-sigma rows") {
    import spark.implicits._
    // 9 zeros + one 100: mean 10, sample sd = sqrt(9000/9) ≈ 31.6 —
    // only the 100 clears 2 sigma (90 > 63.2; zeros: 10 < 63.2)
    val base = Timestamp.valueOf("2024-05-01 00:00:00")
    val ev = (1 to 9).map(i => (i.toLong, base, 1L, "click", 0.0)) :+
      ((10L, base, 1L, "click", 100.0))
    val df = ev.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = operators.Extra.anomalyZscore(
        df.select(col("event_id"), col("event_type"), col("value")))
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(10L), s"flagged ${out.toSeq}, want id 10")
    // z = (100 - 10) / sqrt(9000/9) = 90 / 31.6227766 ≈ 2.846050
    assert(math.abs(out.head.getDouble(3) - 2.846050) < 1e-6)
  }

  test("banded simhash pairs = exact pairs for maxHamming <= 6 (9-block pigeonhole)") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val exact = dedup.DedupApi.simhashPairs(docs, "doc_id", "text", maxHamming = 6, banded = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = dedup.DedupApi.simhashPairs(docs, "doc_id", "text", maxHamming = 6, banded = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(exact == banded)
    assert(exact.nonEmpty) // planted near-dups guarantee hits
    // beyond the pigeonhole bound, banding silently falls back to the
    // exact quadratic scan — same rows as banded=false by construction
    val wide = dedup.DedupApi.simhashPairs(docs, "doc_id", "text", maxHamming = 7, banded = true)
    assert(wide.columns.toSeq == Seq("doc_a", "doc_b", "hamming"))
  }

  test("exactKeep returns one survivor per content hash") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val kept = dedup.DedupApi.exactKeep(docs, "doc_id", "text")
    val groups = dedup.DedupApi.exactGroups(docs, "doc_id", "text")
    assert(kept.count() == groups.count())
    assert(kept.columns.toSeq == docs.columns.toSeq)
  }

  test("minhashPairs bucket cap bounds candidates but multi-band redundancy keeps recall") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val uncapped = dedup.DedupApi.minhashPairs(docs, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap of 2 per bucket: near-dup buckets (size 2) all survive here
    val capped = dedup.DedupApi.minhashPairs(docs, "doc_id", "text", threshold = 0.8, maxBucketSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    assert(capped.nonEmpty, "capped run must still find the planted dup pairs")
    // cap of 1 kills every bucket with a pair in it → no candidates
    val starved = dedup.DedupApi.minhashPairs(docs, "doc_id", "text", threshold = 0.8, maxBucketSize = 1)
    assert(starved.count() == 0)
  }

  test("substringPairs maxFpDocs drops boilerplate-only pairs, keeps rare-span pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    def randText(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val boiler = randText(40) // license-header stand-in: shared by ALL docs
    val rare = randText(40)   // genuine repeated span: shared by docs 0 and 1 only
    val docs = (0 until 12).map { i =>
      val body = if (i <= 1) rare + randText(30) else randText(70)
      (i.toLong, boiler + body)
    }.toDF("doc_id", "text")
    // uncapped: every doc pairs with every other through the boilerplate
    val uncapped = dedup.DedupApi.substringPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 12 * 11 / 2, s"boilerplate must pair all docs, got ${uncapped.size}")
    // cap below the boilerplate fan-out: only the rare-span pair survives
    val capped = dedup.DedupApi.substringPairs(docs, "doc_id", "text", maxFpDocs = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((0L, 1L)),
      s"hot-fp pairs must drop while the rare span survives, got $capped")
  }

  test("nearDupClusters labels every pair's endpoints with one component min-id") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val pairs = dedup.DedupApi.minhashPairs(docs, "doc_id", "text", threshold = 0.6)
    val labels = dedup.DedupApi.nearDupClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == docs.count())
    // endpoints of every pair share a cluster, and the cluster id is a
    // member of the cluster (the min doc id)
    pairs.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
      assert(labels(a) <= math.min(a, b))
    }
    assert(labels.count { case (n, c) => n != c } > 0, "expected non-singleton clusters")
  }

  test("nearDupClusters converges on a long chain (diameter >> round bound)") {
    import spark.implicits._
    // path graph 0-1-2-...-400: diameter 400. Min-label propagation
    // needs 400 rounds; large-star/small-star needs O(log n) — this
    // would blow the 30-round cap under the old algorithm.
    val n = 400
    val ids = (0L to n.toLong).toDF("doc_id")
    val chain = (0L until n.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = dedup.DedupApi.nearDupClusters(ids, "doc_id", chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n + 1)
    assert(labels.values.forall(_ == 0L), "whole chain is one component rooted at 0")
  }

  test("nearDupClusters matches brute-force components on a random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph: 120 nodes, ~90 edges
    val nodes = (0L until 120L).toDF("doc_id")
    val edges = (1 to 90).map { i =>
      val a = (i * 37 + 11) % 120; val b = (i * i * 13 + 5) % 120
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }.toDF("doc_a", "doc_b")
    val got = dedup.DedupApi.nearDupClusters(nodes, "doc_id", edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side union-find oracle
    val parent = Array.tabulate(120)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.collect().foreach { r =>
      val (a, b) = (find(r.getLong(0).toInt), find(r.getLong(1).toInt))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val expectMap = (0 until 120).map { v =>
      val root = find(v)
      val members = (0 until 120).filter(find(_) == root)
      v.toLong -> members.min.toLong
    }.toMap
    assert(got == expectMap)
  }

  test("CacheScope.withScope releases the pipeline's persisted intermediates") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    spark.catalog.clearCache()
    CacheScope.withScope { implicit scope =>
      val pairs = dedup.DedupApi.minhashPairs(docs, "doc_id", "text", threshold = 0.8)
      pairs.count() // materialize INSIDE the scope
      assert(!spark.sharedState.cacheManager.isEmpty,
        "shingle/band intermediates must be persisted during the scope")
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "scope close must unpersist everything it acquired")
  }

  test("minhashPairs finds the planted near-duplicates") {
    val pairs = dedup.DedupApi.minhashPairs(
      Tables.documents(spark, TestSpark.sfDir), "doc_id", "text", threshold = 0.8)
    val n = pairs.count()
    assert(n > 0, "expected planted near-dup pairs at jaccard >= 0.8")
    assert(pairs.agg(min(col("jaccard"))).collect()(0).getDouble(0) >= 0.8)
  }

  test("session overlap join: exact pairs, first-bin dedup, mega-bin cap") {
    import spark.implicits._
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    // A(u1) 10:00–12:30 spans 3 hour-bins and overlaps B(u2) 11:00–11:10
    // (pair emitted ONCE although they share two bins) and C(u3)
    // 12:00–14:00; B and C are disjoint; D(u9) is far away
    val sess = Seq(
      (1L, 1L, ts(0), ts(150)),
      (2L, 1L, ts(60), ts(70)),
      (3L, 1L, ts(120), ts(240)),
      (9L, 1L, ts(10000), ts(10010))).toDF("user_id", "sn", "st", "en")
    val got = operators.Extra.sessionOverlapPairs(sess)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, 10L * 60000000L),    // A∩B = 10 min, emitted once
      (1L, 3L, 30L * 60000000L)),   // A∩C = 30 min; B∩C disjoint; D alone
      s"unexpected pairs: ${got.toSeq}")
    // mega-bin cap: 5 concurrent sessions in one hour, cap 4 → bin
    // dropped, zero pairs survive
    val burst = (1L to 5L).map(u => (u, 1L, ts(0), ts(30))).toDF("user_id", "sn", "st", "en")
    assert(operators.Extra.sessionOverlapPairs(burst, maxBinSessions = 4).count() == 0)
    assert(operators.Extra.sessionOverlapPairs(burst, maxBinSessions = 5).count() == 10)
  }
}
