package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 operator fixtures: URL canonicalization + dedup. */
class Round10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("url canonicalization: case/port/fragment/trailing-slash/tracker variants collapse; distinct paths and real queries don't") {
    import spark.implicits._
    val urls = Seq(
      // five spellings of ONE page
      1L -> "http://www.example.com/a/b",
      2L -> "HTTP://WWW.EXAMPLE.COM/a/b",
      3L -> "http://www.example.com:80/a/b",
      4L -> "http://www.example.com/a/b/",
      5L -> "http://www.example.com/a/b?utm_source=x&utm_medium=y&gclid=g&fbclid=f&ref=tw#frag",
      // query params in different order = same page
      6L -> "https://shop.example.com:443/p?b=2&a=1",
      7L -> "https://shop.example.com/p?a=1&b=2&utm_campaign=z",
      // NOT duplicates: different path, different surviving query, deeper path
      8L -> "http://www.example.com/a/c",
      9L -> "https://shop.example.com/p?a=1&b=3",
      10L -> "http://www.example.com/a/b/c")
    val df = urls.toDF("doc_id", "url")
    val out = functions.UrlCanon.withCanonicalUrl(df, "url")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(Set(1L, 2L, 3L, 4L, 5L).map(out) == Set("http://www.example.com/a/b"))
    assert(Set(6L, 7L).map(out) == Set("https://shop.example.com/p?a=1&b=2"))
    assert(out(8L) == "http://www.example.com/a/c")
    assert(out(9L) == "https://shop.example.com/p?a=1&b=3")
    assert(out(10L) == "http://www.example.com/a/b/c")
    assert(out.values.toSet.size == 5, out.toString)
  }

  test("urlDedupStats: keeper is the min id per canonical URL, removables attributed to their own source") {
    import spark.implicits._
    val df = Seq(
      (1L, "crawl", "http://ex.com/x"),
      (2L, "crawl", "HTTP://EX.COM:80/x/"),   // dup of 1 → crawl removable
      (3L, "feed", "http://ex.com/x?utm_source=a"), // dup of 1 → feed removable
      (4L, "feed", "http://ex.com/y"),        // unique
      (5L, "curated", "http://ex.com/z")      // unique
    ).toDF("doc_id", "source", "url")
    val st = functions.UrlCanon.urlDedupStats(df, "doc_id", "url", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(st.toSeq == Seq(
      ("crawl", 2L, 1L, 0.5), ("curated", 1L, 0L, 0.0), ("feed", 2L, 1L, 0.5)), st.toSeq)
  }

  test("url canonicalization round-trips engine-identically on the gate's derivation (spot sample vs DuckDB-verified forms)") {
    import spark.implicits._
    // the gate's four raw variants for pid 3 (doc ids 12..15): canonical
    // forms pinned literally so a regression in EITHER engine's template
    // shows up here without the oracle run
    val df = (12L to 15L).map(i => (i, "s")).toDF("doc_id", "source")
      .selectExpr("doc_id", s"${functions.UrlCanon.rawUrlSql("doc_id", "div", "STRING")} AS url")
    val out = functions.UrlCanon.withCanonicalUrl(df, "url")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(12L) == "http://www.example.com/site/page-3")
    assert(out(13L) == "http://www.example.com/site/page-3")
    assert(out(14L) == "http://www.example.com/site/page-3")
    assert(out(15L) == "https://cdn.example.com/assets/page-3?a=1&b=2")
  }

  test("dedupSpans: the repeated footer is excised, organic text survives byte-identical") {
    import spark.implicits._
    // three docs share a footer (df = 3 >= SpanDf); organic sentences are
    // unique (df = 1). doc 4 has no boilerplate at all.
    val docs = Seq(
      (1L, "alpha beta gamma. All rights reserved"),
      (2L, "delta epsilon zeta. All rights reserved"),
      (3L, "eta theta iota. All rights reserved"),
      (4L, "kappa lambda mu. nu xi omicron")
    ).toDF("doc_id", "text")
    val out = functions.TextAnalysis.dedupSpans(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 1L, "alpha beta gamma")), out(1L).toString)
    assert(out(2L) == ((2L, 1L, "delta epsilon zeta")), out(2L).toString)
    assert(out(3L) == ((2L, 1L, "eta theta iota")), out(3L).toString)
    // untouched doc: both sentences survive in order ('.' re-punctuation)
    assert(out(4L) == ((2L, 0L, "kappa lambda mu. nu xi omicron")), out(4L).toString)
  }

  test("dedupSpans: excision is order-preserving and partition-invariant; a fully-boilerplate doc rewrites to empty") {
    import spark.implicits._
    // footer appears mid-doc AND as a full doc; order of survivors must
    // follow original positions whatever the shuffle does
    val docs = Seq(
      (1L, "one two three. COMMON FOOTER HERE. four five six. seven eight nine"),
      (2L, "COMMON FOOTER HERE"),
      (3L, "COMMON FOOTER HERE. unique tail sentence"),
      (4L, "COMMON FOOTER HERE")
    ).toDF("doc_id", "text")
    for (parts <- Seq(1, 7)) {
      val out = functions.TextAnalysis.dedupSpans(docs.repartition(parts)).collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
      assert(out(1L) == ((1L, "one two three. four five six. seven eight nine")), out(1L).toString)
      assert(out(2L) == ((1L, "")), out(2L).toString)
      assert(out(3L) == ((1L, " unique tail sentence")), out(3L).toString)
    }
  }

  test("paragraphMinhashPairs: cross-doc duplicated paragraph found at its (doc, para) position; organic paragraphs stay clean") {
    import spark.implicits._
    val boiler = "install the framework then configure the cluster then deploy the service " +
      "then monitor the pipeline then rotate the credentials then archive the logs"
    val near = boiler + " carefully" // one extra token → J well above 0.6
    val docs = Seq(
      (1L, s"totally original opening paragraph about alpha beta gamma delta epsilon zeta\n\n$boiler"),
      (2L, s"$boiler\n\nanother unique paragraph mentioning eta theta iota kappa lambda mu nu"),
      (3L, s"unrelated first block omicron pi rho sigma tau upsilon phi chi\n\nsecond unrelated block psi omega one two three four five\n\n$near"),
      (4L, "a document with no duplicated content at all just plain words here")
    ).toDF("doc_id", "text")
    val pairs = graft.CacheScope.withScope { implicit s =>
      dedup.DedupApi.paragraphMinhashPairs(docs, "doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    }
    // the boiler paragraph sits at (1, para 1), (2, para 0), (3, para 2)
    val keys = pairs.map(p => (p._1, p._2, p._3, p._4))
    assert(keys.contains((1L, 1L, 2L, 0L)), pairs.toString)   // exact dup, J = 1
    assert(keys.contains((1L, 1L, 3L, 2L)), pairs.toString)   // near dup
    assert(keys.contains((2L, 0L, 3L, 2L)), pairs.toString)
    assert(pairs.size == 3, s"organic paragraphs must not pair: $pairs")
    assert(pairs.find(p => (p._1, p._3) == ((1L, 2L))).get._5 == 1.0)
    assert(pairs.filter(p => p._3 == 3L).forall(p => p._5 >= 0.6 && p._5 < 1.0), pairs.toString)
  }

  test("pipeline_schema_drift: the engine-derived report carries exactly the drift facts plus the implied data audit") {
    val rows = schema.SchemaQueries.schemaDrift.build(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val schemaFacts = rows.filter(_._1.startsWith("schema_")).toSet ++
      rows.filter(_._1 == "compat_violation").toSet
    assert(schemaFacts == Set(
      ("schema_added", "l_flag", "string", 1L),
      ("schema_removed", "l_tax", "double", 1L),
      ("schema_renamed", "quantity", "from l_quantity", 1L),
      ("schema_retyped", "l_linenumber", "int -> long (widening)", 1L),
      ("schema_retyped", "l_suppkey", "long -> int (narrowing)", 1L),
      ("compat_violation", "l_suppkey", "incompatible_type", 1L)), schemaFacts.toString)
    val data = rows.filter(_._1.startsWith("data_")).map(r => r._1 -> r._4).toMap
    val n = Tables.lineitem(spark, TestSpark.sfDir).count()
    assert(data("data_rows") == n && data("data_backfill") == n)
    assert(data("data_drop_loss") == n)      // l_tax is fully populated
    assert(data("data_narrow_overflow") == 0L) // suppkeys fit int today — the check is the point
  }

  test("text_repetition: planted loop docs hit the closed-form duplicate n-gram fractions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),              // bigrams 5 / distinct 2 → 0.6; trigrams 4 / 2 → 0.5
      (2L, "w x y z"),                  // all distinct → 0.0 / 0.0
      (3L, "solo"),                     // no bigrams → NULL / NULL
      (4L, "two words")                 // 1 bigram distinct → 0.0; no trigram → NULL
    ).toDF("doc_id", "text")
    val out = functions.TextAnalysis.repetitionOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    assert(out(1L) == ((6L, 0.6, 0.5)), out(1L).toString)
    assert(out(2L) == ((4L, 0.0, 0.0)), out(2L).toString)
    assert(out(3L) == ((1L, null, null)), out(3L).toString)
    assert(out(4L) == ((2L, 0.0, null)), out(4L).toString)
  }

  test("semanticDecontaminate: a corpus vector colinear with a bench vector is flagged; orthogonal content is not") {
    import spark.implicits._
    val dim = similarity.Similarity.Dim
    def vec(axis: Int, scale: Float): Array[Float] =
      Array.tabulate(dim)(i => if (i == axis) scale else 0.0f)
    val bench = Seq((1000L, vec(0, 1.0f)), (1001L, vec(3, 2.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, vec(0, 5.0f)),   // colinear with bench 1000 → cos 1, same buckets
      (2L, vec(7, 1.0f)),   // orthogonal to every bench vector
      (3L, vec(3, 0.5f))    // colinear with bench 1001
    ).toDF("vec_id", "embedding")
    val out = graft.CacheScope.withScope { implicit s =>
      functions.Pipeline.semanticDecontaminate(corpus, bench, "vec_id", "embedding", 0.9)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    }
    assert(out.keySet == Set(1L, 3L), out.toString)
    assert(out(1L) == ((1L, 1.0)) && out(3L) == ((1L, 1.0)), out.toString)
  }

  test("rocAucOfScores: midrank ties hit the closed form at any partitioning; perfect and inverted rankings bound it") {
    import spark.implicits._
    // pos scores {3, 2}, neg {1, 2}: U = 1 + 1 + 1 + 0.5 = 3.5 → AUC 0.875
    val zz = Seq((3.0, 1.0), (2.0, 1.0), (1.0, 0.0), (2.0, 0.0)).toDF("z", "y")
    for (parts <- Seq(1, 7)) {
      val r = CacheScope.withScope { implicit s =>
        operators.Analytics.rocAucOfScores(zz.repartition(parts)).collect().head }
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 3L)), r.toString)
      assert(r.getDouble(3) == 0.875, s"parts=$parts: ${r.getDouble(3)}")
    }
    // separable → 1.0; anti-separable → 0.0; all-tied → 0.5 exactly
    def auc(rows: Seq[(Double, Double)]): Double = CacheScope.withScope { implicit s =>
      operators.Analytics.rocAucOfScores(rows.toDF("z", "y")).collect().head.getDouble(3) }
    assert(auc(Seq((5.0, 1.0), (4.0, 1.0), (1.0, 0.0))) == 1.0)
    assert(auc(Seq((1.0, 1.0), (5.0, 0.0))) == 0.0)
    assert(auc(Seq((2.0, 1.0), (2.0, 0.0), (2.0, 1.0))) == 0.5)
  }

  test("calendarFill: holes restore with n = 0 and the last observed sum carried forward") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // type A observed on days 1 and 4 (hole 2-3); type B dense 2 days
    val ev = Seq(
      ("A", t("2024-03-01 10:00:00"), 5.0),
      ("A", t("2024-03-01 11:00:00"), 7.0),
      ("A", t("2024-03-04 09:00:00"), 1.0),
      ("B", t("2024-03-02 08:00:00"), 2.0),
      ("B", t("2024-03-03 08:00:00"), 3.0)
    ).toDF("event_type", "ts", "value")
    val out = operators.Insights2.calendarFill(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getInt(3), r.getDouble(4)))).toMap
    assert(out(("A", "2024-03-01")) == ((2L, 1, 12.0)))
    assert(out(("A", "2024-03-02")) == ((0L, 0, 12.0)), "hole carries day-1 sum")
    assert(out(("A", "2024-03-03")) == ((0L, 0, 12.0)))
    assert(out(("A", "2024-03-04")) == ((1L, 1, 1.0)))
    assert(out(("B", "2024-03-02")) == ((1L, 1, 2.0)))
    assert(out(("B", "2024-03-03")) == ((1L, 1, 3.0)))
    assert(out.size == 6, s"calendar spans per type only: ${out.keySet}")
  }

  test("ml_bootstrap_ci: the Poisson envelope brackets the point mean, scales with n, and is run-invariant") {
    val r = operators.Analytics.mlBootstrapCi.build(spark, TestSpark.sfDir).collect().head
    val (nRows, est, nReps, lo, hi, covers) =
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))
    assert(nReps == 16L && covers, r.toString)
    assert(lo < est && est < hi, r.toString)
    // envelope width ~ K/sqrt(n) of the mean: with cv(l_extendedprice)
    // ≈ 0.6 and 16 reps, K ≈ 4·0.6 — assert the right ORDER, not noise
    val bound = 5.0 / math.sqrt(nRows.toDouble)
    assert((hi - lo) / est < bound && (hi - lo) > 0, s"$r spread vs $bound")
    assert(nRows == Tables.lineitem(spark, TestSpark.sfDir).count())
    // hash-derived weights: the whole readout is partitioning-independent
    val again = operators.Analytics.mlBootstrapCi.build(spark, TestSpark.sfDir).collect().head
    assert(again.toSeq == r.toSeq, s"non-deterministic bootstrap: ${again.toSeq} vs ${r.toSeq}")
  }

  test("rollingMetrics: a calendar hole participates as ZERO in the rolling window (the q94 composition point)") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // days 1, 2, 4 observed (hole on 3): windows must span CALENDAR days
    val ev = Seq(
      ("A", t("2024-03-01 10:00:00"), 10.0),
      ("A", t("2024-03-02 10:00:00"), 20.0),
      ("A", t("2024-03-04 10:00:00"), 40.0)
    ).toDF("event_type", "ts", "value")
    val out = operators.Insights2.rollingMetrics(ev).collect()
      .map(r => r.getString(1) -> ((r.getDouble(2), r.getDouble(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(out("2024-03-01") == ((10.0, 10.0, 1L, 10.0, 10.0, 10.0)))
    assert(out("2024-03-02") == ((20.0, 30.0, 2L, 15.0, 10.0, 20.0)))
    // the hole: day_value 0, window mean divides by the TRUE 3 days,
    // roll_min is pulled to 0 by the filled day
    assert(out("2024-03-03") == ((0.0, 30.0, 3L, 10.0, 0.0, 20.0)), out("2024-03-03").toString)
    assert(out("2024-03-04") == ((40.0, 70.0, 4L, 17.5, 0.0, 40.0)), out("2024-03-04").toString)
    assert(out.size == 4)
  }
}
