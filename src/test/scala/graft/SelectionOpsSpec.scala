package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral properties for the round-6 selection/audit operators:
  * MMR diversity reranking, the keep-best cluster policy, the global
  * quality-percentile gate, readability scoring, and the train→test
  * split-leakage audit. The DuckDB gate pins cross-engine exactness;
  * these pin the SEMANTICS (diversity actually traded for relevance,
  * the kept doc actually the best, the threshold actually the p75). */
class SelectionOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("MMR step 2 trades relevance for diversity; plain top-k would not") {
    import spark.implicits._
    // probe 0; candidates 1 and 2 nearly identical to each other and
    // most relevant; candidate 3 less relevant but diverse. Plain
    // top-3 ranks [1, 2, 3]; MMR must pick 3 at step 2 because 2's
    // redundancy with the already-selected 1 eats its margin.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.14f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.141f, 0.0f, 0.0f)),
      (3L, Array(0.8f, -0.6f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val probe = Seq(Tuple1(0L)).toDF("vec_id")
    def run(parts: Int): Seq[(Long, Int, Long)] = CacheScope.withScope { implicit s =>
      similarity.AnnApi.mmrTopK(vecs.repartition(parts), "vec_id", "embedding",
          probe, poolSize = 10, k = 3, lambda = 0.5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    }
    val sel = run(2)
    assert(sel.map(_._3) == Seq(1L, 3L, 2L),
      s"MMR order must be [1, 3, 2] (diversity pick at step 2), got $sel")
    // and the greedy selection is partitioning-invariant
    assert(run(5) == sel)
  }

  test("keep-best retains exactly one member per cluster — the (q, -id)-max one") {
    val rows = dedup.Dedup.keepBest.build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.nonEmpty)
    byCluster.foreach { case (c, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1, s"cluster $c kept ${kept.length} members")
      // winner = max quality, min id among quality ties
      val best = members.maxBy(m => (m._3, -m._1))
      assert(kept.head._1 == best._1,
        s"cluster $c kept ${kept.head} but best is $best")
    }
    // multi-member clusters exist at sf0.001 (else the policy is untested)
    assert(byCluster.exists(_._2.length > 1))
  }

  test("quality gate keeps precisely the docs at or above the corpus p75") {
    val out = functions.Pipeline.qualityGate.build(spark, sfDir).collect()
    assert(out.nonEmpty)
    val thr = out.head.getDouble(2)
    // every emitted doc clears the threshold the query itself reports
    assert(out.forall(_.getLong(1).toDouble >= thr))
    // independent count: score every doc, compare the kept population
    val toks = split(Portable.normText(col("text")), " ")
    val scores = Tables.documents(spark, sfDir)
      .select(col("doc_id"), toks.as("toks"))
      .select(expr("(size(array_distinct(toks)) * 1000000L) div size(toks)").as("q"))
      .collect().map(_.getLong(0)).sorted
    val expectKept = scores.count(_.toDouble >= thr)
    assert(out.length == expectKept, s"kept ${out.length}, expected $expectKept")
    // the reported threshold IS percentile_cont(0.75): rank 0.75(n-1)
    val pos = 0.75 * (scores.length - 1)
    val (lo, hi) = (scores(pos.toInt), scores(math.ceil(pos).toInt))
    val expectThr = lo + (pos - math.floor(pos)) * (hi - lo)
    assert(math.abs(thr - expectThr) < 1e-9, s"thr $thr != percentile_cont $expectThr")
  }

  test("readability counts and Flesch score match the closed form") {
    import spark.implicits._
    // 5 words, 6 vowel-group syllables, 2 sentence terminators
    val df = Seq((1L, "Hello world. It is good!", 24)).toDF("doc_id", "text", "n_chars")
    val toksOf = split(Portable.normText(col("text")), " ")
    val r = df.select(
        size(toksOf).as("w"),
        size(regexp_extract_all(Portable.normText(col("text")), lit("[aeiou]+"), lit(0))).as("syl"),
        greatest(lit(1), size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))).as("sen"))
      .collect().head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((5, 6, 2)))
    val flesch = 206.835 - 1.015 * (5.0 / 2) - 84.6 * (6.0 / 5)
    assert(math.abs(flesch - 102.7775) < 1e-9)
    // and the gated query emits that exact score for an equivalent doc
    val out = functions.TextAnalysis.readability.build(spark, sfDir)
      .filter(col("n_words") === 5 && col("n_syllables") === 6 && col("n_sentences") === 2)
    out.collect().foreach(row => assert(row.getDouble(4) == 102.7775))
  }

  test("containment pairs find the excerpt Jaccard misses, and equal the capped brute scan") {
    import spark.implicits._
    val body = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"$body extra trailing words making this the long container document"),
      (2L, body.split(" ").take(12).mkString(" ")), // excerpt: 12 of doc 1's first tokens
      (3L, (100 to 130).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val got = CacheScope.withScope { implicit s =>
      dedup.DedupApi.containmentPairs(docs, "doc_id", "text", threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    }
    // the excerpt's 10 shingles are all in the container: C = 1.0 —
    // while its Jaccard vs doc 1 is 10/48 ≈ 0.21, far below any
    // near-dup threshold
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)), s"got $got")
    assert(got.head._3 == 1.0)
    // brute equality on a seeded overlap corpus, same df-cap blocking
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(30)(i => s"w$i")
    val corpus = (0 until 60).map { i =>
      (i.toLong, Vector.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val cap = 10
    val shingles = CacheScope.withScope { implicit s =>
      dedup.DedupApi.shingleHashes60(corpus, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    }
    val df60 = shingles.values.flatten.groupBy(identity).map { case (h, xs) => (h, xs.size) }
    val keptSh = shingles.map { case (d, s) => (d, s.filter(h => df60(h) <= cap)) }
    val brute = (for {
      (a, sa) <- shingles.toSeq; (b, sb) <- shingles.toSeq if a < b
      if (keptSh(a) & keptSh(b)).nonEmpty // df-capped blocking
      c = (sa & sb).size.toDouble / math.min(sa.size, sb.size) if c >= 0.5
    } yield (a, b)).toSet
    val engine = CacheScope.withScope { implicit s =>
      dedup.DedupApi.containmentPairs(corpus, "doc_id", "text",
          threshold = 0.5, maxShingleDocs = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(engine == brute, s"engine ${engine.size} pairs != brute ${brute.size}")
  }

  test("split leakage equals the quadratic train×test scan") {
    val bucket = pmod(Portable.h60(col("doc_id").cast("string")), lit(100))
    val docs = Tables.documents(spark, sfDir).withColumn("bkt", bucket)
    val sig = dedup.DedupApi.simhashSignatures(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("bkt")), Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tr = sig.filter(_._3 < 90)
    val te = sig.filter(_._3 >= 95)
    val brute = (for {
      (ta, sa, _) <- tr
      (tb, sb, _) <- te
      if java.lang.Long.bitCount(sa ^ sb) <= 6
    } yield (ta, tb)).toSet
    val got = functions.Pipeline.splitLeakage.build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"banded leakage ${got.size} pairs != quadratic ${brute.size}")
    assert(brute.nonEmpty, "sf0.001 must contain at least one leaking pair")
  }

  test("DSIR selection keeps the top quartile and over-represents the target domain") {
    val kept = functions.Pipeline.dsirSelect.build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(kept.nonEmpty)
    val thr = kept.head._3
    assert(kept.forall(_._2.toDouble >= thr), "every kept doc must clear the p75 threshold")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val n = docs.size
    // p75 gate keeps ~25% (ties at the threshold may widen it slightly)
    assert(kept.length >= n / 5 && kept.length <= n / 2,
      s"p75 gate kept ${kept.length} of $n docs")
    // the selected set must be richer in the target (en) domain than
    // the corpus base rate — the whole point of importance weighting
    val baseRate = docs.values.count(_ == "en").toDouble / n
    val keptRate = kept.count(k => docs(k._1) == "en").toDouble / kept.length
    assert(keptRate > baseRate,
      s"target-domain rate among kept ($keptRate) must exceed base rate ($baseRate)")
  }

  test("winsorize clips ~5% per tail and the winsorized mean sits inside the band") {
    val rows = operators.Extra.q52.build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, lo, hi, mean) =>
      // p05/p95 thresholds: each tail clips at most ~5% + interpolation slack
      assert(lo <= n * 6 / 100 && hi <= n * 6 / 100,
        s"$et clipped too much: lo=$lo hi=$hi of $n")
      assert(lo + hi >= n * 6 / 100,
        s"$et clipped too little: lo=$lo hi=$hi of $n — thresholds not biting")
      assert(!mean.isNaN)
    }
  }

  test("q53 ewma: closed weighted-mean form equals the literal recursion on a driver replay") {
    val got = operators.Extra.q53.build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    // replay the textbook recursion ewma = 0.5 x + 0.5 prev over each
    // user's full ordered history, then compare at the last event:
    // within the 16-step horizon the truncation error is <= 2^-16 of
    // the value scale, far below the round(6) output grid only when
    // values are bounded - so compare against the truncated recursion
    // (weights renormalized over the last 16), which is EXACTLY the
    // closed form
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tsu"),
        col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
    val byUser = ev.groupBy(_._1).map { case (u, a) =>
      val vs = a.map(_._2).sortBy(t => (t._1, t._2)).map(_._3).takeRight(16).reverse
      val num = vs.zipWithIndex.map { case (v, i) => v * math.pow(2.0, 15 - i) }.sum
      val den = vs.indices.map(i => math.pow(2.0, 15 - i)).sum
      u -> num / den
    }
    byUser.foreach { case (u, expct) =>
      assert(got.contains(u), s"user $u missing")
      assert(math.abs(got(u) - expct) < 1e-5, s"user $u: got ${got(u)} expected $expct")
    }
  }

  test("text_entropy: closed forms on planted docs, bounds on real data") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b b"),        // H = ln2, norm = ln2/ln4 = 0.5
      (2L, "a b c d"),        // uniform: H = ln4, norm = 1
      (3L, "a a a a a"),      // degenerate: H = 0, norm = 0
      (4L, "x")               // single token: H = 0, norm = 0 by convention
    ).toDF("doc_id", "text")
    val r = functions.TextAnalysis.entropyDf(docs).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r(1L)._1 == 4 && r(1L)._2 == 2)
    assert(math.abs(r(1L)._3 - math.log(2)) < 1e-5)
    assert(math.abs(r(1L)._4 - 0.5) < 1e-5)
    assert(math.abs(r(2L)._3 - math.log(4)) < 1e-5 && math.abs(r(2L)._4 - 1.0) < 1e-5)
    assert(math.abs(r(3L)._3) < 1e-5 && math.abs(r(3L)._4) < 1e-5)
    assert(r(4L)._3 == 0.0 && r(4L)._4 == 0.0)
    // real data: 0 <= H <= ln(n_tokens), norm in [0, 1]
    val real = functions.TextAnalysis.entropy.build(spark, TestSpark.sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { x =>
      val (n, h, hn) = (x.getLong(1), x.getDouble(3), x.getDouble(4))
      // half-ulp slack at 6 dp: the reported H is round(·, 6)
      assert(h >= -5e-7 && h <= math.log(n.toDouble) + 5e-7, s"doc ${x.getLong(0)}: H=$h out of bounds")
      assert(hn >= -5e-7 && hn <= 1 + 5e-7)
    }
  }

  test("corpus_vocab_growth: cumulative axes are consistent and monotone") {
    val rows = functions.Corpus.vocabGrowth.build(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    Seq[((Long, Long, Long, Long)) => Long](_._2, _._3, _._4).foreach { ax =>
      val v = rows.map(ax)
      assert(v.zip(v.tail).forall { case (a, b) => a <= b }, s"axis not monotone: ${v.toSeq}")
    }
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val totalDocs = docs.count()
    val vocab = docs.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(Portable.normText(
          org.apache.spark.sql.functions.col("text")), " ")).as("tok"))
      .distinct().count()
    assert(rows.last._2 == totalDocs, "final cum_docs must equal the corpus size")
    assert(rows.last._4 == vocab, "final cum_vocab must equal the distinct token count")
  }

  test("q58 attribution: planted last-touch fixture, tolerance and strict ordering honored") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(min * 60000L)
    val ev = Seq(
      // user 1: click at 10, purchase at 30 -> click attributed
      (1L, ts(10), 1L, "click"), (2L, ts(30), 1L, "purchase"),
      // user 2: view at 10, purchase at 100 -> stale (>1h), none
      (3L, ts(10), 2L, "view"), (4L, ts(100), 2L, "purchase"),
      // user 3: view 5 then click 20, purchase 25 -> click (latest wins)
      (5L, ts(5), 3L, "view"), (6L, ts(20), 3L, "click"), (7L, ts(25), 3L, "purchase"),
      // user 4: purchase with no touches -> none
      (8L, ts(40), 4L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val got = operators.Analytics.lastTouchAttribution(ev).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(
      "click" -> ((2L, 0.5d)), "none" -> ((2L, 0.5d))), s"got $got")
  }

  test("topic clusters separate a planted two-topic corpus and are partition invariant") {
    import spark.implicits._
    // topic A docs speak only feline tokens, topic B only canine —
    // hashed 16-dim vectors are orthogonal-ish, so no cluster may mix
    val a = (0 until 20).map(i => (i.toLong, "cat whisker purr feline cat purr"))
    val b = (0 until 20).map(i => (100L + i, "dog bark fetch canine dog bark"))
    def run(parts: Int) = CacheScope.withScope { implicit s =>
      functions.Corpus.topicClustersOf((a ++ b).toDF("doc_id", "text").repartition(parts))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3), r.getLong(4)))
    }
    val r1 = run(3)
    // structure: ≤3 ranked terms per cluster, sizes cover the corpus
    val byCluster = r1.groupBy(_._1)
    byCluster.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length), s"ranks dense: $rows")
      assert(rows.length <= 3)
      assert(rows.map(_._2).distinct.length == 1, "one size per cluster")
    }
    assert(byCluster.map(_._2.head._2).sum == 40L, "cluster sizes cover the corpus")
    // both topics' dominant tokens surface somewhere in the summaries
    val allTop = r1.map(_._4).toSet
    assert(allTop.contains("cat") || allTop.contains("purr"), s"feline topic absent: $allTop")
    assert(allTop.contains("dog") || allTop.contains("bark"), s"canine topic absent: $allTop")
    // determinism is the hard guarantee: identical output at any partitioning
    assert(r1.toSeq == run(7).toSeq, "clustering must be partition-count invariant")
  }

  test("q58 attribution on real data: shares sum to 1 over known channels") {
    val rows = operators.Analytics.q58.build(spark, TestSpark.sfDir).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("click", "view", "none")))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
  }
}
