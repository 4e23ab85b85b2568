package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contracts for the round-6 training-prep operators: BPE
  * merge training (closed-form merge sequence on a textbook corpus),
  * epoch-based upsampling (copy-count structure), and the sweep-line
  * peak-concurrency scan (closed form + the two-level global cumsum's
  * partition invariance). */
class TrainingPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("BPE learns the textbook merge sequence on low/low/lower") {
    import spark.implicits._
    // the classic BPE walkthrough: 'low' x2 + 'lower' x1.
    // pair counts round 1: (l,o)=3 (o,w)=3 (w,e)=1 (e,r)=1 ->
    // lexicographic tie-break picks (l,o); then (lo,w)=3; then the
    // n=1 tie between (low,e) and (e,r) resolves to (e,r); then
    // (low,er); round 5 has no pairs left and emits nothing.
    val docs = Seq((1L, "low"), (2L, "low"), (3L, "lower")).toDF("doc_id", "text")
    val got = CacheScope.withScope { implicit s =>
      functions.Corpus.bpeTrain(docs, "text", rounds = 5)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    assert(got == Seq(
      (1, "l", "o", 3L),
      (2, "lo", "w", 3L),
      (3, "e", "r", 1L),
      (4, "low", "er", 1L)),
      s"merge sequence was $got")
  }

  test("BPE merges every non-overlapping occurrence in one round, including adjacent repeats") {
    import spark.implicits._
    // 'abab': round 1 must merge BOTH (a,b) occurrences (left-to-right
    // non-overlapping), leaving [ab, ab] — a separator-consuming
    // encoding would merge only the first. Round 2 then merges (ab,ab).
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    val got = CacheScope.withScope { implicit s =>
      functions.Corpus.bpeTrain(docs, "text", rounds = 2)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    assert(got == Seq((1, "a", "b", 2L), (2, "ab", "ab", 1L)), s"got $got")
  }

  test("epoch mix emits floor(e) guaranteed copies and at most one fractional copy") {
    val out = functions.Pipeline.epochMix.build(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    val byDoc = out.groupBy(d => (d._1, d._2))
    byDoc.foreach { case ((doc, src), copies) =>
      val ep = 5000 + (src.drop(3).toInt % 5) * 6000
      val flo = ep / 10000
      val ks = copies.map(_._3).sorted.toSeq
      // copies are a prefix 0..m-1 with flo <= m <= flo+1
      assert(ks == (0L until ks.length.toLong).toSeq, s"doc $doc copies not a prefix: $ks")
      assert(ks.length >= flo && ks.length <= flo + 1,
        s"doc $doc of $src (e=$ep) emitted ${ks.length} copies")
    }
    // sources with e < 1 keep SOME docs (frac gate) but not all;
    // sources with e > 2 emit at least 2 copies for every doc
    val bySrc = out.groupBy(_._2)
    val lowSrc = bySrc.filter { case (s, _) => s.drop(3).toInt % 5 == 0 } // e = 0.5
    assert(lowSrc.nonEmpty && lowSrc.forall { case (_, rows) => rows.groupBy(_._1).forall(_._2.length == 1) })
    val hiSrc = bySrc.filter { case (s, _) => s.drop(3).toInt % 5 == 4 } // e = 2.9
    assert(hiSrc.nonEmpty && hiSrc.forall { case (_, rows) => rows.groupBy(_._1).forall(_._2.length >= 2) })
  }

  test("peak concurrency matches the closed form and is partition-count invariant") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def at(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    // width 60 s: events at 0,30,45 overlap (peak 3), then a lone one
    // at 200; next day one event (peak 1)
    val ev = Seq(
      (1L, at(0)), (2L, at(30)), (3L, at(45)), (4L, at(200)),
      (5L, new java.sql.Timestamp(base.getTime + 86400L * 1000))).toDF("event_id", "ts")
    def run(parts: Int): Seq[(java.sql.Date, Long)] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try CacheScope.withScope { implicit s =>
        operators.Extra.peakConcurrency(ev.repartition(parts), widthSeconds = 60)
          .collect().map(r => (r.getDate(0), r.getLong(1))).toSeq
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val got = run(2)
    assert(got.map(_._2) == Seq(3L, 1L), s"got $got")
    assert(run(7) == got, "sweep result changed with partition count")
  }

  test("BPE encode applies the trained merges: low/lower tokenize through the learned vocab") {
    import spark.implicits._
    // after the textbook merges (l,o)(lo,w)(e,r)(low,er): 'low' → 1
    // token, 'lower' → 1 token, an unmerged word char-splits
    val docs = Seq((1L, "low low lower"), (2L, "ox")).toDF("doc_id", "text")
    val got = CacheScope.withScope { implicit s =>
      // rounds=4 learns the textbook (l,o)(lo,w)(e,r)(low,er) here —
      // 'ox' merges only in round 5, so it must stay char-split
      val enc = functions.Corpus.bpeWordEncoding(docs, "text", rounds = 4)
        .collect().map(r => (r.getString(0),
          r.getString(2).stripPrefix("").stripSuffix("").split("").toSeq))
        .toMap
      enc
    }
    assert(got("low") == Seq("low"), s"'low' fully merged, got ${got("low")}")
    assert(got("lower") == Seq("lower"), s"'lower' fully merged, got ${got("lower")}")
    // 'ox' shares no trained pair — stays char-split
    assert(got("ox") == Seq("o", "x"), s"'ox' must stay char-split, got ${got("ox")}")
  }
}
