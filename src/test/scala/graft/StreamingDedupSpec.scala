package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.Streams
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming dedup (`dropDuplicatesWithinWatermark`) and partitioned
  * sink layout — the streaming/storage counterparts of the batch
  * dedup and sources layers. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming dedup drops replayed event ids within the watermark") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-dedup-in").toString
    Seq(
      Streams.Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
      Streams.Event(2, ts("2024-01-01 00:01:00"), 1, "click", 2.0),
      Streams.Event(1, ts("2024-01-01 00:00:30"), 1, "click", 1.0) // replay of id 1
    ).toDF().coalesce(1).write.parquet(s"$in/b000")
    Seq(
      Streams.Event(2, ts("2024-01-01 00:02:00"), 1, "click", 2.0), // replay of id 2
      Streams.Event(3, ts("2024-01-01 00:03:00"), 2, "view", 3.0)
    ).toDF().coalesce(1).write.parquet(s"$in/b001")

    val q = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"got $ids")
  }

  test("streaming URL dedup: spellings of one page collapse across microbatches, distinct pages pass (r10)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-urldedup-in").toString
    Seq(
      (1L, ts("2024-01-01 00:00:00"), "http://ex.com/x"),
      (2L, ts("2024-01-01 00:00:30"), "HTTP://EX.COM:80/x/#frag")    // same page, batch 1
    ).toDF("doc_id", "ts", "url").coalesce(1).write.parquet(s"$in/b000")
    Seq(
      (3L, ts("2024-01-01 00:01:00"), "http://ex.com/x?utm_source=a"), // same page, batch 2
      (4L, ts("2024-01-01 00:02:00"), "http://ex.com/y")               // distinct page
    ).toDF("doc_id", "ts", "url").coalesce(1).write.parquet(s"$in/b001")
    val stream = spark.readStream
      .schema(Seq((0L, ts("2024-01-01 00:00:00"), "")).toDF("doc_id", "ts", "url").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = Streams.urlDedupStream(stream)
      .writeStream.format("memory").queryName("urldedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("urldedup_out")
      .select("doc_id", "url_canon")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 2, rows.toSeq.toString)
    val byCanon = rows.groupBy(_._2)
    assert(byCanon.keySet == Set("http://ex.com/x", "http://ex.com/y"), byCanon.toString)
    // batch-1 spellings race within their microbatch (either may win);
    // the batch-2 replay of the same page must NOT pass
    assert(Set(1L, 2L).contains(byCanon("http://ex.com/x").head._1), rows.toSeq.toString)
    assert(byCanon("http://ex.com/y").head._1 == 4L)
  }

  test("streaming content dedup drops same-text docs and carries batch-identical simhash") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-docdedup-in").toString
    Seq(
      (1L, ts("2024-01-01 00:00:00"), "the quick brown fox"),
      (2L, ts("2024-01-01 00:01:00"), "a different document entirely"),
      (3L, ts("2024-01-01 00:02:00"), "The  quick   brown fox") // same normalized content as 1
    ).toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$in/b000")

    val q = Streams.dedupDocStream(
        spark.readStream
          .schema("doc_id LONG, ts TIMESTAMP, text STRING")
          .parquet(s"$in/*"))
      .writeStream.format("memory").queryName("doc_dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val out = spark.table("doc_dedup_out")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L), s"exact-content replay must be dropped, got $ids")
    // the streamed signature equals the batch engine's signature
    val batch = dedup.DedupApi.simhashSignatures(
        Seq((1L, "the quick brown fox")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0).getLong(1)
    val streamed = out.filter($"doc_id" === 1L).select("simhash").collect()(0).getLong(0)
    assert(streamed == batch, "streaming and batch simhash must be identical")
  }

  test("streaming banded near-dup pairs equal the batch pair set on the same data") {
    import spark.implicits._
    val docsLocal = Seq(
      (1L, ts("2024-01-01 00:00:00"),
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (2L, ts("2024-01-01 00:01:00"), // one token changed vs doc 1
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau phi"),
      (3L, ts("2024-01-01 00:02:00"),
        "completely different text about streaming joins watermarks and state stores in structured streaming"),
      (4L, ts("2024-01-01 00:03:00"), // exact duplicate of doc 1
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (5L, ts("2024-01-01 00:04:00"),
        "unrelated corpus entry with many novel words that share nothing with the others at all")
    ).toDF("doc_id", "ts", "text")
    val batchPairs = dedup.DedupApi.simhashPairs(docsLocal, "doc_id", "text",
        maxHamming = 6, banded = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(batchPairs.nonEmpty, "expected at least the exact-dup pair (1,4)")

    val in = Files.createTempDirectory("graft-neardup-in").toString
    docsLocal.coalesce(1).write.parquet(s"$in/b000")
    val sigs = dedup.DedupApi.simhashSignatures(docsLocal, "doc_id", "text")
    CacheScope.withScope { implicit scope =>
      val q = Streams.nearDupPairsStream(
          spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING").parquet(s"$in/*"),
          sigs)
        .writeStream.format("memory").queryName("neardup_out")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // raw-signature path: the 84x combo-key explode of the static side
      // must be persisted once, not recomputed per microbatch
      assert(scope.trackedCount == 1,
        "static combo-key explode must be persisted via the cache scope")
      val sw = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(sw))(q.explain())
      assert(sw.toString.contains("InMemoryTableScan"),
        "microbatch plan must read the static side from cache:\n" + sw)
    }
    val streamed = spark.table("neardup_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == batchPairs,
      s"stream pairs $streamed must equal batch pairs $batchPairs")
    assert(spark.table("neardup_out").columns.toSeq == Seq("doc_a", "doc_b", "hamming"))

    // pre-exploded static side (the batch-plane refresh contract):
    // identical pair output, no explode anywhere in the static branch
    val keysDir = Files.createTempDirectory("graft-neardup-keys").toString + "/keys"
    Streams.simhashComboKeyTable(sigs).write.parquet(keysDir)
    val q2 = Streams.nearDupPairsStream(
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING").parquet(s"$in/*"),
        spark.read.parquet(keysDir))
      .writeStream.format("memory").queryName("neardup_pre_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val streamedPre = spark.table("neardup_pre_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamedPre == batchPairs,
      s"pre-exploded static side changed the pair set: $streamedPre vs $batchPairs")
  }

  test("streaming near-dup pairs a stream doc whose id sorts BELOW its corpus match") {
    import spark.implicits._
    // corpus holds doc 10; the stream ingests doc 3 with identical
    // text — an order filter (static_id < stream_id) would silently
    // drop this true duplicate
    val staticDocs = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val sigs = dedup.DedupApi.simhashSignatures(staticDocs, "doc_id", "text")
    val in = Files.createTempDirectory("graft-neardup-orient").toString
    Seq((3L, ts("2024-01-01 00:00:00"), "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$in/b000")
    val q = Streams.nearDupPairsStream(
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING").parquet(s"$in/*"),
        sigs)
      .writeStream.format("memory").queryName("neardup_orient_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("neardup_orient_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((3L, 10L, 0)), s"got $got")
  }

  test("streaming repeated-span flags equal the batch substring pair set") {
    import spark.implicits._
    val shared = "this exact boilerplate sentence is long enough to winnow reliably"
    val corpus = Seq(
      (10L, s"corpus document one with $shared inside it and more text after"),
      (11L, "corpus document two with entirely unrelated content and nothing shared at all here"))
      .toDF("doc_id", "text")
    val streamDocs = Seq(
      (1L, ts("2024-01-01 00:00:00"), s"prefix words then $shared and a different tail"),
      (2L, ts("2024-01-01 00:01:00"), "a clean stream document sharing no span with the corpus whatsoever okay"))
      .toDF("doc_id", "ts", "text")

    // batch truth: substring pairs over corpus + stream docs, restricted
    // to (stream, corpus) pairs
    val batchPairs = dedup.DedupApi.substringPairs(
        corpus.union(streamDocs.select("doc_id", "text")), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 < 10 && p._2 >= 10)
    assert(batchPairs == Set((1L, 10L)), s"expected the planted span pair, got $batchPairs")

    val in = Files.createTempDirectory("graft-span-in").toString
    streamDocs.coalesce(1).write.parquet(s"$in/b000")
    // the refresh contract: the caller persists the fingerprint snapshot
    // (recomputing winnows of the whole corpus per microbatch is the
    // static-side anti-pattern the near-dup plane fixed in r4)
    val staticFps = dedup.DedupApi.winnowFingerprints(corpus, "doc_id", "text")
      .select(org.apache.spark.sql.functions.col("doc_id").as("static_id"),
        org.apache.spark.sql.functions.col("fp"))
      .cache()
    staticFps.count()
    try {
      val q = Streams.repeatedSpanStream(
          spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING").parquet(s"$in/*"),
          staticFps)
        .writeStream.format("memory").queryName("span_out")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val streamed = spark.table("span_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batchPairs,
        s"stream span flags $streamed must equal batch pairs $batchPairs")
      assert(spark.table("span_out").columns.toSeq == Seq("stream_id", "static_id"))
      // executed-microbatch plan shape: the stream side fingerprints
      // through the NATIVE winnow expression (shared with the batch
      // plane) and the static side reads the persisted snapshot, not a
      // per-batch recompute; candidates join on fp, never cartesian
      val sw = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(sw))(q.explain())
      val p = sw.toString
      assert(p.contains("graft_winnow"), "stream side must fingerprint natively:\n" + p)
      assert(p.contains("InMemoryTableScan"),
        "microbatch plan must read the static fingerprints from cache:\n" + p)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "span candidates must join on fp:\n" + p)
    } finally staticFps.unpersist()
  }

  test("intra-stream self-join pairs near-dups arriving within the window") {
    import spark.implicits._
    // 40-token docs, single-token mutations: hamming stays small when
    // most of the token multiset is shared (one token of forty)
    val toks = (0 until 40).map(i => s"w$i")
    val base = toks.mkString(" ")
    val mut1 = toks.updated(7, "x7").mkString(" ")
    val mut2 = toks.updated(31, "y31").mkString(" ")
    val streamDocs = Seq(
      // 1 & 2: near-dups 3 minutes apart → must pair
      (1L, ts("2024-01-01 00:00:00"), base),
      (2L, ts("2024-01-01 00:03:00"), mut1),
      // 3: near-dup of 1 but 2 HOURS later → outside the 10-min window
      (3L, ts("2024-01-01 02:00:00"), mut2),
      // 4: unrelated content inside the window → no pair
      (4L, ts("2024-01-01 00:04:00"), (0 until 40).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "ts", "text")
    val in = Files.createTempDirectory("graft-intra-in").toString
    streamDocs.coalesce(1).write.parquet(s"$in/b000")
    val q = Streams.intraStreamNearDupPairs(
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING").parquet(s"$in/*"))
      .writeStream.format("memory").queryName("intra_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("intra_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch truth restricted to the window: only (1, 2)
    val batch = dedup.DedupApi.simhashPairs(
        streamDocs.select("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.contains((1L, 2L)) && batch.contains((1L, 3L)),
      s"batch must see both near-dup pairs: $batch")
    assert(got == Set((1L, 2L)),
      s"stream must pair only the within-window near-dups, got $got")
    // the stream-stream join must carry the time-range state bound
    val sw = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(sw))(q.explain())
    assert(sw.toString.contains("StreamingSymmetricHashJoin"),
      "expected a watermark-bounded stream-stream join:\n" + sw.toString)
  }

  test("streaming embedding near-dup flags equal the batch LSH-blocked cosine pair set (r13)") {
    import spark.implicits._
    // corpus: 40 real sf0.001 embeddings; stream: 3 unrelated real
    // vectors (no cross pair clears 0.4 — measured) plus an exact
    // copy of corpus vec 1 (cos = 1) and a perturbed copy of corpus
    // vec 2 (cos ≈ 1): the flags must be exactly the batch
    // cosinePairsLsh cross pairs on the same data
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") <= 40)
    def vecOf(id: Long): Array[Float] =
      corpus.filter(col("vec_id") === id).collect().head
        .getSeq[Float](1).toArray
    val dup = vecOf(1)
    val near = vecOf(2); near(0) = near(0) + 0.01f
    val streamVecs = emb.filter(col("vec_id").between(41, 43))
      .unionAll(Seq((1001L, dup.toSeq), (1002L, near.toSeq)).toDF("vec_id", "embedding"))
      .withColumn("ts", lit(ts("2024-01-01 00:00:00")))
      .select("vec_id", "ts", "embedding")
    // batch truth: LSH-blocked cosine pairs over stream ∪ corpus,
    // restricted to cross pairs (stream ids are all > 40)
    val batchPairs = CacheScope.withScope { implicit s =>
      dedup.DedupApi.cosinePairsLsh(
          corpus.unionAll(streamVecs.drop("ts")), "vec_id", "embedding",
          threshold = 0.4,
          maxBucketSize = similarity.Similarity.KnnGraphMaxBucket)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter { case (a, b, _) => (a <= 40) != (b <= 40) }
        .toSet
    }
    assert(batchPairs.exists { case (a, b, _) => a == 1L && b == 1001L },
      s"expected the exact-copy pair in the batch truth: $batchPairs")
    assert(batchPairs.exists { case (a, b, _) => a == 2L && b == 1002L },
      s"expected the perturbed-copy pair in the batch truth: $batchPairs")
    val in = Files.createTempDirectory("graft-embdup-in").toString
    streamVecs.coalesce(1).write.parquet(s"$in/b000")
    val streamSchema = streamVecs.schema
    CacheScope.withScope { implicit scope =>
      val q = Streams.embedNearDupStream(
          spark.readStream.schema(streamSchema).parquet(s"$in/*"), corpus)
        .writeStream.format("memory").queryName("embdup_out")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // raw-corpus path: the bucket build must be persisted once, not
      // recomputed per microbatch
      assert(scope.trackedCount == 1,
        "corpus bucket table must be persisted via the cache scope")
      val sw = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(sw))(q.explain())
      assert(sw.toString.contains("InMemoryTableScan"),
        "microbatch plan must read the corpus buckets from cache:\n" + sw)
    }
    val streamed = spark.table("embdup_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batchPairs,
      s"stream flags $streamed must equal batch cross pairs $batchPairs")
    assert(spark.table("embdup_out").columns.toSeq == Seq("id_a", "id_b", "cos"))

    // pre-bucketed corpus side (the batch-plane refresh contract):
    // identical flags off the published snapshot
    val bkDir = Files.createTempDirectory("graft-embdup-bk").toString + "/bk"
    Streams.cosineBucketTable(corpus).write.parquet(bkDir)
    val q2 = Streams.embedNearDupStream(
        spark.readStream.schema(streamSchema).parquet(s"$in/*"),
        spark.read.parquet(bkDir))
      .writeStream.format("memory").queryName("embdup_pre_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val streamedPre = spark.table("embdup_pre_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamedPre == batchPairs,
      s"pre-bucketed corpus side changed the flag set: $streamedPre vs $batchPairs")
  }

  test("embedNearDupStream snapshot-refresh restart: checkpointed stream picks up a republished bucket table (r14)") {
    import spark.implicits._
    // The documented refresh contract, rehearsed end-to-end: publish a
    // bucket snapshot → run a checkpointed stream → republish with an
    // ENLARGED corpus → restart the SAME checkpoint against the new
    // snapshot. Must hold: (a) already-processed input is not
    // re-flagged (file-source log survives the restart), (b) new
    // arrivals pair against vectors that exist ONLY in the new
    // snapshot (the refresh is actually in effect).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val corpusV1 = emb.filter(col("vec_id") <= 40)
    def vecOf(id: Long): Array[Float] =
      corpusV1.filter(col("vec_id") === id).collect().head
        .getSeq[Float](1).toArray
    val base = Files.createTempDirectory("graft-embdup-restart").toString
    val (snapV1, snapV2) = (s"$base/snap_v1", s"$base/snap_v2")
    val (in, outDir, ck) = (s"$base/in", s"$base/out", s"$base/ck")
    Streams.cosineBucketTable(corpusV1).write.parquet(snapV1)
    // corpus v2 adds vec 50 (a copy of v1's vec 5) — republished snapshot
    val corpusV2 = corpusV1.unionAll(
      Seq((50L, vecOf(5).toSeq)).toDF("vec_id", "embedding"))
    Streams.cosineBucketTable(corpusV2).write.parquet(snapV2)

    val schema = "vec_id LONG, ts TIMESTAMP, embedding ARRAY<FLOAT>"
    def runOnce(snap: String): Unit = {
      val q = Streams.embedNearDupStream(
          spark.readStream.schema(schema).parquet(s"$in/*"),
          spark.read.parquet(snap))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    // run 1 against snapshot v1: stream vec 2001 = copy of corpus vec 1
    Seq((2001L, ts("2024-01-01 00:00:00"), vecOf(1).toSeq))
      .toDF("vec_id", "ts", "embedding").coalesce(1).write.parquet(s"$in/b000")
    runOnce(snapV1)
    def flagRows(): Seq[(Long, Long)] =
      spark.read.parquet(outDir).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val run1 = flagRows()
    assert(run1.contains((1L, 2001L)), s"run 1 must flag the planted copy: $run1")

    // run 2, SAME checkpoint, snapshot v2: stream vec 2002 = copy of vec 5
    Seq((2002L, ts("2024-01-01 00:01:00"), vecOf(5).toSeq))
      .toDF("vec_id", "ts", "embedding").coalesce(1).write.parquet(s"$in/b001")
    runOnce(snapV2)
    val run2 = flagRows()
    assert(run2.contains((50L, 2002L)),
      s"restart must pair against the snapshot-v2-only vector 50: $run2")
    assert(run2.contains((5L, 2002L)),
      s"restart must still pair against the carried-over corpus: $run2")
    assert(run2.count(_ == (1L, 2001L)) == 1,
      s"already-processed input must not be re-flagged after the restart: $run2")
    assert(run1.toSet.subsetOf(run2.toSet),
      s"restart must not lose run-1 flags: run1=$run1 run2=$run2")
  }

  test("embedNearDupStream static-side recognition: superset = pre-bucketed, near-miss rejected (r14)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") <= 40)
    val dup = corpus.filter(col("vec_id") === 1).collect().head
      .getSeq[Float](1).toArray
    val in = Files.createTempDirectory("graft-embdup-cols").toString
    Seq((3001L, ts("2024-01-01 00:00:00"), dup.toSeq))
      .toDF("vec_id", "ts", "embedding").coalesce(1).write.parquet(s"$in/b000")
    val schema = "vec_id LONG, ts TIMESTAMP, embedding ARRAY<FLOAT>"
    val bk = Streams.cosineBucketTable(corpus)
    // a republished snapshot with an extra partition column is STILL
    // pre-bucketed (r13 ADVICE: exact-set matching silently fell
    // through to the raw path and re-bucketed the 5-column frame)
    val q = Streams.embedNearDupStream(
        spark.readStream.schema(schema).parquet(s"$in/*"),
        bk.withColumn("dt", lit("2024-01-01")))
      .writeStream.format("memory").queryName("embdup_superset_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("embdup_superset_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 3001L)),
      s"superset-column snapshot must behave as pre-bucketed: $got")
    // a NEAR-MISS (bucket-table columns present but contract
    // incomplete) must fail loudly, not re-bucket or misjoin
    val ex = intercept[IllegalArgumentException] {
      Streams.embedNearDupStream(
        spark.readStream.schema(schema).parquet(s"$in/*"), bk.drop("snrm"))
    }
    assert(ex.getMessage.contains("cosineBucketTable"),
      s"near-miss error must point at the contract: ${ex.getMessage}")

    // width-aware slim pair (r14): identical flags off the 1x-payload
    // (buckets, vectors) snapshot
    val (slimBk, slimVecs) = Streams.cosineBucketTableSlim(corpus)
    val q3 = Streams.embedNearDupStream(
        spark.readStream.schema(schema).parquet(s"$in/*"), slimBk,
        staticVecSide = Some(slimVecs))
      .writeStream.format("memory").queryName("embdup_slim_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination(120000)
    val gotSlim = spark.table("embdup_slim_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val gotFat = spark.table("embdup_superset_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotSlim == gotFat,
      s"slim bucket pair changed the flag set: slim=$gotSlim fat=$gotFat")
    // the slim bucket half WITHOUT its vector side must fail with the
    // pointer at staticVecSide, not fall through to re-bucketing
    val ex2 = intercept[IllegalArgumentException] {
      Streams.embedNearDupStream(
        spark.readStream.schema(schema).parquet(s"$in/*"), slimBk)
    }
    assert(ex2.getMessage.contains("staticVecSide"),
      s"slim-half error must point at staticVecSide: ${ex2.getMessage}")
  }

  test("streaming bloom decontamination flags exactly the batch-contaminated docs") {
    import spark.implicits._
    val benchText = "the held out benchmark question about rivers and mountains of europe today"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val streamDocs = Seq(
      // shares an 8-token shingle with the benchmark → must flag
      (1L, ts("2024-01-01 00:00:00"), s"training doc that leaked $benchText verbatim inside"),
      // clean doc → must not flag
      (2L, ts("2024-01-01 00:01:00"), "a perfectly clean training document with no overlap at all in any shingle window"))
      .toDF("doc_id", "ts", "text")

    // batch truth with the same hash semantics: doc 1 only
    // (benchHk comes back already persisted by the builder)
    val (benchHk, blob) = Streams.benchBloomTables(bench)
    val benchHkP = benchHk; benchHkP.count()
    val blobP = blob.cache(); blobP.count()
    val batchFlags = streamDocs
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.explode(graft.functions.WordShingles.hashes(
          Portable.normText(org.apache.spark.sql.functions.col("text")),
          graft.functions.Pipeline.DecontaminationShingle)).as("hk"))
      .join(benchHkP, Seq("hk"), "left_semi")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(batchFlags == Set(1L), s"expected the planted leak, got $batchFlags")

    val in = Files.createTempDirectory("graft-decon-in").toString
    streamDocs.coalesce(1).write.parquet(s"$in/b000")
    try {
      val q = Streams.decontaminateStream(
          spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING").parquet(s"$in/*"),
          benchHkP, blobP)
        .writeStream.format("memory").queryName("decon_out")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val streamed = spark.table("decon_out").collect().map(_.getLong(0)).toSet
      assert(streamed == batchFlags,
        s"stream decontamination flags $streamed must equal batch $batchFlags")
      // executed-microbatch plan: native shingle hashing, the bloom
      // probe as a map-side Filter, and the verify side read from the
      // persisted benchmark hash set (never recomputed per batch)
      val sw = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(sw))(q.explain())
      val p = sw.toString
      assert(p.contains("graft_word_shingles"), "stream side must shingle natively:\n" + p)
      assert(p.contains("graft_bloom_contains"), "bloom prefilter missing from the microbatch plan:\n" + p)
      assert(p.contains("InMemoryTableScan"),
        "verify must read the persisted benchmark hashes from cache:\n" + p)
    } finally { benchHkP.unpersist(); blobP.unpersist() }
  }

  test("streaming ingest composes quality gate, decontamination drop, and exact dedup") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val benchText = "the held out benchmark passage about rivers and mountains of europe today"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val filler = (1 to 30).map(i => s"word$i").mkString(" ") // 30 distinct tokens
    val docs = Seq(
      // 1: clean, quality-passing -> kept
      (1L, ts("2024-01-01 00:00:00"), s"$filler alpha"),
      // 2: too short (3 tokens) -> quality-dropped
      (2L, ts("2024-01-01 00:00:10"), "too short doc"),
      // 3: contaminated (shares an 8-shingle with the benchmark) -> dropped
      (3L, ts("2024-01-01 00:00:20"), s"$filler leaked $benchText"),
      // 4: exact duplicate of 1 (same normalized text) -> deduped
      (4L, ts("2024-01-01 00:00:30"), s"$filler   alpha"),
      // 5: repetitive (2 distinct / 40 tokens, uniq ratio 0.05) -> quality-dropped
      (5L, ts("2024-01-01 00:00:40"), Seq.fill(20)("spam ham").mkString(" ")),
      // 6: clean and distinct -> kept
      (6L, ts("2024-01-01 00:00:50"), s"$filler beta"))
      .toDF("doc_id", "ts", "text")
    val in = Files.createTempDirectory("graft-ingest-in").toString
    docs.coalesce(1).write.parquet(s"$in/b000")
    val (benchHk, blob) = Streams.benchBloomTables(bench)
    benchHk.count(); val blobP = blob.cache(); blobP.count()
    try {
      val q = Streams.ingestStream(
          spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING").parquet(s"$in/*"),
          benchHk, blobP)
        .writeStream.format("memory").queryName("ingest_out")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val out = spark.table("ingest_out")
      val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 6L), s"ingest kept $kept, want {1, 6}")
      // the emitted rows carry the downstream banding signature
      assert(out.columns.contains("simhash"), "ingest output must carry the simhash column")
    } finally blobP.unpersist()
  }

  test("partitioned write prunes partitions on read") {
    val out = Files.createTempDirectory("graft-partw").toString + "/events_parted"
    val ev = Tables.events(spark, TestSpark.sfDir)
    sources.Sources.write(ev, "parquet", out, partitionBy = Seq("event_type"), repartition = Some(2))
    val back = spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
    // partition pruning: only the purchase directory is listed
    val scanned = back.queryExecution.executedPlan.toString
    assert(back.count() == ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count())
    assert(!scanned.contains("event_type=click"), "non-matching partitions must be pruned")
  }
}
