package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming specs: file source → watermark → windowed agg,
  * and stateful sessionization, driven in event-time order with
  * one-file-per-microbatch so the watermark advances between batches.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def writeBatches(dir: String, batches: Seq[Seq[Streams.Event]]): Unit = {
    import spark.implicits._
    batches.zipWithIndex.foreach { case (b, i) =>
      b.toDF().coalesce(1).write.parquet(f"$dir/b$i%03d")
    }
  }

  test("windowed aggregation with watermark emits closed windows") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-stream-in").toString
    val batch1 = Seq(
      Streams.Event(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
      Streams.Event(2, ts("2024-01-01 00:45:00"), 1, "click", 2.0),
      Streams.Event(3, ts("2024-01-01 01:10:00"), 2, "view", 3.0))
    // batch 2 advances the max event time; batch 3 starts with watermark
    // 06:30-2h=04:30 > both early windows → they emit during batch 3
    val batch2 = Seq(Streams.Event(4, ts("2024-01-01 06:30:00"), 1, "click", 4.0))
    val batch3 = Seq(Streams.Event(5, ts("2024-01-01 12:00:00"), 3, "view", 1.0))
    writeBatches(in, Seq(batch1, batch2, batch3))

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*")
    val q = Streams.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val rows = spark.table("win_out")
      .select(col("hour_start").cast("string"), col("event_type"), col("n"), col("total_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows.contains(("2024-01-01 00:00:00", "click", 2L, 3.0)), rows.toString)
    assert(rows.contains(("2024-01-01 01:00:00", "view", 1L, 3.0)), rows.toString)
  }

  test("quantile stream: closed windows emit t-digest percentiles matching the exact batch values (r9)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-qtile-in").toString
    // window 00:00: values 1..100 split ACROSS two microbatches (the
    // digest must merge partial window state); a later event closes it
    val b1 = (1 to 60).map(i =>
      Streams.Event(i.toLong, ts("2024-01-01 00:05:00"), 1L, "lat", i.toDouble))
    val b2 = (61 to 100).map(i =>
      Streams.Event(i.toLong, ts("2024-01-01 00:40:00"), 1L, "lat", i.toDouble))
    val b3 = Seq(Streams.Event(999L, ts("2024-01-01 06:00:00"), 1L, "lat", 1.0))
    writeBatches(in, Seq(b1, b2, b3))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*")
    val q = Streams.quantileStream(stream)
      .writeStream.format("memory").queryName("qtile_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val r = spark.table("qtile_out")
      .filter(col("hour_start").cast("string") === "2024-01-01 00:00:00")
      .collect()
    assert(r.length == 1, s"exactly the closed 00:00 window: ${r.toSeq}")
    assert(r.head.getLong(2) == 100L)
    // 100 points at delta=100: every point its own near-centroid — the
    // read-offs sit within one unit of the exact percentiles
    assert(math.abs(r.head.getDouble(3) - 50.5) <= 1.0, s"p50 = ${r.head.getDouble(3)}")
    assert(math.abs(r.head.getDouble(4) - 95.05) <= 1.5, s"p95 = ${r.head.getDouble(4)}")
    assert(math.abs(r.head.getDouble(5) - 99.01) <= 1.5, s"p99 = ${r.head.getDouble(5)}")
  }

  test("mapGroupsWithState accumulates running per-user totals across batches") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-totals-in").toString
    writeBatches(in, Seq(
      Seq(Streams.Event(1, ts("2024-01-01 00:00:00"), 5, "click", 1.0),
        Streams.Event(2, ts("2024-01-01 00:01:00"), 5, "click", 2.0)),
      Seq(Streams.Event(3, ts("2024-01-01 00:02:00"), 5, "click", 4.0))))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event]
    val q = Streams.runningUserTotals(stream)
      .writeStream.format("memory").queryName("totals_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // update mode: last emitted row per user carries the final totals
    val rows = spark.table("totals_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains((5L, 3L, 7.0)), rows.toString)
  }

  test("streaming ewma equals the driver recursion across batches, near the q53 closed form") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-ewma-in").toString
    val vals = Seq(10.0, 2.0, 8.0, 4.0, 6.0)
    val evs = vals.zipWithIndex.map { case (v, i) =>
      Streams.Event(i + 1L, ts(f"2024-01-01 00:0$i:00"), 9L, "click", v) }
    writeBatches(in, Seq(evs.take(2), evs.drop(2)))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event]
    val q = Streams.ewmaStream(stream)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val last = spark.table("ewma_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_._1 == 9L).maxBy(_._2)
    // literal recursion: first event seeds, then x/2 + prev/2
    val expct = vals.tail.foldLeft(vals.head)((p, x) => x / 2.0 + p / 2.0)
    assert(last._2 == vals.size.toLong)
    assert(math.abs(last._3 - expct) < 1e-12, s"got ${last._3} expected $expct")
    // and the batch q53 closed form over the same history agrees to the
    // truncation bound (here n < 16, so EXACT up to the renormalization
    // of the missing tail weights)
    val num = vals.reverse.zipWithIndex.map { case (v, i) => v * math.pow(2.0, 15 - i) }.sum
    val den = vals.indices.map(i => math.pow(2.0, 15 - i)).sum
    assert(math.abs(last._3 - num / den) < 0.5, "closed form in the same ballpark (tail renormalization)")
  }

  test("streaming funnel stages equal the batch fold, including cross-batch completion") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-funnel-in").toString
    // user 5: completes across TWO batches (view in b1; click+purchase
    // in b2). user 6: click BEFORE its view must not count (in-batch
    // order adversarial — the group iterator sorts). user 7: view only.
    writeBatches(in, Seq(
      Seq(Streams.Event(1, ts("2024-01-01 00:00:00"), 5, "view", 0.0),
        Streams.Event(2, ts("2024-01-01 00:02:00"), 6, "view", 0.0),
        Streams.Event(3, ts("2024-01-01 00:01:00"), 6, "click", 0.0),
        Streams.Event(4, ts("2024-01-01 00:03:00"), 7, "view", 0.0)),
      Seq(Streams.Event(5, ts("2024-01-01 00:10:00"), 5, "click", 0.0),
        Streams.Event(6, ts("2024-01-01 00:20:00"), 5, "purchase", 0.0),
        Streams.Event(7, ts("2024-01-01 00:21:00"), 6, "signup", 0.0))))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event]
    val q = Streams.funnelStream(stream, Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // update mode: the LAST emitted row per user is the final stage
    val finalStage = spark.table("funnel_out")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .zipWithIndex.groupBy(_._1._1).map { case (u, rows) => u -> rows.maxBy(_._2)._1._2 }
    assert(finalStage == Map(5L -> 3, 6L -> 1, 7L -> 1), finalStage.toString)
    // and the batch fold agrees on the union of both batches
    val batchEvents = spark.read.parquet(in + "/*")
    val batch = operators.Extra.funnelCounts(batchEvents, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(batch == Map(1L -> 3L, 2L -> 1L, 3L -> 1L),
      s"batch per-step counts $batch") // 3 users reached step 1, one went all the way
  }

  test("stateful sessionization closes sessions on gap timeout") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-sess-in").toString
    val batch1 = Seq(
      Streams.Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
      Streams.Event(2, ts("2024-01-01 00:10:00"), 7, "click", 2.0),   // same session
      Streams.Event(3, ts("2024-01-01 02:00:00"), 7, "click", 5.0))   // new session (gap > 30m)
    // batch 2 advances max event time to 09:00; batch 3 runs with
    // watermark 07:00 → both user-7 session timeouts fire and emit
    val batch2 = Seq(Streams.Event(4, ts("2024-01-01 09:00:00"), 8, "view", 1.0))
    val batch3 = Seq(Streams.Event(5, ts("2024-01-01 20:00:00"), 9, "view", 1.0))
    writeBatches(in, Seq(batch1, batch2, batch3))

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*")
      .as[Streams.Event]
    val q = Streams.sessionize(stream)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val rows = spark.table("sess_out")
      .select(col("user_id"), col("session_start").cast("string"), col("n_events"), col("total_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // the first session of user 7 (2 events) must have closed
    assert(rows.contains((7L, "2024-01-01 00:00:00", 2L, 3.0)), rows.toString)
    // the 02:00 session closes once the batch-2 watermark passes its gap
    assert(rows.contains((7L, "2024-01-01 02:00:00", 1L, 5.0)), rows.toString)
  }

  test("sessionize survives a late event arriving after the watermark passed the session's gap (r10)") {
    import spark.implicits._
    // regression (r9 advice): a late event accepted by the 2h-delay
    // watermark filter, extending a session whose last + gap is already
    // at/behind the eviction watermark, used to make setTimeoutTimestamp
    // throw ('timeout timestamp cannot be earlier than watermark') and
    // fail the whole query. The fix clamps the timeout to watermark + 1.
    val in = Files.createTempDirectory("graft-sess-late-in").toString
    writeBatches(in, Seq(
      // b1: user 7 opens a session at 04:00 (timeout 04:30)
      Seq(Streams.Event(1, ts("2024-01-01 04:00:00"), 7, "click", 1.0)),
      // b2: jumps event time to 09:00 → eviction watermark for b3 = 07:00,
      // far past user 7's last+gap = 04:30
      Seq(Streams.Event(2, ts("2024-01-01 09:00:00"), 8, "view", 1.0)),
      // b3: a LATE user-7 event at 04:15 — within the gap of the open
      // session; late-event filtering uses the PREVIOUS batch's watermark
      // (02:00), so the row reaches the state function while the eviction
      // watermark is already 07:00
      Seq(Streams.Event(3, ts("2024-01-01 04:15:00"), 7, "click", 2.0)),
      // b4: advances event time so every open session times out and emits
      Seq(Streams.Event(4, ts("2024-01-01 20:00:00"), 9, "view", 1.0))))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event]
    val q = Streams.sessionize(stream)
      .writeStream.format("memory").queryName("sess_late_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) // the old code dies here with a StreamingQueryException
    val rows = spark.table("sess_late_out")
      .select(col("user_id"), col("session_start").cast("string"), col("n_events"), col("total_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // user 7's session closes exactly once, WITH the late event folded
    // in (n=2, total=3.0) — Spark's late filter admitted it because the
    // previous-batch watermark (02:00) governs filtering while eviction
    // uses the current one (07:00); the old code threw right here
    assert(rows.contains((7L, "2024-01-01 04:00:00", 2L, 3.0)), rows.toString)
    assert(rows.count(_._1 == 7L) == 1, rows.toString)
  }

  test("runningUserTotals: a late microbatch of old events never regresses last_seen (r10)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-totals-late-in").toString
    writeBatches(in, Seq(
      Seq(Streams.Event(1, ts("2024-01-01 00:10:00"), 5, "click", 1.0)),
      // late batch: older event for the same user
      Seq(Streams.Event(2, ts("2024-01-01 00:01:00"), 5, "click", 2.0))))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event]
    val q = Streams.runningUserTotals(stream)
      .writeStream.format("memory").queryName("totals_late_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val last = spark.table("totals_late_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getTimestamp(3)))
      .filter(_._1 == 5L).maxBy(_._2)
    assert(last._2 == 2L && last._3 == 3.0, last.toString)
    // regression: last_seen used to take the CURRENT batch's max only
    assert(last._4 == ts("2024-01-01 00:10:00"), s"last_seen regressed: ${last._4}")
  }

  test("streaming scd2 emissions match the batch merge, version chains across batches") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-scd2-in").toString
    // batch 1: update key 1 (base 10.0 -> 11.0), insert key 9;
    // batch 2: update key 1 again (11.0 -> 12.0) — closes version 1
    Seq(
      Seq(Streams.CdcChange(1L, 1L, 11.0), Streams.CdcChange(9L, 2L, 99.0)),
      Seq(Streams.CdcChange(1L, 3L, 12.0))
    ).zipWithIndex.foreach { case (b, i) =>
      b.toDF().coalesce(1).write.parquet(f"$in/b$i%03d")
    }
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("key", "value")
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.CdcChange]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.CdcChange]
    val q = Streams.scd2Stream(stream, Streams.scd2BaseState(base, "key", "value"))
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("scd2_out")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    // upsert on (key, valid_from): the closure row supersedes the
    // optimistic current row — the CDC-sink discipline
    val hist = rows.zipWithIndex.groupBy { case (r, _) => (r._1, r._3) }
      .map { case (_, vs) => vs.maxBy(_._2)._1 }.toSet
    assert(hist == Set(
      (1L, 10.0, 0L, Some(1L), false),  // base version closed by batch 1
      (1L, 11.0, 1L, Some(2L), false),  // batch-1 version closed by batch 2
      (1L, 12.0, 2L, None, true),       // current after batch 2
      (9L, 99.0, 1L, None, true)        // insert opens at version 1
    ), hist.toString)
    // key 2 never changed: no emission (its current row lives in the
    // base table, exactly as the batch merge leaves unchanged rows)
    assert(!rows.exists(_._1 == 2L))
    // and the single-change-per-key prefix (batch 1) matches the batch
    // scd2Apply history for the same inputs, minus unchanged keys
    val changes1 = Seq((1L, 11.0), (9L, 99.0)).toDF("key", "new_bal")
    val batchHist = operators.Extra.scd2Apply(base, changes1, "key", "value", "new_bal")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .filter(_._1 != 2L).toSet
    // ...treating key 1's version-1 row as still open (batch 2 later
    // closed it in the stream): the batch and stream histories agree
    val histAsOfBatch1 = hist.map(r =>
      if (r._1 == 1L && r._3 == 1L && r._4.contains(2L)) (r._1, r._2, r._3, None: Option[Long], true)
      else r)
    assert(batchHist.subsetOf(histAsOfBatch1), s"batch=$batchHist hist=$hist")
  }

  test("streaming transitions equal the batch q56 pairs, including the cross-batch pair") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-trans-in").toString
    // user 1: a -> b in batch 1, then -> a in batch 2 (the b->a pair
    // STRADDLES the boundary — state must carry the tail); user 2's
    // batch-2 events arrive out of order within the batch (the group
    // iterator sorts on (ts, event_id))
    writeBatches(in, Seq(
      Seq(Streams.Event(1, ts("2024-01-01 00:00:00"), 1, "a", 0.0),
        Streams.Event(2, ts("2024-01-01 00:01:00"), 1, "b", 0.0)),
      Seq(Streams.Event(3, ts("2024-01-01 00:02:00"), 1, "a", 0.0),
        Streams.Event(5, ts("2024-01-01 00:04:00"), 2, "b", 0.0),
        Streams.Event(4, ts("2024-01-01 00:03:00"), 2, "a", 0.0))))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event]
    val q = Streams.transitionStream(stream)
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("trans_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    // batch twin on the union of both batches: the q56 lead() pairs
    assert(got == Map(
      (1L, "a", "b") -> 1, (1L, "b", "a") -> 1, (2L, "a", "b") -> 1), s"got $got")
  }

  test("streaming drift cells equal the batch bin assignment; a shift lands in the clamp bin") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-drift-in").toString
    // reference range for type "m": [0, 10]; batch 2 is shifted to ~55
    val ref = Seq(("m", 0.0), ("m", 10.0)).toDF("event_type", "value")
    val rng = operators.Analytics.psiReferenceRange(ref)
    writeBatches(in, Seq(
      (0 until 10).map(i => Streams.Event(i.toLong, ts(f"2024-01-01 00:0$i:00"), 1, "m", i.toDouble)),
      (0 until 5).map(i => Streams.Event(100 + i.toLong, ts(f"2024-01-01 02:0$i:00"), 1, "m", 55.0))))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event].toDF()
    val q = Streams.binnedDriftStream(stream, rng)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("drift_out").collect()
      .map(r => ((r.getAs[java.sql.Timestamp](0).getTime / 3600000L, r.getInt(2)), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // window 0: values 0..9 over range [0,10] -> floor(v) bins, value
    // 9 -> bin 9; window 2: all 55s clamp into bin 9
    val w0 = got.filter(_._1._1 % 24 == 0)
    assert(w0.values.sum == 10L, s"first window counts: $got")
    assert(got((2L + got.keys.map(_._1).min - got.keys.map(_._1).min % 24), 9) == 5L ||
      got.exists { case ((w, b), c) => b == 9 && c == 5L },
      s"shifted window must clamp into bin 9: $got")
    // parity: the streaming bin expression IS the batch one — recompute
    // batch-side on the same rows
    val batch = Seq(("m", 3.0), ("m", 9.99), ("m", 55.0), ("m", -2.0))
      .toDF("event_type", "value").join(rng, Seq("event_type"))
      .select(expr(operators.Analytics.PsiBinExpr).as("bin"))
      .collect().map(_.getInt(0)).toSeq
    assert(batch == Seq(3, 9, 9, 0), s"batch bins: $batch")
  }

  test("first-touch stream emits exactly one row per user with its earliest ts") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-reach-in").toString
    // user 1 appears in both batches (second must be swallowed);
    // user 2's batch arrives out of order (min picked by the sorter)
    writeBatches(in, Seq(
      Seq(Streams.Event(1, ts("2024-01-01 00:05:00"), 1, "a", 0.0),
        Streams.Event(2, ts("2024-01-01 00:01:00"), 1, "a", 0.0)),
      Seq(Streams.Event(3, ts("2024-01-02 00:00:00"), 1, "a", 0.0),
        Streams.Event(5, ts("2024-01-02 00:09:00"), 2, "a", 0.0),
        Streams.Event(4, ts("2024-01-02 00:02:00"), 2, "a", 0.0))))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event]
    val q = Streams.firstTouchStream(stream)
      .writeStream.format("memory").queryName("reach_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("reach_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    assert(got == Map(
      1L -> ts("2024-01-01 00:01:00"), 2L -> ts("2024-01-02 00:02:00")), s"got $got")
  }

  test("heavy-hitter stream: bounded Misra-Gries state keeps the planted hitter with MG error bound") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-hh-in").toString
    // one shard (all users ≡ 0 mod 16): 60 'hot' + 30 'warm' spread
    // over many cold types, capacity k = 4 << 12 distinct types —
    // state CANNOT hold exact counts, the MG guarantee must carry it
    val hot = (1 to 60).map(i => Streams.Event(i.toLong, ts("2024-01-01 00:00:01"), 16L, "hot", 0.0))
    val warm = (1 to 30).map(i => Streams.Event(100L + i, ts("2024-01-01 00:00:02"), 32L, "warm", 0.0))
    val cold = (1 to 30).map(i => Streams.Event(200L + i, ts("2024-01-01 00:00:03"), 48L, s"cold_${i % 10}", 0.0))
    val all = new scala.util.Random(7).shuffle(hot ++ warm ++ cold)
    writeBatches(in, Seq(all.take(60), all.drop(60)))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event]
    val q = Streams.heavyHittersStream(stream, k = 4, shards = 16)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // last batch's summary for shard 0
    val rows = spark.table("hh_out").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall(_._1 == 0), "single planted shard")
    // final state: group by item, keep the LAST emitted count (update
    // mode re-emits per batch; max is the final since counts only grow
    // for survivors within this fixture's two batches)
    val fin = rows.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    assert(fin.size <= 4, s"state must stay within capacity: $fin")
    val n = 120L
    val bound = n / (4L + 1L) // MG: undercount ≤ N/(k+1)
    assert(fin.contains("hot"), s"true majority item must survive: $fin")
    assert(fin("hot") >= 60L - bound && fin("hot") <= 60L, s"MG bound violated: $fin")
  }

  test("cusum stream: planted level shift raises the alarm, flat traffic never does (r8)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-cusum-in").toString
    def batch(tag: Int, n: Int) = (1 to n).map(i =>
      Streams.Event(tag * 1000L + i, ts("2024-01-01 00:00:01"), 1L, "a", 0.0))
    // batches: 10 (sets mu0), 10, 10 (flat), then 30 (shift)
    writeBatches(in, Seq(batch(0, 10), batch(1, 10), batch(2, 10), batch(3, 30)))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event]
    val q = Streams.cusumStream(stream)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("cusum_out").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == 4, s"one row per micro-batch: ${rows.toSeq}")
    // mu0 = 10, slack 2: flat batches keep g = 0, never alarm;
    // the 30-batch accumulates g = 18 > 10 and fires immediately
    val flat = rows.filter(_._1 == 10L)
    assert(flat.forall(r => r._2 == 0L && !r._3), s"flat must stay silent: ${rows.toSeq}")
    val shifted = rows.find(_._1 == 30L).get
    assert(shifted._2 == 18L && shifted._3, s"shift must alarm: $shifted")
  }

  test("cusum stream: gradual shift accumulates ACROSS microbatch boundaries; dips clamp at zero (r9)") {
    import spark.implicits._
    // the r8 fixture alarms within ONE shifted batch; this pins the
    // cross-batch arm: a shift starting exactly at a microbatch edge
    // whose per-batch excess is small must carry g across boundaries
    // and fire only once the accumulated excess crosses mu0 — and a
    // below-reference batch must clamp at g = 0, never negative
    val in = Files.createTempDirectory("graft-cusum2-in").toString
    def batch(tag: Int, n: Int) = (1 to n).map(i =>
      Streams.Event(tag * 1000L + i, ts("2024-01-01 00:00:01"), 1L, "a", 0.0))
    // mu0 = 10 (slack mu0/4 = 2); dip to 8 (clamp), then six batches
    // of 14: g = 2, 4, 6, 8, 10, 12 — alarm STRICTLY after g > 10
    val counts = Seq(10, 8, 14, 14, 14, 14, 14, 14)
    writeBatches(in, counts.zipWithIndex.map { case (n, i) => batch(i, n) })
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event]
    val q = Streams.cusumStream(stream)
      .writeStream.format("memory").queryName("cusum2_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("cusum2_out").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == counts.length, s"one row per micro-batch: ${rows.toSeq}")
    val dip = rows.find(_._1 == 8L).get
    assert(dip._2 == 0L && !dip._3, s"dip must clamp at zero: $dip")
    val gs = rows.filter(_._1 == 14L).map(_._2).sorted
    assert(gs.toSeq == Seq(2L, 4L, 6L, 8L, 10L, 12L),
      s"excess must accumulate across batch boundaries: ${gs.toSeq}")
    val alarms = rows.filter(_._1 == 14L).map(r => (r._2, r._3)).toMap
    assert(!alarms(10L), "g == mu0 must NOT alarm (strict threshold)")
    assert(alarms(12L), "g > mu0 must alarm")
    assert(Seq(2L, 4L, 6L, 8L).forall(g => !alarms(g)),
      s"no premature alarm while excess accumulates: $alarms")
  }

  test("survival span stream: spans match the batch KM inputs across batch boundaries (r9)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-surv-in").toString
    // the Round8Spec KM corpus split across TWO microbatches: u1 week0
    // only; u2 weeks 0..1 (SPLIT across the boundary); u3 weeks 0..2
    // with IN-BATCH disorder (late week first)
    val b1 = Seq(
      Streams.Event(1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      Streams.Event(2L, ts("2024-01-01 10:00:00"), 2L, "a", 0.0),
      Streams.Event(3L, ts("2024-01-15 10:00:00"), 3L, "a", 0.0))
    val b2 = Seq(
      Streams.Event(4L, ts("2024-01-08 10:00:00"), 2L, "a", 0.0),
      Streams.Event(5L, ts("2024-01-01 10:00:00"), 3L, "a", 0.0))
    writeBatches(in, Seq(b1, b2))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*").as[Streams.Event]
    val q = Streams.survivalSpanStream(stream)
      .writeStream.format("memory").queryName("surv_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("surv_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // LATEST span per user = the widest (spans only grow)
    val fin = rows.groupBy(_._1).view.mapValues(rs =>
      rs.maxBy(r => r._3 - r._2)).toMap
    // 2024-01-01 is a Monday = epoch day 19723
    val w0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    assert(fin(1L) == ((1L, w0, w0, 0L)), s"u1: ${fin(1L)}")
    assert(fin(2L) == ((2L, w0, w0 + 7, 1L)), s"u2 span must straddle the batch edge: ${fin(2L)}")
    assert(fin(3L) == ((3L, w0, w0 + 14, 2L)), s"u3 in-batch disorder: ${fin(3L)}")
    // the folded KM readout off the final spans equals the batch gate
    // on the same events: mw = max last week; censored iff lw = mw
    val mw = fin.values.map(_._3).max
    val lt = fin.values.toSeq.map(r => (r._4, if (r._3 == mw) 1 else 0))
    val h = lt.groupBy(_._1).view.mapValues(xs => (xs.size.toLong,
      xs.count(_._2 == 0).toLong)).toMap
    val batch = operators.Insights2.survivalRetention(
      (b1 ++ b2).map(e => (e.user_id, e.ts)).toDF("user_id", "ts")).collect()
    batch.foreach { r =>
      val d = h(r.getLong(0))._2
      assert(r.getLong(2) == d, s"life ${r.getLong(0)}: churn $d vs batch ${r.getLong(2)}")
      val n = h.collect { case (life, (tot, _)) if life >= r.getLong(0) => tot }.sum
      assert(r.getLong(1) == n, s"life ${r.getLong(0)}: at-risk $n vs batch ${r.getLong(1)}")
    }
  }

  test("dq stream: planted violations split across microbatches hit exact window counts (r9)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-dq-in").toString
    // window 00:00, violations SPLIT across two batches (the windowed
    // counters must merge): one NULL value + one bad type in b1, one
    // NULL user + one negative value in b2; a 06:00 event closes it
    val b1 = Seq(
      (1L, ts("2024-01-01 00:05:00"), Some(1L), "click", Some(1.0)),
      (2L, ts("2024-01-01 00:10:00"), Some(1L), "click", None: Option[Double]),
      (3L, ts("2024-01-01 00:15:00"), Some(2L), "bogus", Some(2.0)))
    val b2 = Seq(
      (4L, ts("2024-01-01 00:20:00"), None: Option[Long], "view", Some(3.0)),
      (5L, ts("2024-01-01 00:25:00"), Some(3L), "view", Some(-4.0)))
    val b3 = Seq((9L, ts("2024-01-01 06:00:00"), Some(9L), "view", Some(1.0)))
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      b.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(f"$in/b$i%03d")
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b000").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*")
    val q = Streams.dqStream(stream)
      .writeStream.format("memory").queryName("dq_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val r = spark.table("dq_out")
      .filter(col("window_start").cast("string") === "2024-01-01 00:00:00")
      .collect()
      .map(x => (x.getString(1), x.getString(2)) ->
        (x.getLong(3), x.getLong(4), x.getBoolean(5))).toMap
    assert(r.size == 4, s"four check rows: $r")
    assert(r(("completeness", "value")) == ((1L, 5L, false)))
    assert(r(("completeness", "user_id")) == ((1L, 5L, false)))
    assert(r(("domain", "event_type")) == ((1L, 5L, false)))
    assert(r(("range", "value")) == ((1L, 5L, false)))
  }

  test("metric stream: confusion counts split across microbatches merge exactly; a window with no predicted positives reports NULL precision, not 0 (r11)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-metric-in").toString
    // window 00:00 at threshold 0: tp/fp in b1, fn/tn in b2 (the
    // windowed counters must merge); window 01:00 has only negative
    // margins → tp + fp = 0 → precision NULL while recall is 0
    val b1 = Seq(
      (ts("2024-01-01 00:05:00"), 1.5, 1.0),   // tp
      (ts("2024-01-01 00:10:00"), 0.5, 0.0),   // fp
      (ts("2024-01-01 00:15:00"), 2.0, 1.0))   // tp
    val b2 = Seq(
      (ts("2024-01-01 00:20:00"), -1.0, 1.0),  // fn
      (ts("2024-01-01 00:25:00"), -0.5, 0.0),  // tn
      (ts("2024-01-01 01:10:00"), -2.0, 1.0),  // 01:00 window: fn
      (ts("2024-01-01 01:20:00"), -3.0, 0.0))  // 01:00 window: tn
    val b3 = Seq((ts("2024-01-01 06:00:00"), 0.1, 1.0))
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      b.toDF("ts", "z", "y").coalesce(1).write.parquet(f"$in/b$i%03d")
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b000").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*")
    val q = Streams.metricStream(stream)
      .writeStream.format("memory").queryName("metric_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val r = spark.table("metric_out").collect()
      .map(x => x.getTimestamp(0).toString.take(19) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)),
          (Option(x.get(6)), Option(x.get(7)), x.getDouble(8)))).toMap
    val (c0, m0) = r("2024-01-01 00:00:00")
    assert(c0 == ((5L, 2L, 1L, 1L, 1L)), c0.toString)
    // precision 2/3 → 0.666667 half-up, recall 2/3, accuracy 3/5
    assert(m0 == ((Some(0.666667), Some(0.666667), 0.6)), m0.toString)
    val (c1, m1) = r("2024-01-01 01:00:00")
    assert(c1 == ((2L, 0L, 0L, 1L, 1L)), c1.toString)
    assert(m1 == ((None, Some(0.0), 0.5)), m1.toString)
  }

  test("schema drift stream: a column added mid-window across microbatches, a partially-absent registered key, and a fully-missing key each get their check row (r11)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-drift-in").toString
    val ref = Seq("a", "b", "d")
    // window 00:00 split across two microbatches: b appears everywhere
    // in batch 1, batch 2 ADDS key c and drops b from one row; d is
    // registered but never arrives; a 06:00 row closes the window
    val b1 = Seq(
      (1L, ts("2024-01-01 00:05:00"), """{"a": 1, "b": 2}"""),
      (2L, ts("2024-01-01 00:10:00"), """{"a": 1, "b": 2}"""))
    val b2 = Seq(
      (3L, ts("2024-01-01 00:20:00"), """{"a": 1, "b": 2, "c": 3}"""),
      (4L, ts("2024-01-01 00:25:00"), """{"a": 4}"""))
    val b3 = Seq((9L, ts("2024-01-01 06:00:00"), """{"a": 1, "b": 1}"""))
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      b.toDF("doc_id", "ts", "payload")
        .coalesce(1).write.parquet(f"$in/b$i%03d")
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b000").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in + "/*")
    val q = Streams.schemaDriftStream(stream, ref)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val r = spark.table("drift_out")
      .filter(col("window_start").cast("string") === "2024-01-01 00:00:00")
      .collect()
      .map(x => x.getString(1) ->
        ((x.getString(2), x.getLong(3), x.getLong(4), x.getBoolean(5)))).toMap
    assert(r.size == 4, s"one check row per column: $r")
    assert(r("a") == (("known", 4L, 4L, true)), r("a").toString)
    assert(r("b") == (("known", 4L, 3L, false)), "partial absence fails ok: " + r("b"))
    assert(r("c") == (("added", 1L, 1L, false)), r("c").toString)
    assert(r("d") == (("missing", 4L, 0L, false)), r("d").toString)
    // batch parity: the SAME plane expressions over the closed window's
    // rows as a batch frame reproduce the streamed rows exactly
    val batch = Streams.schemaDriftStream(
      (b1 ++ b2).toDF("doc_id", "ts", "payload"), ref)
      .collect()
      .map(x => x.getString(1) ->
        ((x.getString(2), x.getLong(3), x.getLong(4), x.getBoolean(5)))).toMap
    assert(batch == r, s"batch $batch vs streamed $r")
  }

  test("psi stream: bins merge across microbatches, matching reference gives psi = 0 'stable', uniform reference flags 'shifted' (r11)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-psi-in").toString
    // window 00:00 split across two microbatches: bins 0 (z=-3), 5
    // (z=0), 9 (z=3) end at counts 3/2/5 of 10; a 06:00 row closes it
    val b1 = Seq.fill(3)((-3.0, ts("2024-01-01 00:05:00"))) ++
      Seq.fill(2)((0.0, ts("2024-01-01 00:10:00")))
    val b2 = Seq.fill(5)((3.0, ts("2024-01-01 00:40:00")))
    val b3 = Seq((0.0, ts("2024-01-01 06:00:00")))
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      b.toDF("z", "ts").coalesce(1).write.parquet(f"$in/b$i%03d")
    }
    def run(name: String, ref: Seq[Double]) = {
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$in/b000").schema)
        .option("maxFilesPerTrigger", "1").parquet(in + "/*")
      val q = Streams.psiStream(stream, ref)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.table(name)
        .filter(col("window_start").cast("string") === "2024-01-01 00:00:00")
        .collect().map(x => (x.getLong(1),
          (0 until 10).map(i => x.getLong(2 + i)),
          x.getDouble(12), x.getString(13))).head
    }
    // reference = the observed shares (empty bins pinned at the 1e-6
    // clamp so their terms vanish) → psi exactly 0
    val refMatch = Seq(0.3, 1e-6, 1e-6, 1e-6, 1e-6, 0.2, 1e-6, 1e-6, 1e-6, 0.5)
    val (tot, bins, psi0, st0) = run("psi_match", refMatch)
    assert(tot == 10L && bins(0) == 3L && bins(5) == 2L && bins(9) == 5L, s"$tot $bins")
    assert(psi0 == 0.0 && st0 == "stable", s"$psi0 $st0")
    // uniform reference: replicate the plane's exact IEEE fold in Scala
    val (_, _, psi1, st1) = run("psi_uni", Seq.fill(10)(0.1))
    val obs = Seq(3L, 0L, 0L, 0L, 0L, 2L, 0L, 0L, 0L, 5L)
    val exp = obs.map { n =>
      val a = math.max(n.toDouble / 10.0, 1e-6)
      (a - 0.1) * math.log(a / 0.1)
    }.sum
    assert(psi1 == exp && st1 == "shifted", s"$psi1 vs $exp $st1")
  }
}
