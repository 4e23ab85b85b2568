package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.Streams
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
