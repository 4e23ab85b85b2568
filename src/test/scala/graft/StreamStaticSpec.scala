package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream–static join: a stream enriched against a static dimension —
  * the most common streaming pattern (no state store needed; the
  * static side is simply joined per microbatch, broadcast when small). */
class StreamStaticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream enriched with a static dimension per microbatch") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-ss-static").toString
    Seq(
      Streams.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Streams.Event(2, ts("2024-01-01 10:01:00"), 2, "view", 2.0),
      Streams.Event(3, ts("2024-01-01 10:02:00"), 99, "click", 3.0) // no dim row
    ).toDF().write.parquet(s"$in/b0")

    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")

    val q = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
      .parquet(s"$in/*")
      .join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), coalesce(col("tier"), lit("unknown")).as("tier"))
      .writeStream.format("memory").queryName("ss_static_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val out = spark.table("ss_static_out")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "gold"), (2L, "silver"), (3L, "unknown")), out.toString)
  }
}
