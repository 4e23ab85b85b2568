package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join: purchases matched to the same user's
  * clicks within the preceding hour, watermarks bounding both state
  * stores — the streaming twin of the as-of/interval join family. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("purchases join clicks within the preceding hour per user") {
    import spark.implicits._
    val pDir = Files.createTempDirectory("graft-ssj-p").toString
    val cDir = Files.createTempDirectory("graft-ssj-c").toString
    Seq(
      Streams.Event(100, ts("2024-01-01 10:00:00"), 1, "purchase", 50.0),
      Streams.Event(101, ts("2024-01-01 12:00:00"), 1, "purchase", 60.0),
      Streams.Event(102, ts("2024-01-01 10:30:00"), 2, "purchase", 70.0)
    ).toDF().write.parquet(s"$pDir/b0")
    Seq(
      Streams.Event(200, ts("2024-01-01 09:30:00"), 1, "click", 0.0), // matches 100
      Streams.Event(201, ts("2024-01-01 08:00:00"), 1, "click", 0.0), // too early
      Streams.Event(202, ts("2024-01-01 10:15:00"), 2, "click", 0.0)  // matches 102
    ).toDF().write.parquet(s"$cDir/b0")

    val schema = implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema
    val purchases = spark.readStream.schema(schema).parquet(s"$pDir/*")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val clicks = spark.readStream.schema(schema).parquet(s"$cDir/*")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")

    val q = purchases.join(clicks,
        col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val pairs = spark.table("ssj_out").select("p_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 200L), (102L, 202L)), pairs.toString)
  }
}
