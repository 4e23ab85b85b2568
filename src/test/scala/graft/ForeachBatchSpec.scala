package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** foreachBatch sink: idempotent partition-overwrite upsert — the
  * exactly-once-by-idempotence pattern for parquet/lake sinks (each
  * microbatch deterministically overwrites the partitions it touches,
  * so replays converge instead of duplicating). */
class ForeachBatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("idempotent upsert sink: batch replay does not duplicate") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-fb-in").toString
    val out = Files.createTempDirectory("graft-fb-out").toString + "/agg"
    Seq(
      Streams.Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
      Streams.Event(2, ts("2024-01-01 00:01:00"), 1, "view", 2.0)
    ).toDF().write.parquet(s"$in/b0")

    def upsert(batch: DataFrame, batchId: Long): Unit =
      batch.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("event_type")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(out)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Streams.Event]].schema)
        .parquet(s"$in/*")
        .writeStream.foreachBatch(upsert _)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    val first = spark.read.parquet(out).collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
    runOnce() // full replay (fresh checkpoint): same partitions overwritten
    val second = spark.read.parquet(out).collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
    assert(first == Set(("click", 1L), ("view", 1L)))
    assert(second == first, "replay must converge, not duplicate")
  }
}
