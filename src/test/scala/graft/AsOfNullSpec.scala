package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the as-of struct-carry semantics: every attached right column
  * comes from the SAME most-recent right row — a legitimate NULL in
  * that row must survive, never be replaced by a stale older value. */
class AsOfNullSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("null in the most recent right row is attached, not skipped") {
    import spark.implicits._
    val right = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), Option(5.0), "a"),
      (1L, Timestamp.valueOf("2024-01-01 11:00:00"), Option.empty[Double], "b")
    ).toDF("k", "rts", "v", "tag")
    val left = Seq((1L, Timestamp.valueOf("2024-01-01 12:00:00"))).toDF("k", "lts")
    val out = operators.AsOfJoin.join(left, right,
        key = "k", leftTime = "lts", rightTime = "rts", rightCols = Seq("v", "tag"))
      .select(col("asof_v"), col("asof_tag")).collect()(0)
    assert(out.isNullAt(0), "the newest row's NULL must win over the older 5.0")
    assert(out.getString(1) == "b")
  }
}
