package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Semantics contract of the ordered funnel fold: greedy
  * earliest-completion over ts-sorted events, strict ts ordering
  * between consecutive steps, out-of-order occurrences ignored.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  private def eventsDf(rows: Seq[(Long, Int, String)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, m, et), i) =>
      (i.toLong, ts(m), u, et, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("funnel handles out-of-order, tied, and interleaved steps") {
    val events = eventsDf(Seq(
      // user 1: clean completion
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
      // user 2: click BEFORE the first view must not count; later ones do
      (2L, 1, "click"), (2L, 2, "view"), (2L, 3, "click"), (2L, 4, "purchase"),
      // user 3: click tied with the view (strict > rejects); purchase
      // without a matched click must not reach step 3
      (3L, 1, "view"), (3L, 1, "click"), (3L, 2, "purchase"),
      // user 4: fully reversed — only step 1 reached
      (4L, 1, "purchase"), (4L, 2, "click"), (4L, 3, "view"),
      // user 5: early purchase before the click is skipped; the later
      // purchase after the matched click completes the funnel
      (5L, 1, "view"), (5L, 2, "purchase"), (5L, 3, "click"), (5L, 4, "purchase"),
      // user 6: irrelevant event types only — reaches nothing
      (6L, 1, "signup"), (6L, 2, "error")))
    val got = operators.Extra.funnelCounts(events, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "view", 5L), (2L, "click", 3L), (3L, "purchase", 3L)))
  }

  test("funnel matches the chained-min formulation on the gate data") {
    val dir = "/root/testdata/sf0.001"
    val got = operators.Extra.q40.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // chained-min reference computed with plain DataFrame ops
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val f1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val f2 = ev.filter(col("event_type") === "click").join(f1, "user_id")
      .filter(col("ts") > col("t1")).groupBy("user_id").agg(min("ts").as("t2"))
    val f3 = ev.filter(col("event_type") === "purchase").join(f2, "user_id")
      .filter(col("ts") > col("t2")).groupBy("user_id").agg(min("ts").as("t3"))
    val expected = Seq(
      (1L, "view", f1.count()), (2L, "click", f2.count()), (3L, "purchase", f3.count()))
    assert(got == expected)
  }
}
