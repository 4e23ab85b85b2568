package graft

import graft.plans.{TopKPerGroupExec, TopKPerGroupStrategy}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The top-k-per-group planner strategy must fire on the q7 idiom and
  * produce rows identical to the default window plan. */
class TopKStrategySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withStrategy[T](body: => T): T = {
    spark.experimental.extraStrategies = Seq(TopKPerGroupStrategy)
    try body finally spark.experimental.extraStrategies = Nil
  }

  test("strategy plans q7 as TopKPerGroupExec with identical results") {
    val default = operators.Relational.q7.build(spark, TestSpark.sfDir).collect().toSeq
    val (planned, rows) = withStrategy {
      val df = operators.Relational.q7.build(spark, TestSpark.sfDir)
      (df.queryExecution.executedPlan.toString, df.collect().toSeq)
    }
    assert(planned.contains("TopKPerGroup"), planned.take(1500))
    assert(!planned.contains("WindowGroupLimit"), "built-in group limit should be bypassed")
    assert(rows == default)
  }

  test("strategy does NOT fire on rank() or multi-predicate filters") {
    withStrategy {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_extendedprice").desc)
      val ranked = Tables.lineitem(spark, TestSpark.sfDir)
        .withColumn("r", rank().over(w)).filter(col("r") <= 3)
      assert(!ranked.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      // a conjunctive filter is split by predicate pushdown: the
      // non-window conjunct sinks below the Window, so the strategy
      // legitimately fires on the remaining rn<=k — results must match
      def multi = Tables.lineitem(spark, TestSpark.sfDir)
        .withColumn("r", row_number().over(w.orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))))
        .filter(col("r") <= 3 && col("l_suppkey") > 2)
        .orderBy(col("l_suppkey"), col("r"))
      assert(multi.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      val withStrat = multi.collect().toSeq
      spark.experimental.extraStrategies = Nil
      assert(multi.collect().toSeq == withStrat)
      spark.experimental.extraStrategies = Seq(TopKPerGroupStrategy)
    }
  }

  test("strategy handles rn < k, empty groups domain, and k=1") {
    withStrategy {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = Tables.orders(spark, TestSpark.sfDir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") < 2) // k = 1
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      val top1 = df.collect()
      // exactly one row per customer, and it is that customer's max
      val byHand = Tables.orders(spark, TestSpark.sfDir)
        .groupBy("o_custkey").agg(max(struct(col("o_totalprice"), col("o_orderkey") * -1)).as("m"))
        .count()
      assert(top1.length == byHand)
      assert(top1.forall(_.getInt(top1.head.fieldIndex("rn")) == 1))
    }
  }
}
