package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: co-partitioned tables joined without any Exchange —
  * the pre-shuffle layout strategy for repeated 100 TB fact joins
  * (SURVEY.md §4 "co-locate joins via bucketing"). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join with zero exchanges") {
    val d = TestSpark.sfDir
    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    // in-memory catalog forgets tables between JVMs but their managed
    // locations survive — clear them or saveAsTable refuses
    Seq("graft_li_bucketed", "graft_ord_bucketed").foreach { t =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(s"spark-warehouse/$t"))
    }
    Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_li_bucketed")
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_li_bucketed")
        .join(spark.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(800))
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" + plan.take(1500))
      assert(joined.count() ==
        Tables.lineitem(spark, d).select(countDistinct(col("l_orderkey"))).collect()(0).getLong(0))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
