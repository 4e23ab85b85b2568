package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compact rewrites many small files into few, preserving data") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val src = Tables.lineitem(spark, TestSpark.sfDir).select(col("l_orderkey"), col("l_quantity"))
    src.repartition(37).write.parquet(dir) // deliberately fragmented
    def parts = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    val before = parts
    assert(before >= 37)
    val checksum = spark.read.parquet(dir).agg(sum(col("l_orderkey")), count(lit(1))).collect()(0)

    sources.Sources.compact(spark, dir)
    assert(parts < before / 4, s"expected far fewer files, got $parts")
    val after = spark.read.parquet(dir).agg(sum(col("l_orderkey")), count(lit(1))).collect()(0)
    assert(after == checksum)
  }
}
