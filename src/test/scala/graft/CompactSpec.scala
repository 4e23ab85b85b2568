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

  test("partitioned write prunes partitions at the scan, not post-scan") {
    val dir = Files.createTempDirectory("graft-prune").toString + "/t"
    val src = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("n_chars"), col("lang"))
    sources.Sources.write(src, "parquet", dir, partitionBy = Seq("lang"))
    val langs = src.select(col("lang")).distinct().collect().map(_.getString(0))
    assert(langs.length > 1, "fixture needs several partition dirs")
    val pruned = spark.read.parquet(dir).filter(col("lang") === langs.head)
    val plan = pruned.queryExecution.executedPlan.toString
    // the lang predicate must land in PartitionFilters (directory
    // pruning), and the scan must not list it as a data filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("lang"),
      s"lang must prune partitions:\n$plan")
    // row parity with the unpartitioned source
    assert(pruned.count() == src.filter(col("lang") === langs.head).count())
  }

  test("vec_silhouette: planted tight clusters score near 1, real labels bounded") {
    import spark.implicits._
    // two well-separated tight clusters in 64-d: e1-axis and e2-axis
    val dim = 64
    def v(axis: Int, eps: Float) =
      Array.tabulate(dim)(i => if (i == axis) 1.0f else if (i == axis + 2) eps else 0.0f)
    val rows = (0 until 8).map(i => (i.toLong, v(0, 0.01f * (i % 3)), 0)) ++
      (8 until 16).map(i => (i.toLong, v(1, 0.01f * (i % 3)), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val r = CacheScope.withScope { implicit s =>
      similarity.AnnApi.silhouette(df, "vec_id", "embedding", "label")
        .collect().map(x => (x.getInt(0), (x.getLong(1), x.getDouble(2)))).toMap
    }
    assert(r.keySet == Set(0, 1))
    assert(r(0)._1 == 8 && r(1)._1 == 8)
    assert(r(0)._2 > 0.9 && r(1)._2 > 0.9, s"tight separated clusters must score near 1: $r")
    // real embeddings: -1 <= mean_sil <= 1 per label
    val real = similarity.Similarity.vecSilhouette.build(spark, TestSpark.sfDir).collect()
    assert(real.nonEmpty)
    assert(real.forall(x => x.getDouble(2) >= -1.0 - 1e-6 && x.getDouble(2) <= 1.0 + 1e-6))
  }

  test("vec_outliers flags only genuinely far vectors on real embeddings") {
    val rows = similarity.Similarity.vecOutliers.build(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val (total, out) = (rows.map(_._2).sum, rows.map(_._3).sum)
    // mean + 2σ keeps the flag rate in the single digits on any
    // roughly unimodal corpus (Chebyshev bounds it at 25%)
    assert(out <= total / 4, s"outlier rate implausible: $out of $total")
    assert(rows.forall(r => r._3 <= r._2))
  }
}
