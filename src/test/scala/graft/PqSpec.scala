package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality + determinism contracts of the PQ tier (the oracle gate
  * already pins the quantization math bit-for-bit): codebook build is
  * partitioning-invariant (decimal centroid sums), and PQ-candidate →
  * exact-re-rank recovers most of the brute-force top-k.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def probes = Tables.embeddings(spark, TestSpark.sfDir)
    .filter(col("vec_id") < 10).select(col("vec_id"))

  test("pq codebooks are invariant to input partitioning") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    def build(parts: Int) = CacheScope.withScope { implicit s =>
      similarity.AnnApi.pqCodebooks(emb.repartition(parts), "vec_id", "embedding")
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getSeq[Double](2).map(java.lang.Double.doubleToLongBits), r.getDouble(3)))
        .toMap
    }
    val a = build(3)
    val b = build(11)
    assert(a.keySet == b.keySet)
    for ((k, v) <- a) assert(v == b(k), s"codebook $k differs across partitionings")
  }

  test("pq candidates + exact re-rank recover most of the brute top-5") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    CacheScope.withScope { implicit s =>
      val brute = similarity.AnnApi.bruteTopK(emb, "vec_id", "embedding", probes)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      // PQ shortlist of 50, refined by the exact cosine (the standard
      // ADC + re-rank pipeline)
      val shortlist = similarity.AnnApi.pqTopK(emb, "vec_id", "embedding", probes, k = 50)
        .select(col("id_p"), col("id_c"))
      val n = similarity.AnnApi.normalized(emb, "vec_id", "embedding")
      val reranked = shortlist
        .join(n.select(col("vec_id").as("id_p"), col("v").as("vp"), col("nrm").as("np")), Seq("id_p"))
        .join(n.select(col("vec_id").as("id_c"), col("v").as("vc"), col("nrm").as("nc")), Seq("id_c"))
        .select(col("id_p"), col("id_c"),
          (expr("graft_dot(vp, vc)") / (col("np") * col("nc"))).as("c"))
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("id_p")).orderBy(col("c").desc, col("id_c"))))
        .filter(col("rk") <= 5)
        .collect().map(r => (r.getLong(1), r.getLong(0))).map(t => (t._2, t._1)).toSet
      val recall = (brute & reranked).size.toDouble / brute.size
      // the synthetic corpus's cosine gaps are near-uniform noise, so
      // every ANN recall here is bounded low (house floors: LSH 0.15,
      // IVF 0.3) — PQ+rerank measures 0.38 and must stay above IVF's
      assert(recall >= 0.3, s"PQ+rerank recall@5 $recall below floor (got ${reranked.size} pairs)")
    }
  }
}
