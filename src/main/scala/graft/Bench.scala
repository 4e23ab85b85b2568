package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry point: runs the headline queries on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is forced
  * through the `noop` sink so the full plan executes (a bare count()
  * would let Catalyst prune every computed column away).
  */
object Bench {
  /** Headline set: the scale-relevant pipelines. The pair scans run
    * their banded/blocked plans (simhash three-block combos, n-gram
    * size buckets, cosine LSH buckets), so regressions in the
    * sub-quadratic paths show up here; only the all-pairs reference
    * scans (dedup_embed_cosine, banded=false simhash) are excluded. */
  private val headline = Seq(
    "q1_pricing_summary", "q3_top_orders", "q7_window_rank",
    "q12_join_multi", "q13_percentiles", "q16_events_window",
    "q17_sessionize", "q19_asof_join",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_simhash_pairs", "dedup_ngram_jaccard",
    "dedup_embed_cosine_lsh", "dedup_clusters", "pipeline_near_dedup",
    "text_quality", "text_fingerprint", "text_top_tokens",
    "ann_lsh", "ann_ivf", "ann_ivf_kmeans", "mm_features")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    // JVM/codegen warmup outside the timings (tiny sf, flagship plan)
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    val qs = SparkEntry.queries
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // per-query persists must not eat later queries' execution memory
      spark.catalog.clearCache()
      (name, elapsed, ok)
    }
    // failed queries are listed, not timed: folding a fail-fast elapsed
    // into the totals would make a broken round read as a speedup
    val qjson = results.collect { case (k, v, true) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
