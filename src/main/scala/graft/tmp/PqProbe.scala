package graft.tmp

import graft.Tables
import graft.similarity.{AnnApi, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Throwaway job counter for ann_ivfpq_residual (deleted before commit). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    })
    val emb = Tables.embeddings(spark, d)
    emb.count() // warm the read
    def run(tag: String): Unit = {
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      graft.CacheScope.withScope { implicit scope =>
        AnnApi.ivfPqResidualTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 10).select(col("vec_id")),
          k = 5, nProbeCells = 2, kCells = Similarity.KmeansCells,
          kmIters = Similarity.KmeansIters, m = Similarity.PqSubspaces,
          subDim = Similarity.PqSubDim, kCodes = Similarity.PqCodes,
          pqIters = Similarity.PqIters, trainMod = Similarity.PqTrainMod)(scope)
          .collect()
      }
      Thread.sleep(500) // let listener events drain
      println(f"[pq] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, jobs=${jobs.get}, stages=${stages.get}")
    }
    run("residual cold")
    spark.catalog.clearCache()
    run("residual warm codegen")
    spark.stop()
  }
}
