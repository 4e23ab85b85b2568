package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the covariance-backed power iteration: on a corpus
  * built as `s·u + noise` with a planted dominant direction u, the
  * recovered component must align with u, the eigenvalue must
  * dominate the noise variance, and the result must be identical
  * under any partitioning (the moments are exact decimals).
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus(parts: Int) = {
    val rnd = new scala.util.Random(5)
    val d = 12
    val u = Array.tabulate(d)(i => math.sin(i + 1.0))
    val un = { val n = math.sqrt(u.map(x => x * x).sum); u.map(_ / n) }
    val rows = (0 until 400).map { i =>
      val s = rnd.nextGaussian() * 3.0
      (i.toLong, Array.tabulate(d)(k => s * un(k) + rnd.nextGaussian() * 0.1))
    }
    import spark.implicits._
    (un, rows.toDF("id", "v").repartition(parts))
  }

  test("recovers a planted dominant direction, invariant under partitioning") {
    val (u, df3) = corpus(3)
    val (v3, l3) = similarity.AnnApi.principalComponent(df3, "v")
    val cos = math.abs(v3.zip(u).map { case (a, b) => a * b }.sum)
    assert(cos > 0.99, s"recovered component misaligned: |cos| = $cos")
    assert(l3 > 1.0, s"eigenvalue should dominate the 0.01 noise variance, got $l3")
    val (v8, l8) = similarity.AnnApi.principalComponent(corpus(8)._2, "v")
    assert(v3.toSeq == v8.toSeq && l3 == l8,
      "principal component must be bit-identical under partitioning")
  }

  test("projection recovers each vector's planted coordinate, centered") {
    import spark.implicits._
    // exact rank-1 corpus along e1: x_i = i · e1. The dominant
    // component is ±e1, the sign convention fixes +e1, and the
    // centered projection must be exactly i − mean(i).
    val n = 40
    val df = (0 until n).map(i => (i.toLong, Array.tabulate(6)(k => if (k == 0) i.toDouble else 0.0)))
      .toDF("id", "v")
    val got = similarity.AnnApi.pcaProject(df, "id", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val mean = (0 until n).sum.toDouble / n
    (0 until n).foreach { i =>
      assert(math.abs(got(i.toLong) - (i - mean)) < 1e-9,
        s"proj($i) = ${got(i.toLong)}, want ${i - mean}")
    }
    // map-only projection: the pass adds no exchange of any kind
    val plan = similarity.AnnApi.pcaProject(df, "id", "v").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection pass must be map-only:\n$plan")
  }
}
