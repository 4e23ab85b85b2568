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
}
