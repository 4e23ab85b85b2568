package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 fixtures: the r12 verdict/ADVICE items — the rank-map
  * guard's shuffle branch exercised at REAL (>10⁶-key) grain, and the
  * derived (skew-proof) copy stride of the mixture→pack composite
  * identity. */
class Round13Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("spearmanOfScores at >1e6 distinct keys: guard takes the shuffle branch (SortMergeJoin, no rank-map hints), rho exact") {
    import spark.implicits._
    // 1.2M distinct continuous za keys, zb a strictly monotone map of
    // za: ranks coincide row-for-row, so rho == 1.0 EXACTLY — the
    // value assertion costs nothing while the plan assertions pin the
    // scale behavior the r12 verdict asked for (the shuffle branch
    // had only ever run forced, at toy scale)
    val n = 1200000L
    val zz = spark.range(n).selectExpr(
      "CAST(id AS DOUBLE) + 0.5 AS za",
      "CAST(id AS DOUBLE) * 2.0 + 1.0 AS zb")
    def run(maxKeys: Long): (Int, String, org.apache.spark.sql.Row) =
      CacheScope.withScope { implicit s =>
        val df = operators.Analytics.spearmanOfScores(zz, maxKeys)
        val hints = df.queryExecution.analyzed.collect {
          case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
        }.size
        val p = df.queryExecution.executedPlan.toString
        (hints, p, df.collect().head)
      }
    // default ceiling (1e6): 1.2e6 > 1e6 → shuffle branch
    val (hintsSh, planSh, rowSh) = run(operators.Analytics.RankMapBroadcastKeys)
    // forced-broadcast reference: exactly the two rank-map hints more
    val (hintsBc, _, rowBc) = run(Long.MaxValue)
    assert(hintsBc == hintsSh + 2,
      s"guard must leave exactly the two rank-map joins unhinted at >1e6 keys: $hintsBc vs $hintsSh")
    assert(planSh.contains("SortMergeJoin"),
      "rank-map joins at >1e6 keys must plan as sort-merge joins:\n" + planSh.take(4000))
    assert(rowSh.getLong(0) == n && rowBc.getLong(0) == n)
    assert(rowSh.getDouble(1) == 1.0, s"monotone scores must give rho == 1.0: $rowSh")
    assert(java.lang.Double.doubleToRawLongBits(rowSh.getDouble(1)) ==
      java.lang.Double.doubleToRawLongBits(rowBc.getDouble(1)),
      s"shuffle and broadcast branches must agree bitwise: $rowSh vs $rowBc")
  }

  test("mixture→pack composite identity: stride derives from max copies, so a skewed slice (copies > 8) never aliases units") {
    import spark.implicits._
    // 24 en docs + 1 rare de doc, uniform flattening over k = 2
    // slices: rep(de) = 25/(2·1) = 12.5 → 12 or 13 copies — beyond
    // the OLD fixed stride of 8 (the r12 ADVICE aliasing scenario)
    val docs = ((1 to 24).map(i => (i.toLong, "en", s"alpha beta w$i plus some more words here")) :+
      (25L, "de", "eins zwei drei vier fuenf")).toDF("doc_id", "lang", "text")
    val em = functions.Pipeline.mixtureSample(docs, "lang")
    val maxCopy = em.agg(max(col("copy"))).collect().head.getLong(0)
    assert(maxCopy + 1 > 8, s"fixture must exceed the old stride: maxCopy=$maxCopy")
    // composite ids must be collision-free: one packable unit per
    // emitted (doc, copy) row
    val stride = maxCopy + 1
    val unitIds = em.select((col("doc_id") * stride + col("copy")).as("uid"))
    assert(unitIds.count() == unitIds.distinct().count(),
      "derived stride must keep every emitted copy a distinct unit")
    // and the packed total must conserve every emitted token
    val emitted = em.select(
        size(split(graft.Portable.normText(col("text")), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    val packed = CacheScope.withScope { implicit s =>
      functions.Pipeline.mixturePackStats(docs, "lang", capacity = 16, salts = 2)
        .agg(sum(col("n_tokens"))).collect().head.getLong(0)
    }
    assert(packed == emitted, s"packed $packed vs emitted $emitted")
  }
}
