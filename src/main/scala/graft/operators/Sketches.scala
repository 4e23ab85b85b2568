package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Approximate/sketch aggregates (SURVEY.md §2.8). Rows-only for the
  * driver gate: HLL estimates are engine-specific by nature, so the
  * oracle cannot be DuckDB; the error bound vs the exact count is
  * asserted in SketchesSpec instead.
  */
object Sketches {
  /** HLL++ distinct estimate next to the exact count per group. At
    * 100 TB the approx variant replaces a full distinct shuffle with a
    * mergeable fixed-size sketch — this is the scale path for q10. */
  val approxDistinct = QueryDef(
    "approx_distinct",
    None, // engine-specific estimate; spec asserts |approx-exact| <= 5% rsd bound
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
      .orderBy(col("l_returnflag")))

  /** Greenwald–Khanna approximate quantiles next to the exact ones.
    * Rows-only: the sketch is engine-specific; SketchesSpec asserts
    * the configured relative-error bound against the exact values.
    * At 100 TB approx_percentile's mergeable fixed-size summary
    * replaces q13's full per-group sort. */
  val approxQuantiles = QueryDef(
    "approx_quantiles",
    None,
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)").as("approx_p"),
        expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("exact_p"))
      .orderBy(col("l_returnflag")))

  val defs: Seq[QueryDef] = Seq(approxDistinct, approxQuantiles)
}
