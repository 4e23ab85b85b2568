package graft.operators

import graft.CacheScope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT interpolated percentiles that scale: distributed order-
  * statistic selection by iterative range narrowing (the classic
  * multi-pass selection of Munro & Paterson, "Selection and Sorting
  * with Limited Storage", TCS 1980, in its histogram form), instead
  * of Spark's `percentile()` aggregate, which buffers EVERY value of
  * a group in one reducer — exact percentiles over a 3-group 100 TB
  * table would park ~all rows in 3 aggregation buffers. Here no
  * executor ever holds more than a 2^16-bucket count array:
  *
  *  1. doubles map to an order-isomorphic SIGNED LONG domain
  *     ([[graft.functions.DBitsExpr]]) so range splitting is exact
  *     integer arithmetic;
  *  2. each pass histograms the in-range rows of every unresolved
  *     (group, rank) target into 2^16 buckets (map-side partial
  *     aggregation; the shuffle carries buckets, never rows), walks
  *     the tiny cumulative histogram to find the bucket holding the
  *     target rank, and narrows the range to that bucket's ACTUAL
  *     [min, max] while reducing the rank to its offset inside it;
  *  3. a target resolves when its bucket holds a single long pattern
  *     (min == max — every row in it is the same double). Nominal
  *     narrowing is 2^16× per pass, so 4 passes pin any 64-bit
  *     pattern; a 5th is headroom for the first pass's rounded
  *     double arithmetic on 2^63-magnitude spans (bucketing there
  *     uses long→double casts, which are monotone — correctness
  *     never depends on bucket evenness, only on monotone
  *     deterministic splitting, because ranges re-tighten from exact
  *     per-bucket long min/max).
  *
  * The full-table scans per pass read one pruned (group, value)
  * projection (persisted via the caller's [[graft.CacheScope]]), and
  * all selection state is (groups × ranks) rows — KBs. Interpolation
  * matches `percentile_cont` / Spark `percentile`:
  * `lo + (hi − lo) · (r − ⌊r⌋)` at rank `r = p·(n−1)`.
  */
object ExactPercentiles {

  val Buckets = 1 << 16
  val MaxPasses = 5

  /** Exact interpolated percentiles of `value` per `group`: returns
    * one row per (group, p) with column names (g, p, value). Nulls in
    * `value` are ignored (as Spark `percentile` does); a group with
    * zero non-null values yields no row. */
  def percentiles(df: DataFrame, group: String, value: String, ps: Seq[Double])(
      implicit scope: CacheScope = CacheScope.untracked): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"ps must be in [0,1]: $ps")
    graft.functions.DBits.ensure(df.sparkSession)
    val data = df
      .select(col(group).as("g"), col(value).cast("double").as("x"))
      .filter(col("x").isNotNull)
      .withColumn("s", graft.functions.DBits.ordered(col("x")))
      .transform(scope.persist)

    // per-group counts → the 0-based order-statistic ranks every p needs:
    // r = p·(n−1), order stats at ⌊r⌋ and ⌈r⌉ (deduped when integral)
    val counts = data.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val targets = counts
      .select(col("g"), col("n"), explode(array(ps.map(lit(_)): _*)).as("p"))
      .select(col("g"), col("p"), (col("p") * (col("n") - 1)).as("r"))
      .transform(scope.persist)
    val ranks = targets
      .select(col("g"), explode(array(floor(col("r")), ceil(col("r")))).as("kd"))
      .select(col("g"), col("kd").cast("long").as("k"))
      .distinct()

    // selection state per (g, k): s-range [lo, hi] (inclusive) still in
    // play and the rank offset `rem` inside it. Initial range = the
    // group's actual s min/max (also resolves single-value groups on
    // pass 1 without the full-domain span).
    val bounds = data.groupBy(col("g")).agg(min(col("s")).as("glo"), max(col("s")).as("ghi"))
    var state = ranks.join(bounds, Seq("g"))
      .select(col("g"), col("k"), col("glo").as("lo"), col("ghi").as("hi"), col("k").as("rem"))
      .localCheckpoint(true)
    var resolved: DataFrame = ranks.limit(0)
      .select(col("g"), col("k"), lit(0.0).as("v")) // typed empty seed

    for (_ <- 1 to MaxPasses) {
      // bucket the in-range rows of every live target. The long→double
      // casts are monotone, so the bucket function is a deterministic
      // monotone partition of [lo, hi] even where 2^63-scale spans
      // round; ranges re-tighten from exact long bmin/bmax below.
      val ranged = data.join(broadcast(state), Seq("g"))
        .filter(col("s") >= col("lo") && col("s") <= col("hi"))
      val widthD = col("hi").cast("double") - col("lo").cast("double")
      val step = greatest(lit(1.0), widthD / Buckets)
      val b = least(lit(Buckets - 1), greatest(lit(0),
        floor((col("s").cast("double") - col("lo").cast("double")) / step).cast("int")))
      val hist = ranged
        .groupBy(col("g"), col("k"), b.as("b"))
        .agg(count(lit(1)).as("c"), min(col("s")).as("bmin"), max(col("s")).as("bmax"),
          min(col("x")).as("bx"),
          min(col("rem")).as("rem")) // constant per (g, k) — carried through
      val w = Window.partitionBy(col("g"), col("k")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val sel = hist
        .withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
        .filter(col("cum") <= col("rem") && col("rem") < col("cum") + col("c"))
        .select(col("g"), col("k"), col("bmin").as("lo"), col("bmax").as("hi"),
          (col("rem") - col("cum")).as("rem"), col("bx").as("v"))
        .localCheckpoint(true) // truncate the per-pass lineage (tiny frame)
      val done = sel.filter(col("lo") === col("hi")).select(col("g"), col("k"), col("v"))
      resolved = resolved.union(done)
      state = sel.filter(col("lo") =!= col("hi"))
        .select(col("g"), col("k"), col("lo"), col("hi"), col("rem"))
    }
    // MaxPasses of 2^16 narrowing pin any 64-bit pattern; a live row
    // here means the invariant broke — fail loudly, never silently
    val leftover = state.limit(1).count()
    if (leftover != 0) throw new IllegalStateException(
      s"ExactPercentiles did not resolve within $MaxPasses passes")

    // interpolate: value = xlo + (xhi − xlo)·(r − ⌊r⌋), Spark's
    // Percentile/percentile_cont formula
    targets
      .withColumn("kf", floor(col("r")).cast("long"))
      .withColumn("kc", ceil(col("r")).cast("long"))
      .join(resolved.toDF("g", "kf", "xlo"), Seq("g", "kf"))
      .join(resolved.toDF("g", "kc", "xhi"), Seq("g", "kc"))
      // integral rank returns the order statistic ITSELF (as Spark's
      // Percentile does) — `xlo + 0.0·Δ` would turn −0.0 into +0.0
      .select(col("g"), col("p"),
        when(col("kf") === col("kc"), col("xlo"))
          .otherwise(col("xlo") + (col("xhi") - col("xlo")) * (col("r") - floor(col("r"))))
          .as("value"))
  }
}
