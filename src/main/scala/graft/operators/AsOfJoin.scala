package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic as-of join: for each left row, attach the columns of the
  * most recent right row with the same key and `rightTime <= leftTime`
  * (inclusive). Left rows with no prior right row get nulls.
  *
  * Implementation is the union-merge technique: tag both inputs, sort
  * once per key on (time, side, tie), and carry the latest right
  * values forward with `last(..., ignoreNulls)` — one shuffle on the
  * key and a single window pass, regardless of how many right rows
  * precede each left row. A point-lookup join would be
  * O(left × right-per-key); this is one sort per key partition, and
  * AQE handles skewed keys like any other window shuffle. This is the
  * scalable formulation for 100 TB event tables.
  *
  * `rightCols` are carried to the output as `<prefix><name>`; alias
  * before calling if a name collides with a left column. `tieBreak`
  * optionally names a (leftCol, rightCol) pair that disambiguates
  * equal timestamps deterministically (e.g. an event id).
  */
object AsOfJoin {
  /** `toleranceSeconds`: when set, a carried match older than the
    * tolerance is nulled out AFTER the merge (the pandas
    * `merge_asof(tolerance=...)` contract). Nulling is exact, not
    * lossy: the carried row is the LATEST right row ≤ leftTime, so if
    * it falls outside the window no qualifying right row exists at
    * all. The merge itself is unchanged — one shuffle, one window
    * pass; the tolerance is a per-row mask on the carried struct. */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      prefix: String = "asof_",
      tieBreak: Option[(String, String)] = None,
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val (lTie, rTie) = tieBreak match {
      case Some((l, r)) => (col(l), col(r))
      case None => (lit(0L), lit(0L))
    }
    // Carry the right columns as ONE struct so the attached values all
    // come from the same (most recent) right row. Carrying each column
    // independently with last(ignoreNulls) would skip a right row's
    // legitimate NULL and resurrect a stale value from an older row —
    // mixing columns of different right rows in one output row.
    // The matched row's own timestamp rides along as an internal field
    // so the tolerance mask can compare against it.
    val rStructType = StructType(rightCols.map(c => right.schema(c).copy(nullable = true)) :+
      right.schema(rightTime).copy(name = "__asof_rts", nullable = true))
    val taggedLeft = left
      .select(Seq(col(key).as("__asof_key"), col(leftTime).as("__asof_ts"),
        lit(1).as("__asof_side"), lTie.as("__asof_tie"),
        lit(null).cast(rStructType).as("__asof_r")) ++
        leftCols.map(c => col(c)): _*)
    val taggedRight = right
      .select(Seq(col(key).as("__asof_key"), col(rightTime).as("__asof_ts"),
        lit(0).as("__asof_side"), rTie.as("__asof_tie"),
        struct(rightCols.map(col) :+ col(rightTime).as("__asof_rts"): _*).as("__asof_r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // right (side=0) sorts before left (side=1) at equal ts ⇒ inclusive
    val w = Window.partitionBy(col("__asof_key"))
      .orderBy(col("__asof_ts"), col("__asof_side"), col("__asof_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("__asof_last", last(col("__asof_r"), ignoreNulls = true).over(w))

    val masked = toleranceSeconds match {
      case Some(tol) => carried.withColumn("__asof_last",
        when(col("__asof_last").isNotNull &&
          col("__asof_last.__asof_rts") + expr(s"INTERVAL $tol SECOND") >= col("__asof_ts"),
          col("__asof_last")))
      case None => carried
    }

    masked.filter(col("__asof_side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__asof_last.$c").as(s"$prefix$c")): _*)
  }
}
