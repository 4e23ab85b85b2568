package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence contract of the native vector-sum aggregate: for every
  * position, `graft_vecsum_dec(v)[i]` must equal
  * `sum(CAST(v[i] AS DECIMAL(28,12)))` of the posexplode formulation
  * it replaces — same per-element cast, same exact decimal result —
  * independent of partitioning (decimal addition is merge-order-free).
  */
class VecSumDecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def viaExplode(df: org.apache.spark.sql.DataFrame) =
    df.select(col("g"), posexplode(col("v")).as(Seq("pos0", "x")))
      .groupBy(col("g"), (col("pos0") + 1).as("i"))
      .agg(sum(col("x").cast(DecimalType(28, 12))).as("s"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getDecimal(2))).toMap

  private def viaNative(df: org.apache.spark.sql.DataFrame) = {
    functions.VecSumDec.ensure(spark)
    df.groupBy(col("g"))
      .agg(call_function("graft_vecsum_dec", col("v")).as("sv"))
      .select(col("g"), posexplode(col("sv")).as(Seq("pos0", "s")))
      .collect().map(r => ((r.getLong(0), r.getInt(1) + 1), r.getDecimal(2))).toMap
  }

  test("matches the posexplode decimal sum on random vectors at any partitioning") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      (i.toLong % 7, Array.fill(16)(rnd.nextDouble() * 2 - 1))
    }
    import spark.implicits._
    for (parts <- Seq(1, 5)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val exploded = viaExplode(df)
      val native = viaNative(df)
      assert(native.keySet == exploded.keySet)
      for ((k, v) <- exploded)
        assert(native(k).compareTo(v) == 0, s"position $k: native ${native(k)} != sum $v")
    }
  }

  test("extreme magnitudes keep the exact double→decimal(28,12) cast semantics") {
    import spark.implicits._
    // values whose shortest repr exercises HALF_UP rounding at scale 12
    val df = Seq(
      (0L, Array(1.0000000000005e-1, 123456789.123456789, -9.9999999999995e-3)),
      (0L, Array(2.5e-13, -2.5e-13, 0.1 + 0.2))).toDF("g", "v")
    assert(viaNative(df) == viaExplode(df))
  }

  test("ragged and null inputs mirror posexplode row semantics") {
    import spark.implicits._
    val df = Seq(
      (0L, Some(Array(1.5, 2.5, 3.5))),
      (0L, Some(Array(0.25))), // shorter: contributes only position 1
      (0L, None), // null vector: no rows
      (1L, Some(Array(4.0, 5.0)))).toDF("g", "v")
    val native = viaNative(df)
    val exploded = viaExplode(df.filter(col("v").isNotNull))
    assert(native == exploded,
      "missing positions must contribute nothing, exactly like absent posexplode rows")
  }
}
