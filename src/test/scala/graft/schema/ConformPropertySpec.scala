package graft.schema

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Data-migration property: for random schemas, random data, and
  * random evolution sequences, `Evolver.conform` preserves every
  * surviving field's values (under the widening cast), null-fills
  * added fields, and drops removed ones — the metadata round-trip
  * property (EvolvePropertySpec) extended to the actual rows.
  */
class ConformPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val NRows = 5

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))

  private val primGen: Gen[GType] = Gen.oneOf(GString, GInt, GLong, GDouble, GBoolean)

  private def schemaGen: Gen[GSchema] = for {
    n <- Gen.choose(2, 5)
    fields <- Gen.sequence[Seq[GField], GField]((2 to n).map { i =>
      for { t <- primGen; req <- Gen.oneOf(true, false) } yield GField(i, s"f$i", req, t)
    })
  } yield GSchema(0, GField(1, "f1", required = true, GLong) +: fields) // f1 = stable row key

  private def opGen(s: GSchema, step: Int): Gen[EvolutionOp] = {
    val names = s.fields.map(_.name).filterNot(_ == keyName(s))
    val widenable = s.fields.filter(f => f.tpe == GInt || f.tpe == GLong)
    val opts: Seq[Gen[EvolutionOp]] = Seq(
      Some(Gen.oneOf(s.fields.map(_.name)).map(n => RenameColumn(n, s"r${step}_$n"))),
      if (widenable.nonEmpty) Some(Gen.oneOf(widenable).map(f =>
        UpdateColumn(f.name, Some(f.tpe), Some(if (f.tpe == GInt) GLong else GDouble)))) else None,
      Some(Gen.const(AddColumn(s"a$step", GString))),
      if (names.nonEmpty) Some(Gen.oneOf(names).map(DropColumn(_))) else None,
      if (s.fields.size > 1) Some(for {
        mv <- Gen.oneOf(s.fields.map(_.name)); pos <- Gen.oneOf("first", "after")
        tgt <- Gen.oneOf(s.fields.map(_.name).filterNot(_ == mv))
      } yield MoveColumn(mv, if (pos == "first") "" else tgt, pos)) else None).flatten
    Gen.choose(0, opts.size - 1).flatMap(opts(_))
  }

  private def keyName(s: GSchema): String = s.fields.find(_.id == 1).get.name

  private def valueFor(f: GField, row: Int): Any = f.tpe match {
    case GLong => f.id.toLong * 100 + row
    case GInt => f.id * 100 + row
    case GDouble => f.id + row * 0.5
    case GBoolean => (f.id + row) % 2 == 0
    case _ => s"v${f.id}_$row"
  }

  /** value after widening to the target type */
  private def expected(src: GField, tgtType: GType, row: Int): Any =
    (src.tpe, tgtType) match {
      case (GInt, GLong) => (src.id * 100 + row).toLong
      case (GInt, GDouble) => (src.id * 100 + row).toDouble
      case (GLong, GDouble) => (src.id.toLong * 100 + row).toDouble
      case _ => valueFor(src, row)
    }

  test("conform preserves values through random evolutions, 15 cases") {
    import scala.jdk.CollectionConverters._
    samples(schemaGen, 15).zipWithIndex.foreach { case (s0, ci) =>
      val nOps = 1 + ci % 4
      val target = (0 until nOps).foldLeft(s0) { (cur, step) =>
        opGen(cur, step).apply(Gen.Parameters.default, Seed(ci * 100L + step))
          .map(op => try Evolver.applyOp(cur, op) catch { case _: Exception => cur })
          .getOrElse(cur)
      }
      val rows = (0 until NRows).map(r => Row(s0.fields.map(f => valueFor(f, r)): _*)).asJava
      val df = spark.createDataFrame(rows, GSchema.toSpark(s0))
      val out = Evolver.conform(df, s0, target)

      assert(out.schema.fieldNames.toSeq == target.fields.map(_.name), s"case $ci column order")
      val key = keyName(target)
      val collected = out.orderBy(key).collect()
      assert(collected.length == NRows, s"case $ci row count")
      val srcById = s0.fields.map(f => f.id -> f).toMap
      collected.zipWithIndex.foreach { case (row, r) =>
        target.fields.zipWithIndex.foreach { case (tf, i) =>
          srcById.get(tf.id) match {
            case Some(sf) =>
              assert(row.get(i) == expected(sf, tf.tpe, r),
                s"case $ci row $r field ${tf.name}: got ${row.get(i)}, want ${expected(sf, tf.tpe, r)}\ns0=$s0\ntarget=$target")
            case None =>
              assert(row.isNullAt(i), s"case $ci added field ${tf.name} must be null")
          }
        }
      }
    }
  }
}
