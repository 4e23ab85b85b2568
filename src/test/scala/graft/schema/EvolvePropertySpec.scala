package graft.schema

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: for any schema and any valid evolution sequence,
  * `SchemaDiff.byId(current, target).toOperations` applied back to
  * `current` (via the Evolver's phased order) reconstructs `target` —
  * names, types, docs, required flags AND top-level field order
  * (so the minimal-move detection must compose with sequential
  * move-application). Ids of newly added fields are allocator-assigned
  * and excluded from the comparison, mirroring the reference where
  * adds get catalog-assigned ids.
  */
class EvolvePropertySpec extends AnyFunSuite {
  /** deterministic seeded sampling (no scalatest-scalacheck bridge in
    * the offline cache; plain Gen + fixed seeds is just as rigorous) */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val primGen: Gen[GType] =
    Gen.oneOf(GString, GInt, GLong, GFloat, GDouble, GBoolean, GDate, GTimestamp)

  private def schemaGen: Gen[GSchema] = for {
    n <- Gen.choose(1, 6)
    names = (1 to n).map(i => s"f$i")
    fields <- Gen.sequence[Seq[GField], GField](names.zipWithIndex.map { case (nm, i) =>
      for {
        t <- primGen
        req <- Gen.oneOf(true, false)
        doc <- Gen.option(Gen.oneOf("a", "b"))
        nested <- Gen.oneOf(true, false, false)
        tpe <- if (nested && i == 0)
          primGen.map(p => GStruct(Seq(GField(100 + i * 10, "inner1", false, p),
            GField(101 + i * 10, "inner2", false, GString))))
        else Gen.const(t)
      } yield GField(i + 1, nm, req, tpe, doc)
    })
  } yield GSchema(0, fields)

  /** One valid op against the current schema state. */
  private def opGen(s: GSchema, step: Int): Gen[Option[EvolutionOp]] = {
    val topNames = s.fields.map(_.name)
    val widenable = s.fields.filter(f => Seq[GType](GInt, GLong, GFloat).contains(f.tpe))
    val opts: Seq[Gen[EvolutionOp]] = Seq(
      Some(Gen.oneOf(topNames).map(n => RenameColumn(n, s"renamed_${step}_$n"))),
      if (widenable.nonEmpty) Some(Gen.oneOf(widenable).map(f =>
        UpdateColumn(f.name, Some(f.tpe), Some(f.tpe match {
          case GInt => GLong
          case GLong => GDouble
          case _ => GDouble
        })))) else None,
      Some(Gen.const(AddColumn(s"added_$step", GString, Some("new")))),
      if (s.fields.size > 1) Some(Gen.oneOf(topNames).map(DropColumn(_))) else None,
      if (s.fields.size > 1) Some(
        for {
          mv <- Gen.oneOf(topNames)
          tgt <- Gen.oneOf(topNames.filterNot(_ == mv))
          pos <- Gen.oneOf("before", "after", "first")
        } yield MoveColumn(mv, if (pos == "first") "" else tgt, pos)) else None
    ).flatten
    Gen.oneOf(opts(0), opts(1 % opts.size), opts.drop(2): _*).map(Some(_))
  }

  private def evolutionGen: Gen[(GSchema, GSchema)] = for {
    s0 <- schemaGen
    nOps <- Gen.choose(0, 5)
    target <- (0 until nOps).foldLeft(Gen.const(s0)) { (acc, step) =>
      acc.flatMap { cur =>
        opGen(cur, step).map {
          case Some(op) => try Evolver.applyOp(cur, op) catch { case _: Exception => cur }
          case None => cur
        }
      }
    }
  } yield (s0, target)

  /** ids of pre-existing fields are stable; added fields get fresh ids
    * — compare everything except the id of fields absent from src. */
  private def comparable(s: GSchema): Seq[(String, String, Boolean, Option[String])] =
    s.fields.map(f => (f.name, f.tpe.canonical.typeString, f.required, f.doc))

  test("diff → operations → apply reconstructs the target schema (incl. order), 300 cases") {
    samples(evolutionGen, 300).foreach { case (current, target) =>
      val result = Evolver.evolve(current, target, allowBreaking = true)
      assert(comparable(result.schema) == comparable(target),
        s"\ncurrent=$current\ntarget=$target\nops=${result.ops}\ngot=${result.schema}")
    }
  }

  test("compat: evolve with only widening/additive ops keeps old data readable, 100 cases") {
    samples(schemaGen, 100).foreach { s0 =>
      val widened = s0.copy(fields = s0.fields.map(f => f.tpe match {
        case GInt => f.copy(tpe = GLong)
        case GFloat => f.copy(tpe = GDouble)
        case _ => f
      }) :+ GField(999, "appended", required = false, GString))
      assert(Compat.canRead(s0, widened).isEmpty)
    }
  }
}
