package graft.schema

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: `typeString` output re-parses to a structurally
  * equivalent type (parse ∘ render ≡ id up to ids/required flags,
  * which the string form intentionally does not carry for lists). */
class TypeRoundTripSpec extends AnyFunSuite {
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private val prim: Gen[GType] = Gen.oneOf(
    Gen.oneOf[GType](GString, GInt, GLong, GFloat, GDouble, GBoolean, GDate, GTime, GTimestamp, GBinary),
    for { p <- Gen.choose(1, 38); s <- Gen.choose(0, math.min(p, 18)) } yield GDecimal(p, s))

  private def typeGen(depth: Int): Gen[GType] =
    if (depth <= 0) prim
    else Gen.frequency(
      4 -> prim,
      1 -> typeGen(depth - 1).map(e => GList(0, elementRequired = false, e)),
      1 -> (for { k <- prim; v <- typeGen(depth - 1) } yield GMap(0, k, 0, valueRequired = false, v)),
      1 -> (for {
        n <- Gen.choose(1, 3)
        ts <- Gen.listOfN(n, typeGen(depth - 1))
      } yield GStruct(ts.zipWithIndex.map { case (t, i) =>
        GField(0, s"c$i", required = false, t) })))

  /** structural shape ignoring ids and required flags */
  private def shape(t: GType): String = t match {
    case GStruct(fs) => fs.map(f => s"${f.name}:${shape(f.tpe)}").mkString("s<", ",", ">")
    case GList(_, _, e) => s"l<${shape(e)}>"
    case GMap(_, k, _, _, v) => s"m<${shape(k)},${shape(v)}>"
    case p => p.typeString
  }

  test("typeString re-parses to the same structure, 200 cases") {
    samples(typeGen(3), 200).foreach { t =>
      val rendered = t.typeString
      val back = TypeParser.parse(rendered)
      assert(shape(back) == shape(t), s"render='$rendered'")
      // and rendering is a fixpoint after one round-trip
      assert(TypeParser.parse(back.typeString).typeString == back.typeString)
    }
  }
}
