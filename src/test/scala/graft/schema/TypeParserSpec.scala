package graft.schema

import org.scalatest.funsuite.AnyFunSuite

class TypeParserSpec extends AnyFunSuite {

  test("primitives incl. aliases") {
    assert(TypeParser.parse("string") == GString)
    assert(TypeParser.parse("int") == GInt)
    assert(TypeParser.parse("integer") == GInt)
    assert(TypeParser.parse("bool") == GBoolean)
    assert(TypeParser.parse("TIMESTAMP") == GTimestamp)
  }

  test("decimal with whitespace") {
    assert(TypeParser.parse("decimal( 10 , 2 )") == GDecimal(10, 2))
  }

  test("array and list of primitives") {
    val GList(_, _, GInt) = TypeParser.parse("array<int>"): @unchecked
    val GList(_, _, GString) = TypeParser.parse("list<string>"): @unchecked
  }

  test("map with nested value") {
    val GMap(_, GString, _, _, GList(_, _, GDouble)) =
      TypeParser.parse("map<string, array<double>>"): @unchecked
  }

  test("struct with nested containers splits only at top level") {
    val GStruct(fs) = TypeParser.parse("struct<a: int, b: map<string, struct<x: long, y: float>>>"): @unchecked
    assert(fs.map(_.name) == Seq("a", "b"))
    val GMap(_, GString, _, _, GStruct(inner)) = fs(1).tpe: @unchecked
    assert(inner.map(_.name) == Seq("x", "y"))
  }

  test("splitTopLevel ignores separators inside angle brackets") {
    assert(TypeParser.splitTopLevel("a<b,c>,d,e<f<g,h>>") == Seq("a<b,c>", "d", "e<f<g,h>>"))
  }

  test("unknown type string rejected") {
    intercept[IllegalArgumentException](TypeParser.parse("varchar(10)"))
  }

  test("typeString renders like the reference clean_type_str") {
    val t = GStruct(Seq(
      GField(1, "a", required = true, GInt),
      GField(2, "b", required = false, GList(3, elementRequired = false, GString))))
    assert(t.typeString == "struct<a: int, b: optional list<string>>")
    assert(GDecimal(10, 2).typeString == "decimal(10, 2)")
    assert(GMap(1, GString, 2, valueRequired = true, GDouble).typeString == "map<string, double>")
  }
}
