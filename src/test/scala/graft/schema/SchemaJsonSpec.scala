package graft.schema

import org.scalatest.funsuite.AnyFunSuite

class SchemaJsonSpec extends AnyFunSuite {

  private val nested = GSchema(0, Seq(
    GField(1, "id", required = true, GString),
    GField(2, "age", required = true, GInt),
    GField(3, "price", required = false, GDecimal(10, 2), doc = Some("unit price")),
    GField(4, "meta", required = false, GStruct(Seq(
      GField(5, "browser", required = false, GString),
      GField(6, "attempts", required = false, GList(7, elementRequired = true, GInt)),
      GField(8, "tags", required = false, GMap(9, GString, 10, valueRequired = true, GStruct(Seq(
        GField(11, "weight", required = false, GDouble)))))))),
    GField(12, "ts", required = false, GTimestamp)))

  test("iceberg JSON round-trip preserves everything") {
    val json = SchemaJson.toJson(nested)
    val back = SchemaJson.fromJson(json)
    assert(back == nested)
  }

  test("iceberg JSON format details") {
    val json = SchemaJson.toJson(nested, pretty = false)
    assert(json.contains(""""schema-id":0"""))
    assert(json.contains(""""decimal(10, 2)""""))
    assert(json.contains(""""element-id":7"""))
    assert(json.contains(""""key-id":9"""))
    assert(json.contains(""""doc":"unit price""""))
  }

  test("parse decimal with and without space") {
    assert(SchemaJson.parseType(org.json4s.JString("decimal(10, 2)")) == GDecimal(10, 2))
    assert(SchemaJson.parseType(org.json4s.JString("decimal(5,1)")) == GDecimal(5, 1))
  }

  test("unknown primitive rejected") {
    intercept[IllegalArgumentException] {
      SchemaJson.fromJson("""{"type":"struct","schema-id":0,"fields":[
        {"id":1,"name":"x","required":true,"type":"uuid7"}]}""")
    }
  }

  test("JSON-Schema draft conversion with reference id-allocation order") {
    // mirrors the shape of the reference's users_current.json example:
    // ids: field first, children next, container ids after children
    val draft = """{
      "type": "object",
      "properties": {
        "id": {"type": "string"},
        "age": {"type": "integer"},
        "meta": {
          "type": "object",
          "properties": {
            "browser": {"type": "string"},
            "attempts": {"type": "array", "items": {"type": "integer"}}
          }
        }
      },
      "required": ["id", "age"]
    }"""
    val s = SchemaJson.fromJsonSchemaDraft(draft)
    assert(s.fields.map(_.name) == Seq("id", "age", "meta"))
    assert(s.fields(0).required && s.fields(1).required && !s.fields(2).required)
    assert(s.fields(0).id == 1 && s.fields(1).id == 2)
    val meta = s.fields(2)
    assert(meta.id == 3)
    val GStruct(metaFields) = meta.tpe: @unchecked
    assert(metaFields.map(_.name) == Seq("browser", "attempts"))
    assert(metaFields(0).id == 4)
    assert(metaFields(1).id == 5) // array field id first…
    val GList(elemId, true, GInt) = metaFields(1).tpe: @unchecked
    assert(elemId == 7) // …then the element field consumes 6, container id last
  }

  test("draft object without properties or additionalProperties is rejected") {
    intercept[IllegalArgumentException] {
      SchemaJson.fromJsonSchemaDraft("""{"type":"object","properties":{"bad":{"type":"object"}}}""")
    }
  }

  test("draft additionalProperties becomes string-keyed map") {
    val s = SchemaJson.fromJsonSchemaDraft(
      """{"type":"object","properties":{"counts":{"type":"object","additionalProperties":{"type":"integer"}}}}""")
    val GMap(_, GString, _, true, GInt) = s.fields.head.tpe: @unchecked
  }

  test("JSON-Schema draft export: reference primitive mapping and required order") {
    // the reference's iceberg_type_to_json_type (catalog.py:3):
    // int/long -> integer, float/double -> number, boolean -> boolean,
    // everything else -> string
    val s = GSchema(0, Seq(
      GField(1, "a", required = true, GInt),
      GField(2, "b", required = true, GLong),
      GField(3, "c", required = false, GFloat),
      GField(4, "d", required = false, GDouble),
      GField(5, "e", required = true, GBoolean),
      GField(6, "f", required = false, GDate),
      GField(7, "g", required = false, GTimestamp),
      GField(8, "h", required = false, GDecimal(10, 2)),
      GField(9, "i", required = false, GBinary)))
    val json = SchemaJson.toJsonSchemaDraft(s, pretty = false)
    val j = org.json4s.jackson.JsonMethods.parse(json)
    import org.json4s._
    def typeOf(name: String): String =
      (j \ "properties" \ name \ "type") match { case JString(t) => t; case o => fail(s"$name: $o") }
    assert((j \ "type") == JString("object"))
    assert(typeOf("a") == "integer" && typeOf("b") == "integer")
    assert(typeOf("c") == "number" && typeOf("d") == "number")
    assert(typeOf("e") == "boolean")
    assert(Seq("f", "g", "h", "i").forall(typeOf(_) == "string"))
    // required = non-optional field names in field order (reference appends in order)
    assert((j \ "required") == JArray(List(JString("a"), JString("b"), JString("e"))))
  }

  test("JSON-Schema draft export: flat mode flattens containers to the string fallback") {
    // the reference maps str(field.field_type) of a struct/list/map
    // through .get(..., "string") — nested = false reproduces that dict
    val json = SchemaJson.toJsonSchemaDraft(nested, nested = false, pretty = false)
    val j = org.json4s.jackson.JsonMethods.parse(json)
    import org.json4s._
    assert((j \ "properties" \ "meta" \ "type") == JString("string"))
    assert((j \ "properties" \ "age" \ "type") == JString("integer"))
    assert((j \ "properties" \ "meta" \ "properties") == JNothing)
  }

  test("JSON-Schema draft export round-trips through fromJsonSchemaDraft (fixpoint)") {
    // export -> import projects types through the draft lattice
    // (long -> int, float -> double, date/ts/decimal/binary -> string);
    // a second export of the projected schema is bit-identical, i.e.
    // export . import is a fixpoint on the draft dialect
    val once = SchemaJson.toJsonSchemaDraft(nested, pretty = false)
    val imported = SchemaJson.fromJsonSchemaDraft(once)
    // names, requiredness, and nesting shape survive
    assert(imported.fields.map(_.name) == nested.fields.map(_.name))
    assert(imported.fields.map(_.required) == nested.fields.map(_.required))
    val GStruct(metaFields) = imported.fields(3).tpe: @unchecked
    assert(metaFields.map(_.name) == Seq("browser", "attempts", "tags"))
    val GMap(_, GString, _, true, GStruct(tagFields)) = metaFields(2).tpe: @unchecked
    assert(tagFields.map(_.name) == Seq("weight"))
    val twice = SchemaJson.toJsonSchemaDraft(imported, pretty = false)
    assert(twice == once)
  }
}
