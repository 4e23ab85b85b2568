package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Pins the behaviors fixed in the round-1 schema-engine review:
  * nested renames, no parent-level double-report for struct member
  * changes, doc-only updates, container-id canonicalization,
  * last-column-id serialization, decimal commas in type strings,
  * nested required scoping, container nullability compat. */
class ReviewFixSpec extends AnyFunSuite {
  private def s(fields: GField*): GSchema = GSchema(0, fields)

  test("nested rename compiles to a qualified-path op and applies") {
    val cur = s(GField(1, "user", true, GStruct(Seq(GField(2, "name", true, GString)))))
    val nxt = s(GField(1, "user", true, GStruct(Seq(GField(2, "full_name", true, GString)))))
    val ops = SchemaDiff.byId(cur, nxt).toOperations
    assert(ops == Seq(RenameColumn("user.name", "full_name")))
    val evolved = Evolver.applyOp(cur, ops.head)
    val GStruct(fs) = evolved.fields.head.tpe: @unchecked
    assert(fs.head.name == "full_name")
    assert(ops.head.toSql("t") == Seq("ALTER TABLE t RENAME COLUMN `user`.`name` TO `full_name`"))
  }

  test("struct member change does not double-report a parent type_changed") {
    val cur = s(GField(1, "meta", false, GStruct(Seq(GField(2, "a", false, GInt)))))
    val nxt = s(GField(1, "meta", false, GStruct(Seq(GField(2, "a", false, GLong)))))
    val d = SchemaDiff.byId(cur, nxt)
    assert(d.changed.map(c => (c.name, c.change)) == Seq(("meta.a", "type_changed")))
    // strict evolve must succeed (nested member widen is supported)
    val r = Evolver.evolve(cur, nxt)
    assert(r.schema == nxt.copy(lastColumnId = r.schema.lastColumnId))
  }

  test("doc-only change on a struct column evolves strictly, emits no TYPE ddl") {
    val cur = s(GField(1, "meta", false, GStruct(Seq(GField(2, "a", false, GInt))), doc = Some("old")))
    val nxt = s(GField(1, "meta", false, GStruct(Seq(GField(2, "a", false, GInt))), doc = Some("new")))
    val r = Evolver.evolve(cur, nxt)
    assert(r.schema.fields.head.doc.contains("new"))
    assert(!r.ddl.exists(_.contains(" TYPE ")), r.ddl.mkString("\n"))
    // clearing a doc also converges
    val cleared = s(GField(1, "meta", false, GStruct(Seq(GField(2, "a", false, GInt))), doc = None))
    val r2 = Evolver.evolve(cur, cleared)
    assert(r2.schema.fields.head.doc.isEmpty)
  }

  test("Spark round-trip schemas diff cleanly despite re-allocated container ids") {
    val fromJson = s(GField(1, "xs", false, GList(7, elementRequired = false, GInt)))
    val viaSpark = GSchema.fromSpark(GSchema.toSpark(fromJson))
    assert(SchemaDiff.byId(fromJson, viaSpark).isEmpty)
  }

  test("last-column-id survives JSON round-trip") {
    val schema = GSchema(0, Seq(GField(1, "a", true, GString)), lastColumnId = 9)
    val back = SchemaJson.fromJson(SchemaJson.toJson(schema))
    assert(back.lastColumnId == 9)
    assert(Evolver.applyOp(back, AddColumn("b", GInt)).fields.last.id == 10)
  }

  test("decimal commas do not split struct/map member lists") {
    val GStruct(fs) = TypeParser.parse("struct<a: decimal(10, 2), b: int>"): @unchecked
    assert(fs.map(_.name) == Seq("a", "b"))
    val GMap(_, GString, _, _, GDecimal(10, 2)) = TypeParser.parse("map<string, decimal(10,2)>"): @unchecked
    // typeString output re-parses (self-inverse property)
    val t = GStruct(Seq(GField(1, "p", false, GDecimal(12, 4)), GField(2, "q", false, GInt)))
    assert(TypeParser.parse(t.typeString).typeString == t.typeString)
  }

  test("nested JSON-Schema required arrays are scoped to their object") {
    val draft = """{"type":"object","properties":{
      "a": {"type":"object","properties":{"id":{"type":"string"},"v":{"type":"integer"}},"required":["id"]}
    },"required":["a"]}"""
    val sc = SchemaJson.fromJsonSchemaDraft(draft)
    assert(sc.fields.head.required)
    val GStruct(inner) = sc.fields.head.tpe: @unchecked
    assert(inner.find(_.name == "id").exists(_.required))
    assert(inner.find(_.name == "v").exists(!_.required))
  }

  test("compat flags element/value nullability tightening") {
    val w = s(GField(1, "xs", false, GList(2, elementRequired = false, GInt)))
    val r = s(GField(1, "xs", false, GList(2, elementRequired = true, GInt)))
    assert(Compat.canRead(w, r).exists(_.kind == "nullability"))
  }
}
