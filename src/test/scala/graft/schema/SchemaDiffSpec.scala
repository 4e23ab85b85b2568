package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Diff semantics pinned to the reference's test expectations
  * (reference tests/test_diff.py). */
class SchemaDiffSpec extends AnyFunSuite {
  private def s(fields: GField*): GSchema = GSchema(0, fields)

  test("added field detected") {
    val d = SchemaDiff.byId(s(), s(GField(1, "name", required = true, GString)))
    assert(d.added.map(c => (c.name, c.change)) == Seq(("name", "added")))
  }

  test("removed field detected") {
    val d = SchemaDiff.byId(s(GField(1, "name", required = true, GString)), s())
    assert(d.removed.map(c => (c.name, c.change)) == Seq(("name", "removed")))
  }

  test("rename detected by id") {
    val d = SchemaDiff.byId(
      s(GField(1, "first_name", required = true, GString)),
      s(GField(1, "name", required = true, GString)))
    assert(d.changed.size == 1)
    assert(d.changed.head.change == "renamed")
    assert(d.changed.head.previousName.contains("first_name"))
    assert(d.changed.head.name == "name")
  }

  test("type change detected") {
    val d = SchemaDiff.byId(
      s(GField(1, "age", required = true, GInt)),
      s(GField(1, "age", required = true, GString)))
    assert(d.changed.map(_.change) == Seq("type_changed"))
  }

  test("doc change detected") {
    val d = SchemaDiff.byId(
      s(GField(1, "age", required = true, GInt, doc = Some("years"))),
      s(GField(1, "age", required = true, GInt, doc = Some("user age"))))
    assert(d.changed.map(_.change) == Seq("doc_changed"))
  }

  test("nested struct recursion with dotted path") {
    val cur = s(GField(1, "user", required = true, GStruct(Seq(
      GField(2, "name", required = true, GString)))))
    val nxt = s(GField(1, "user", required = true, GStruct(Seq(
      GField(2, "name", required = true, GString),
      GField(3, "email", required = true, GString)))))
    val d = SchemaDiff.byId(cur, nxt)
    assert(d.added.map(_.name) == Seq("user.email"))
  }

  test("swap of b,c in (a,b,c) flags only c as moved") {
    val cur = s(GField(1, "a", true, GString), GField(2, "b", true, GString), GField(3, "c", true, GString))
    val nxt = s(GField(1, "a", true, GString), GField(3, "c", true, GString), GField(2, "b", true, GString))
    val moved = SchemaDiff.byId(cur, nxt).changed.filter(_.change == "moved")
    assert(moved.map(_.name).sorted == Seq("c"))
  }

  test("identical order yields no moves") {
    val fs = Seq(GField(1, "a", true, GString), GField(2, "b", true, GString), GField(3, "c", true, GString))
    val d = SchemaDiff.byId(GSchema(0, fs), GSchema(0, fs))
    assert(d.changed.forall(_.change != "moved"))
  }

  test("two-field swap flags y as moved") {
    val cur = s(GField(1, "x", true, GString), GField(2, "y", true, GString))
    val nxt = s(GField(2, "y", true, GString), GField(1, "x", true, GString))
    val moved = SchemaDiff.byId(cur, nxt).changed.filter(_.change == "moved").map(_.name)
    assert(moved.toSet == Set("y"))
  }

  test("union_by_name: identical by name, different ids — no diff") {
    val d = SchemaDiff.unionByName(
      s(GField(1, "a", true, GString)), s(GField(2, "a", true, GString)))
    assert(d.isEmpty)
  }

  test("union_by_name: added + type_changed, never removed") {
    val cur = s(GField(1, "a", true, GString), GField(2, "b", true, GInt))
    val nxt = s(GField(10, "b", true, GLong), GField(11, "c", true, GString))
    val d = SchemaDiff.unionByName(cur, nxt)
    assert(d.added.map(_.name) == Seq("c"))
    assert(d.changed.map(c => (c.name, c.change)) == Seq(("b", "type_changed")))
    assert(d.removed.isEmpty && d.viaUnionByName)
  }

  test("toOperations: ordered renames, updates, adds, drops, moves") {
    val diff = SchemaDiff(
      added = Seq(FieldChange("new_field", "added", newType = Some(GString), doc = Some("new"))),
      removed = Seq(FieldChange("old_field", "removed", currentType = Some(GInt))),
      changed = Seq(
        FieldChange("full_name", "renamed", previousName = Some("name")),
        FieldChange("age", "type_changed", currentType = Some(GInt), newType = Some(GString), doc = Some("converted")),
        FieldChange("address", "moved", position = Some("before"), relativeTo = Some("city"))))
    val ops = diff.toOperations
    assert(ops(0) == RenameColumn("name", "full_name"))
    assert(ops.collect { case u: UpdateColumn => u.name } == Seq("age"))
    assert(ops.collect { case a: AddColumn => a.name } == Seq("new_field"))
    assert(ops.collect { case dr: DropColumn => dr.name } == Seq("old_field"))
    assert(ops.last == MoveColumn("address", "city", "before"))
  }

  test("pretty strings match reference formats") {
    assert(FieldChange("email", "added", newType = Some(GString)).pretty == "email: string")
    assert(FieldChange("email", "removed").pretty == "email")
    assert(FieldChange("age", "type_changed", currentType = Some(GInt), newType = Some(GString)).pretty
      == "age:\n  from: int\n    to: string")
    assert(FieldChange("age", "doc_changed").pretty == "age: doc changed")
    assert(FieldChange("full_name", "renamed", previousName = Some("name")).pretty == "name renamed to full_name")
    assert(FieldChange("address", "moved", position = Some("after"), relativeTo = Some("email")).pretty
      == "address moved after email")
  }

  test("str output contains section headers") {
    val d = SchemaDiff.byId(
      s(GField(1, "foo", true, GInt)),
      s(GField(1, "foo", true, GString), GField(2, "bar", true, GString)))
    assert(d.toString.contains("ADDED:") && d.toString.contains("CHANGED:"))
  }

  test("type equivalence ignores field order and docs") {
    val a = GStruct(Seq(GField(1, "x", true, GInt, Some("d1")), GField(2, "y", true, GString)))
    val b = GStruct(Seq(GField(2, "y", true, GString), GField(1, "x", true, GInt)))
    assert(a.equivalent(b))
    assert(!a.equivalent(GStruct(Seq(GField(1, "x", true, GLong), GField(2, "y", true, GString)))))
  }

  test("widening lattice matches reference") {
    assert(Widening.isNarrowerThan(GInt, GLong))
    assert(Widening.isNarrowerThan(GInt, GDecimal(10, 2)))
    assert(Widening.isNarrowerThan(GLong, GDouble))
    assert(Widening.isNarrowerThan(GFloat, GDouble))
    assert(Widening.isNarrowerThan(GDouble, GDecimal(38, 10)))
    assert(!Widening.isNarrowerThan(GLong, GInt))
    assert(!Widening.isNarrowerThan(GString, GInt))
    assert(!Widening.isNarrowerThan(GDouble, GFloat))
  }
}
