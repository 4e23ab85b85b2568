package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Operation semantics pinned to reference tests/test_migrate.py. */
class MigrateSpec extends AnyFunSuite {

  test("add column serializable dict, with and without doc") {
    assert(AddColumn("email", GString, Some("contact")).toSerializableMap ==
      Map("operation" -> "add_column", "name" -> "email", "to" -> "string", "doc" -> "contact"))
    assert(AddColumn("email", GString).toSerializableMap ==
      Map("operation" -> "add_column", "name" -> "email", "to" -> "string"))
  }

  test("drop column is always breaking") {
    val op = DropColumn("old")
    assert(op.isBreaking)
    assert(op.toSerializableMap == Map("operation" -> "drop_column", "name" -> "old"))
  }

  test("update column breaking iff narrowing") {
    assert(UpdateColumn("a", Some(GLong), Some(GInt)).isBreaking)       // narrowing
    assert(!UpdateColumn("a", Some(GInt), Some(GLong)).isBreaking)      // widening
    assert(!UpdateColumn("a", Some(GInt), Some(GDecimal(10, 0))).isBreaking)
  }

  test("update column unsupported for nested new type") {
    val nested = GStruct(Seq(GField(1, "x", required = false, GInt)))
    assert(!UpdateColumn("a", Some(GInt), Some(nested)).isSupported)
    assert(UpdateColumn("a", Some(GInt), Some(GLong)).isSupported)
  }

  test("update serializable dict has from/to strings") {
    assert(UpdateColumn("age", Some(GInt), Some(GString), Some("converted")).toSerializableMap ==
      Map("operation" -> "update_column_type", "name" -> "age",
        "from" -> "int", "to" -> "string", "doc" -> "converted"))
  }

  test("rename and move serializable dicts") {
    assert(RenameColumn("name", "full_name").toSerializableMap ==
      Map("operation" -> "rename_column", "name" -> "name", "to" -> "full_name"))
    assert(MoveColumn("address", "city", "before").toSerializableMap ==
      Map("operation" -> "move_column", "name" -> "address", "position" -> "before", "target" -> "city"))
  }

  test("union schema unsupported") {
    val op = UnionSchema("s", GStruct(Seq(GField(1, "x", required = false, GInt))))
    assert(!op.isSupported)
    assert(op.toSerializableMap("operation") == "union_schema")
  }

  test("spark DDL emission") {
    assert(AddColumn("email", GString, Some("contact")).toSql("db.users") ==
      Seq("ALTER TABLE db.users ADD COLUMN `email` STRING COMMENT 'contact'"))
    assert(AddColumn("meta.score", GDouble).toSql("t") ==
      Seq("ALTER TABLE t ADD COLUMN `meta`.`score` DOUBLE"))
    assert(DropColumn("old").toSql("t") == Seq("ALTER TABLE t DROP COLUMN `old`"))
    assert(RenameColumn("a", "b").toSql("t") == Seq("ALTER TABLE t RENAME COLUMN `a` TO `b`"))
    assert(UpdateColumn("a", Some(GInt), Some(GLong)).toSql("t") ==
      Seq("ALTER TABLE t ALTER COLUMN `a` TYPE BIGINT"))
    assert(MoveColumn("a", "", "first").toSql("t") == Seq("ALTER TABLE t ALTER COLUMN `a` FIRST"))
    assert(MoveColumn("a", "b", "after").toSql("t") == Seq("ALTER TABLE t ALTER COLUMN `a` AFTER `b`"))
  }

  test("phased ordering: renames, middle, moves") {
    val ops = Seq[EvolutionOp](
      MoveColumn("m", "x", "after"), AddColumn("a", GString),
      RenameColumn("r", "r2"), DropColumn("d"),
      UpdateColumn("u", Some(GInt), Some(GLong)))
    val phases = Evolver.phased(ops)
    assert(phases.head == RenameColumn("r", "r2"))
    assert(phases.last == MoveColumn("m", "x", "after"))
    assert(phases.slice(1, 4).toSet ==
      Set(AddColumn("a", GString), DropColumn("d"), UpdateColumn("u", Some(GInt), Some(GLong))))
  }

  test("pretty renders operation trees") {
    assert(AddColumn("email", GString).pretty == "ADD\n└── + email: string")
    assert(RenameColumn("a", "b").pretty.contains("to: b"))
    assert(UnionSchema("s", GInt).pretty.contains("unsupported"))
  }
}
