package graft.schema

import org.scalatest.funsuite.AnyFunSuite

class CompatSpec extends AnyFunSuite {
  private val writer = GSchema(0, Seq(
    GField(1, "id", required = true, GInt),
    GField(2, "name", required = false, GString),
    GField(3, "meta", required = false, GStruct(Seq(
      GField(4, "score", required = false, GInt))))))

  test("identical and widening reads are compatible") {
    assert(Compat.canRead(writer, writer).isEmpty)
    val widened = GSchema(0, Seq(
      GField(1, "id", required = true, GLong),          // int -> long read: fine
      GField(2, "name", required = false, GString),
      GField(3, "meta", required = false, GStruct(Seq(
        GField(4, "score", required = false, GDouble)))))) // int -> double
    assert(Compat.canRead(writer, widened).isEmpty)
  }

  test("optional new reader field is fine; required one is flagged") {
    val okReader = GSchema(0, writer.fields :+ GField(9, "extra", required = false, GString))
    assert(Compat.canRead(writer, okReader).isEmpty)
    val badReader = GSchema(0, writer.fields :+ GField(9, "extra", required = true, GString))
    val v = Compat.canRead(writer, badReader)
    assert(v.map(x => (x.path, x.kind)) == Seq(("extra", "missing_required")))
  }

  test("narrowing and nullability violations carry nested paths") {
    val narrow = GSchema(0, Seq(
      GField(1, "id", required = true, GInt),
      GField(2, "name", required = true, GString),      // writer optional
      GField(3, "meta", required = false, GStruct(Seq(
        GField(4, "score", required = false, GString)))))) // int -> string: incompatible
    val v = Compat.canRead(writer, narrow)
    assert(v.exists(x => x.path == "name" && x.kind == "nullability"))
    assert(v.exists(x => x.path == "meta.score" && x.kind == "incompatible_type"))
  }

  test("CREATE TABLE DDL emission parses in Spark") {
    val ddl = CreateTableDdl(writer, "db.users", partitionedBy = Seq("id"))
    assert(ddl.contains("`id` INT NOT NULL"))
    assert(ddl.contains("USING iceberg"))
    assert(ddl.contains("PARTITIONED BY (`id`)"))
    graft.TestSpark.spark.sessionState.sqlParser.parsePlan(ddl) // throws if invalid
  }
}
