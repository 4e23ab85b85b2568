package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.schema._

/** S12/S19 execution-level verification: the engine's emitted DDL is
  * *run* through Spark's analyzer against a live V2 catalog
  * ([[graft.catalog.GraftCatalog]]), and the table's schema read back
  * afterwards must re-diff to empty against the evolution target —
  * the Spark-native analogue of the reference's REST-catalog
  * integration tests (reference tests/test_integration.py,
  * migrate.py:31 apply).
  */
class DdlExecutionSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graftcat", "graft.catalog.GraftCatalog")
    s
  }

  /** Keep comments, drop the graft field-id metadata and any other
    * keys, recursively — tables created via DDL never carry ids, so
    * comparisons happen at the id-free Spark level. */
  private def strip(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map { f =>
      val mb = new MetadataBuilder()
      if (f.metadata.contains("comment")) mb.putString("comment", f.metadata.getString("comment"))
      f.copy(dataType = strip(f.dataType), metadata = mb.build())
    })
    case a: ArrayType => a.copy(elementType = strip(a.elementType))
    case m: MapType => m.copy(keyType = strip(m.keyType), valueType = strip(m.valueType))
    case other => other
  }

  private val base = GSchema(0, Seq(
    GField(1, "id", required = true, GLong),
    GField(2, "qty", required = false, GInt),
    GField(3, "old_name", required = false, GString, doc = Some("to be renamed")),
    GField(4, "obsolete", required = false, GDouble),
    GField(5, "meta", required = false, GStruct(Seq(
      GField(6, "city", required = false, GString),
      GField(7, "zip", required = false, GString)))),
    GField(8, "tags", required = false, GList(9, elementRequired = false, GString))),
    lastColumnId = 9)

  test("CREATE TABLE DDL executes and the table round-trips the schema") {
    val t = "graftcat.ns.created"
    spark.sql(CreateTableDdl(base, t))
    val back = GSchemaIO.fromTable(spark, t)
    assert(strip(GSchema.toSpark(back)) == strip(GSchema.toSpark(base)))
  }

  test("evolution DDL executes against a live catalog and re-diffs to empty") {
    val t = "graftcat.ns.evolving"
    spark.sql(CreateTableDdl(base, t))

    // rename + retype + drop + top-level add + nested rename + nested
    // add + move-before: every executable op class in one evolution
    val target = GSchema(0, Seq(
      GField(1, "id", required = true, GLong),
      GField(3, "new_name", required = false, GString, doc = Some("to be renamed")),
      GField(2, "qty", required = false, GLong),
      GField(5, "meta", required = false, GStruct(Seq(
        GField(6, "town", required = false, GString),
        GField(7, "zip", required = false, GString),
        GField(10, "country", required = false, GString)))),
      GField(8, "tags", required = false, GList(9, elementRequired = false, GString)),
      GField(11, "score", required = false, GDouble, doc = Some("quality score"))),
      lastColumnId = 11)

    val res = Evolver.evolve(base, target, table = t, allowBreaking = true)
    assert(res.ddl.nonEmpty)
    assert(!res.ddl.exists(_.trim.startsWith("--")), s"unexecutable DDL emitted:\n${res.ddl.mkString("\n")}")
    Evolver.executeDdl(spark, res.ddl)

    val actual = spark.table(t).schema
    assert(strip(actual) == strip(GSchema.toSpark(res.schema)),
      s"\nactual:   ${strip(actual).sql}\nexpected: ${strip(GSchema.toSpark(res.schema)).sql}")

    // re-diff to empty, with both sides given identical positional ids
    val rediff = SchemaDiff.byId(
      GSchema.fromSpark(StructType(strip(actual).asInstanceOf[StructType].fields)),
      GSchema.fromSpark(StructType(strip(GSchema.toSpark(res.schema)).asInstanceOf[StructType].fields)))
    assert(rediff.toOperations.isEmpty, s"re-diff not empty: ${rediff.toOperations.map(_.pretty)}")
  }

  test("RENAME TABLE moves metadata and refuses to clobber an existing table") {
    val cur = GSchema(0, Seq(GField(1, "a", required = false, GInt)), lastColumnId = 1)
    spark.sql(CreateTableDdl(cur, "graftcat.ns.rn_src"))
    spark.sql(CreateTableDdl(cur, "graftcat.ns.rn_taken"))
    spark.sql("ALTER TABLE graftcat.ns.rn_src RENAME TO ns.rn_dst")
    assert(spark.table("graftcat.ns.rn_dst").schema.fieldNames.toSeq == Seq("a"))
    intercept[Exception] {
      spark.sql(CreateTableDdl(cur, "graftcat.ns.rn_other"))
      spark.sql("ALTER TABLE graftcat.ns.rn_other RENAME TO ns.rn_taken")
    }
    // the refused rename must leave the source intact
    assert(spark.table("graftcat.ns.rn_other").schema.fieldNames.toSeq == Seq("a"))
  }

  test("executed evolution matches the metadata-level applyOp result for moves") {
    val t = "graftcat.ns.moves"
    val cur = GSchema(0, Seq(
      GField(1, "a", required = false, GInt),
      GField(2, "b", required = false, GInt),
      GField(3, "c", required = false, GInt),
      GField(4, "d", required = false, GInt)), lastColumnId = 4)
    spark.sql(CreateTableDdl(cur, t))
    // d moves before b (→ AFTER a), c moves first
    val target = cur.copy(fields = Seq(cur.fields(2), cur.fields(0), cur.fields(3), cur.fields(1)))
    val res = Evolver.evolve(cur, target, table = t)
    Evolver.executeDdl(spark, res.ddl)
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("c", "a", "d", "b"))
  }
}
