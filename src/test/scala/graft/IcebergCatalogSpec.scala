package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.schema._

/** The Iceberg-runtime variant of [[DdlExecutionSpec]] (reference
  * tests/test_integration.py: evolution applied through a live Iceberg
  * catalog). This offline environment cannot resolve the
  * `iceberg-spark-runtime` jar, so the whole suite is guarded on the
  * jar's presence: with no jar every test cancels (reported as
  * canceled, not failed); the day a jar lands on the classpath the
  * integration is exactly one session conf
  * (`spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog`,
  * see GraftCatalog.scala:22-26) and these tests go live unchanged —
  * the engine's emitted DDL is catalog-agnostic by construction.
  */
class IcebergCatalogSpec extends AnyFunSuite {

  private def icebergPresent: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: ClassNotFoundException | _: NoClassDefFoundError => false }

  private lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-iceberg-wh").toString
    s.conf.set("spark.sql.catalog.icecat", "org.apache.iceberg.spark.SparkCatalog")
    s.conf.set("spark.sql.catalog.icecat.type", "hadoop")
    s.conf.set("spark.sql.catalog.icecat.warehouse", wh)
    s
  }

  private val base = GSchema(0, Seq(
    GField(1, "id", required = true, GLong),
    GField(2, "qty", required = false, GInt),
    GField(3, "old_name", required = false, GString, doc = Some("to be renamed")),
    GField(4, "meta", required = false, GStruct(Seq(
      GField(5, "city", required = false, GString),
      GField(6, "zip", required = false, GString))))),
    lastColumnId = 6)

  private def strip(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map { f =>
      val mb = new MetadataBuilder()
      if (f.metadata.contains("comment")) mb.putString("comment", f.metadata.getString("comment"))
      f.copy(dataType = strip(f.dataType), metadata = mb.build(), nullable = true)
    })
    case a: ArrayType => a.copy(elementType = strip(a.elementType))
    case m: MapType => m.copy(keyType = strip(m.keyType), valueType = strip(m.valueType))
    case other => other
  }

  test("CREATE TABLE DDL executes against a live Iceberg catalog") {
    assume(icebergPresent, "iceberg-spark-runtime jar not on classpath (offline sandbox)")
    spark.sql(CreateTableDdl(base, "icecat.ns.created"))
    val back = spark.table("icecat.ns.created").schema
    assert(back.fieldNames.toSeq == Seq("id", "qty", "old_name", "meta"))
  }

  test("evolution DDL executes against a live Iceberg catalog and re-diffs to empty") {
    assume(icebergPresent, "iceberg-spark-runtime jar not on classpath (offline sandbox)")
    val t = "icecat.ns.evolving"
    spark.sql(CreateTableDdl(base, t))

    val target = GSchema(0, Seq(
      GField(1, "id", required = true, GLong),
      GField(3, "new_name", required = false, GString, doc = Some("to be renamed")),
      GField(2, "qty", required = false, GLong),
      GField(4, "meta", required = false, GStruct(Seq(
        GField(5, "town", required = false, GString),
        GField(6, "zip", required = false, GString),
        GField(7, "country", required = false, GString)))),
      GField(8, "score", required = false, GDouble, doc = Some("quality score"))),
      lastColumnId = 8)

    val res = Evolver.evolve(base, target, table = t, allowBreaking = true)
    assert(res.ddl.nonEmpty)
    Evolver.executeDdl(spark, res.ddl)

    val actual = spark.table(t).schema
    assert(strip(actual) == strip(GSchema.toSpark(res.schema)),
      s"\nactual:   ${strip(actual).sql}\nexpected: ${strip(GSchema.toSpark(res.schema)).sql}")
  }
}
