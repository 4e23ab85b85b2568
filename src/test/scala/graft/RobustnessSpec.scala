package graft

import java.nio.file.Files
import graft.schema.{CatalogLoadError, GSchemaIO, SchemaParseError}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-surface and operational-pattern specs: exception parity with
  * the reference, pipeline metrics via observe(), permissive parsing
  * of corrupt source records. */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fromFile: non-json rejected, bad json wrapped in SchemaParseError with path") {
    intercept[IllegalArgumentException](GSchemaIO.fromFile("/tmp/x.yaml"))
    val bad = Files.createTempFile("graft-bad", ".json")
    Files.writeString(bad, """{"fields": "nope"}""")
    val e = intercept[SchemaParseError](GSchemaIO.fromFile(bad.toString))
    assert(e.path == bad.toString)
  }

  test("fromTable: missing table wrapped in CatalogLoadError with identifier") {
    val e = intercept[CatalogLoadError](GSchemaIO.fromTable(spark, "nope.missing_table"))
    assert(e.table == "nope.missing_table")
  }

  test("fromTable reads a registered table's schema with ids") {
    Tables.nation(spark, TestSpark.sfDir).createOrReplaceTempView("graft_nation_ft")
    val s = GSchemaIO.fromTable(spark, "graft_nation_ft")
    assert(s.fields.map(_.name) == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(s.fields.map(_.id) == Seq(1, 2, 3))
  }

  test("observe() exposes pipeline metrics without a second pass") {
    val observed = Tables.lineitem(spark, TestSpark.sfDir)
      .observe("ingest", count(lit(1)).as("rows"), sum(col("l_quantity")).as("qty"))
      .filter(col("l_quantity") > 0)
    observed.collect() // the dataset's own execution carries the metrics
    val row = observed.queryExecution.observedMetrics("ingest")
    assert(row.getAs[Long]("rows") > 0)
  }

  test("permissive json read surfaces corrupt records instead of failing") {
    val dir = Files.createTempDirectory("graft-badjson")
    Files.writeString(dir.resolve("a.json"),
      """{"id": 1, "v": "ok"}
        |not json at all
        |{"id": 2, "v": "fine"}""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING, _corrupt_record STRING")
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.count(r => !r.isNullAt(r.fieldIndex("_corrupt_record"))) == 1)
    assert(rows.count(r => !r.isNullAt(r.fieldIndex("id"))) == 2)
  }

  test("toFile/fromFile round-trips a schema") {
    val schema = graft.schema.GSchema(0, Seq(
      graft.schema.GField(1, "a", required = true, graft.schema.GLong),
      graft.schema.GField(2, "b", required = false, graft.schema.GDecimal(10, 2))), lastColumnId = 5)
    val f = Files.createTempFile("graft-schema", ".json")
    graft.schema.GSchemaIO.toFile(schema, f.toString)
    assert(graft.schema.GSchemaIO.fromFile(f.toString) == schema)
  }

  test("fromPath/toPath: Hadoop-FS loader round-trips over a file:// URI and wraps failures (reference from_s3 surface)") {
    val schema = graft.schema.GSchema(0, Seq(
      graft.schema.GField(1, "a", required = true, graft.schema.GLong),
      graft.schema.GField(2, "b", required = false, graft.schema.GString)), lastColumnId = 2)
    val dir = Files.createTempDirectory("graft-fs")
    val uri = s"file://$dir/schema.json"
    GSchemaIO.toPath(schema, uri)
    assert(GSchemaIO.fromPath(uri) == schema)
    // bare local paths resolve through the default (local) filesystem
    assert(GSchemaIO.fromPath(s"$dir/schema.json") == schema)
    // same .json-only restriction and error wrapping as fromFile
    intercept[IllegalArgumentException](GSchemaIO.fromPath("file:///tmp/x.yaml"))
    val e = intercept[SchemaParseError](
      GSchemaIO.fromPath(s"file://$dir/missing.json"))
    assert(e.path == s"file://$dir/missing.json")
  }

  test("Cli routes schemed URIs through the Hadoop-FS loader on diff and serialize") {
    val dir = Files.createTempDirectory("graft-cli-fs")
    val a = graft.schema.GSchema(0, Seq(
      graft.schema.GField(1, "a", required = true, graft.schema.GLong)), lastColumnId = 1)
    val b = graft.schema.GSchema(0, Seq(
      graft.schema.GField(1, "a", required = true, graft.schema.GLong),
      graft.schema.GField(2, "b", required = false, graft.schema.GString)), lastColumnId = 2)
    GSchemaIO.toPath(a, s"file://$dir/a.json")
    GSchemaIO.toPath(b, s"file://$dir/b.json")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.Cli.diff(List(s"file://$dir/a.json", s"file://$dir/b.json"))
    }
    assert(out.toString.contains("b"), out.toString)
    // serialize --output-path onto a file:// URI, then read it back
    val data = s"$dir/part"
    Tables.nation(spark, TestSpark.sfDir).limit(1).write.parquet(data)
    Console.withOut(new java.io.PrintStream(new java.io.ByteArrayOutputStream())) {
      graft.Cli.serialize(List("--data", data, "--output-path", s"file://$dir/n.json"))
    }
    val back = GSchemaIO.fromPath(s"file://$dir/n.json")
    assert(back.fields.map(_.name) == Seq("n_nationkey", "n_name", "n_regionkey"))
  }
}
