package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.schema._

/** CLI surface: table-sourced diff and serialize (the reference's
  * `--table-ident` catalog source, reference cli.py:156,
  * schema.py:10-47), exercised in-process against format-qualified
  * table idents. */
class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def captureOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(bos)(body)
    bos.toString("UTF-8")
  }

  private def writeSample(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("cli_tbl").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "name").write.mode("overwrite").parquet(dir)
    dir
  }

  test("diff accepts a table:<ident> source and reports the rename") {
    val dir = writeSample()
    val target = GSchema(0, Seq(
      GField(1, "id", required = false, GLong),
      GField(2, "label", required = false, GString)), lastColumnId = 2)
    val tj = Files.createTempFile("cli_target", ".json")
    Files.writeString(tj, SchemaJson.toJson(target))
    val out = captureOut {
      Cli.diff(List(s"table:parquet.`$dir`", tj.toString))
    }
    assert(out.contains("renamed"), s"unexpected diff output:\n$out")
    assert(out.contains("label"))
    // the shared session must survive the CLI call
    assert(!spark.sparkContext.isStopped)
  }

  test("serialize accepts --table and writes the schema JSON") {
    val dir = writeSample()
    val outJson = Files.createTempFile("cli_schema", ".json")
    val out = captureOut {
      Cli.serialize(List("--table", s"parquet.`$dir`", "--output-path", outJson.toString))
    }
    assert(out.contains("Schema written"))
    val back = GSchemaIO.fromFile(outJson.toString)
    assert(back.fields.map(_.name) == Seq("id", "name"))
    assert(back.fields.map(_.tpe) == Seq(GLong, GString))
    assert(!spark.sparkContext.isStopped)
  }

  test("evolve --apply executes the DDL against the live catalog table") {
    spark.conf.set("spark.sql.catalog.graftcat", "graft.catalog.GraftCatalog")
    val dir = writeSample() // columns: id LONG, name STRING
    val current = GSchemaIO.fromFile {
      val t = GSchema(0, Seq(
        GField(1, "id", required = false, GLong),
        GField(2, "name", required = false, GString)), lastColumnId = 2)
      val f = Files.createTempFile("cli_cur", ".json")
      Files.writeString(f, SchemaJson.toJson(t)); f.toString
    }
    spark.sql(CreateTableDdl(current, "graftcat.cli.users"))
    val target = GSchema(0, Seq(
      GField(1, "id", required = false, GLong),
      GField(2, "label", required = false, GString),
      GField(3, "score", required = false, GDouble)), lastColumnId = 3)
    val tj = Files.createTempFile("cli_apply_target", ".json")
    Files.writeString(tj, SchemaJson.toJson(target))
    val out = captureOut {
      Cli.evolve(List("--data", dir, "--schema-path", tj.toString,
        "--table", "graftcat.cli.users", "--apply", "--allow-breaking"))
    }
    assert(out.contains("Applied"), s"unexpected output:\n$out")
    assert(spark.table("graftcat.cli.users").schema.fieldNames.toSeq == Seq("id", "label", "score"))
  }

  test("diff --color renders the styled sections") {
    val dir = writeSample()
    val target = GSchema(0, Seq(
      GField(1, "id", required = false, GLong),
      GField(2, "name", required = false, GString),
      GField(3, "extra", required = false, GDouble)), lastColumnId = 3)
    val tj = Files.createTempFile("cli_target2", ".json")
    Files.writeString(tj, SchemaJson.toJson(target))
    val out = captureOut {
      Cli.diff(List(s"table:parquet.`$dir`", tj.toString, "--color"))
    }
    assert(out.contains("[1;32mADDED[0m"))
    assert(out.contains("extra"))
  }
}
