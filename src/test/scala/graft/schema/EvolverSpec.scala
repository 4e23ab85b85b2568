package graft.schema

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class EvolverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cur = GSchema(0, Seq(
    GField(1, "id", required = true, GLong),
    GField(2, "name", required = false, GString),
    GField(3, "score", required = false, GInt),
    GField(4, "meta", required = false, GStruct(Seq(
      GField(5, "city", required = false, GString),
      GField(6, "zip", required = false, GString))))))

  test("applyOp: rename, update, add, drop, move — flat and nested") {
    var s = Evolver.applyOp(cur, RenameColumn("name", "full_name"))
    assert(s.fields(1).name == "full_name" && s.fields(1).id == 2)
    s = Evolver.applyOp(s, UpdateColumn("score", Some(GInt), Some(GLong)))
    assert(s.fields(2).tpe == GLong)
    s = Evolver.applyOp(s, AddColumn("meta.country", GString))
    val GStruct(metaFs) = s.fields(3).tpe: @unchecked
    assert(metaFs.map(_.name) == Seq("city", "zip", "country"))
    assert(metaFs.last.id == 7) // max id + 1
    s = Evolver.applyOp(s, DropColumn("meta.zip"))
    val GStruct(metaFs2) = s.fields(3).tpe: @unchecked
    assert(metaFs2.map(_.name) == Seq("city", "country"))
    s = Evolver.applyOp(s, MoveColumn("meta", "id", "after"))
    assert(s.fields.map(_.name) == Seq("id", "meta", "full_name", "score"))
    s = Evolver.applyOp(s, MoveColumn("score", "", "first"))
    assert(s.fields.head.name == "score")
  }

  test("evolve: strict rejects unsupported, gate rejects breaking") {
    val nestedTarget = Evolver.applyOp(cur,
      UpdateColumn("name", Some(GString), Some(GStruct(Seq(GField(99, "x", required = false, GInt))))))
    intercept[UnsupportedEvolutionException] {
      Evolver.evolve(cur, nestedTarget)
    }
    val dropped = Evolver.applyOp(cur, DropColumn("name"))
    intercept[BreakingChangeException] {
      Evolver.evolve(cur, dropped)
    }
    // allowed when allowBreaking
    val r = Evolver.evolve(cur, dropped, allowBreaking = true)
    assert(r.schema.fields.map(_.name) == Seq("id", "score", "meta"))
  }

  test("evolve dryRun returns plan without applying") {
    val target = Evolver.applyOp(cur, AddColumn("flag", GBoolean))
    val r = Evolver.evolve(cur, target, dryRun = true)
    assert(r.schema == cur)
    assert(r.ops.exists { case AddColumn("flag", GBoolean, _) => true; case _ => false })
    assert(r.ddl.exists(_.contains("ADD COLUMN `flag` BOOLEAN")))
  }

  test("conform migrates data: rename, widen, null-fill, drop, nested rebuild") {
    import scala.jdk.CollectionConverters._
    val sparkSchema = GSchema.toSpark(cur)
    val rows = Seq(
      Row(1L, "alice", 10, Row("berlin", "10115")),
      Row(2L, "bob", null, null)).asJava
    val df = spark.createDataFrame(rows, sparkSchema)

    val ops = Seq[EvolutionOp](
      RenameColumn("name", "full_name"),
      UpdateColumn("score", Some(GInt), Some(GLong)),
      AddColumn("meta.country", GString),
      DropColumn("meta.zip"),
      MoveColumn("full_name", "", "first"))
    val target = ops.foldLeft(cur)(Evolver.applyOp)
    val out = Evolver.conform(df, cur, target)

    assert(out.schema.fieldNames.toSeq == Seq("full_name", "id", "score", "meta"))
    assert(out.schema("score").dataType == LongType)
    val collected = out.orderBy("id").collect()
    assert(collected(0).getString(0) == "alice")
    assert(collected(0).getLong(2) == 10L)
    val meta0 = collected(0).getStruct(3)
    assert(meta0.schema.fieldNames.toSeq == Seq("city", "country"))
    assert(meta0.getString(0) == "berlin" && meta0.isNullAt(1))
    assert(collected(1).isNullAt(2))      // null int survives widen
    assert(collected(1).isNullAt(3))      // null struct stays null, not struct-of-nulls
  }

  test("evolve round-trips ops through diff and migrates") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row(1L, "x", 5, Row("a", "b"))).asJava, GSchema.toSpark(cur))
    val target = Seq[EvolutionOp](
      RenameColumn("score", "points"),
      UpdateColumn("id", Some(GLong), Some(GDouble))  // long -> double widening? (long→double allowed)
    ).foldLeft(cur)(Evolver.applyOp)
    val r = Evolver.evolve(cur, target, Some(df))
    assert(r.ops.contains(RenameColumn("score", "points")))
    val row = r.data.get.collect()(0)
    assert(r.data.get.schema("id").dataType == DoubleType)
    assert(row.getAs[Double]("id") == 1.0)
    assert(row.getAs[Int]("points") == 5)
  }

  test("conform recurses through arrays of structs and map values") {
    import scala.jdk.CollectionConverters._
    val cur2 = GSchema(0, Seq(
      GField(1, "id", required = true, GLong),
      GField(2, "items", required = false, GList(3, elementRequired = false, GStruct(Seq(
        GField(4, "sku", required = false, GString),
        GField(5, "qty", required = false, GInt))))),
      GField(6, "attrs", required = false, GMap(7, GString, 8, valueRequired = false, GStruct(Seq(
        GField(9, "score", required = false, GInt)))))))
    val rows = Seq(Row(1L,
      Seq(Row("a", 2), Row("b", 3)),
      Map("x" -> Row(7)))).asJava
    val df = spark.createDataFrame(rows, GSchema.toSpark(cur2))

    // evolve inside the containers: rename sku→code, widen qty→long,
    // add discount to elements; widen map value score→long
    val target = GSchema(0, Seq(
      GField(1, "id", required = true, GLong),
      GField(2, "items", required = false, GList(3, elementRequired = false, GStruct(Seq(
        GField(4, "code", required = false, GString),
        GField(5, "qty", required = false, GLong),
        GField(10, "discount", required = false, GDouble))))),
      GField(6, "attrs", required = false, GMap(7, GString, 8, valueRequired = false, GStruct(Seq(
        GField(9, "score", required = false, GLong)))))))
    val out = Evolver.conform(df, cur2, target)
    val r = out.collect()(0)
    val items = r.getSeq[Row](1)
    assert(items.map(_.schema.fieldNames.toSeq).distinct == Seq(Seq("code", "qty", "discount")))
    assert(items.map(i => (i.getString(0), i.getLong(1), i.isNullAt(2))) ==
      Seq(("a", 2L, true), ("b", 3L, true)))
    val attrs = r.getMap[String, Row](2)
    assert(attrs("x").getLong(0) == 7L)
  }

  test("rendering: schema tree and ops") {
    val tree = Render.schema(cur)
    assert(tree.contains("meta: struct"))
    assert(tree.contains("└──") || tree.contains("├──"))
    val opsText = Render.ops(Seq(AddColumn("x", GInt), DropColumn("y")))
    assert(opsText.contains("ADD") && opsText.contains("DROP"))
  }
}
