package graft

import graft.schema._

/** Runnable demo mirroring the reference's `poetry run example`
  * (reference examples/evolve_test.py): build two schemas, show the
  * rendered diff, the op plan, the DDL, and a dry-run evolve — no
  * Spark session needed for the metadata path.
  *
  *   sbt "runMain graft.Example"
  */
object Example {
  def main(args: Array[String]): Unit = {
    val current = GSchema(0, Seq(
      GField(1, "id", required = true, GString),
      GField(2, "age", required = true, GInt),
      GField(3, "signup", required = false, GDate),
      GField(4, "email_address", required = false, GString),
      GField(5, "metadata", required = false, GStruct(Seq(
        GField(8, "browser", required = false, GString),
        GField(9, "location", required = false, GStruct(Seq(
          GField(11, "city", required = false, GString),
          GField(12, "country", required = false, GString)))))))))

    val target = GSchema(1, Seq(
      GField(1, "id", required = true, GString),
      GField(2, "age", required = true, GLong),                      // widened
      GField(4, "email", required = false, GString),                 // renamed
      GField(5, "metadata", required = false, GStruct(Seq(
        GField(8, "browser", required = false, GString),
        GField(9, "location", required = false, GStruct(Seq(
          GField(11, "city", required = false, GString),
          GField(12, "country", required = false, GString),
          GField(13, "zip", required = false, GString)))),           // nested add
        GField(14, "login_attempts", required = false,
          GList(15, elementRequired = true, GInt))))),               // nested add
      GField(16, "plan", required = false, GString, doc = Some("subscription tier"))),
      lastColumnId = 16)                                             // signup dropped

    println("=== Current schema ===")
    println(Render.schema(current))
    println("\n=== Target schema (iceberg JSON) ===")
    println(SchemaJson.toJson(target))

    val diff = SchemaDiff.byId(current, target)
    println("\n=== Schema Evolution Diff (styled, reference renderer parity) ===\n")
    println(Render.styledDiff(diff))

    println("\n=== Evolution Operations ===\n")
    println(Render.styledOps(diff.toOperations))

    println("\n=== DDL (db.users) ===")
    Evolver.evolve(current, target, table = "db.users",
      allowBreaking = true).ddl.foreach(println)

    println("\n=== Dry run gating demo ===")
    try Evolver.evolve(current, target) // signup drop is breaking
    catch { case e: BreakingChangeException =>
      println(s"rejected as expected: ${e.getMessage.linesIterator.next()}")
    }
    val evolved = Evolver.evolve(current, target, allowBreaking = true).schema
    println("\n=== Evolved schema ===")
    println(Render.schema(evolved))

    println("\n=== Executing the evolution against a live V2 catalog ===")
    val spark = Sessions.local("4", logLevel = "ERROR")
    try {
      spark.conf.set("spark.sql.catalog.graftcat", "graft.catalog.GraftCatalog")
      val table = "graftcat.demo.users"
      spark.sql(CreateTableDdl(current, table))
      val res = Evolver.evolve(current, target, table = table, allowBreaking = true)
      Evolver.executeDdl(spark, res.ddl)
      println(s"applied ${res.ddl.size} DDL statements; $table is now:")
      println(Render.schema(GSchemaIO.fromTable(spark, table)))
    } finally spark.stop()
  }
}
