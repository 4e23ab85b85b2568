package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.schema._

/** Command-line surface mirroring the reference CLI (reference
  * iceberg_evolve/cli.py: diff / evolve / serialize), Spark-native:
  *
  *   graft.Cli diff <current.json> <new.json> [--match-by id|name] [--json]
  *   graft.Cli evolve --data <path> --schema-path <new.json>
  *            [--dry-run] [--allow-breaking] [--no-strict] [--out <path>] [--table <ident>]
  *   graft.Cli serialize --data <path> --output-path <schema.json>
  *
  * `--data` is any Spark-readable parquet path (a file, directory, or
  * `s3a://` URI on a real cluster). `evolve` prints the diff, the op
  * plan and the ALTER TABLE DDL, and (without --dry-run) writes the
  * migrated data to `--out`.
  */
object Cli {
  def main(args: Array[String]): Unit = args.toList match {
    case "diff" :: rest      => diff(rest)
    case "evolve" :: rest    => evolve(rest)
    case "serialize" :: rest => serialize(rest)
    case other =>
      System.err.println(s"unknown command: ${other.headOption.getOrElse("")}\n$usage")
      sys.exit(2)
  }

  private val usage =
    """usage:
      |  diff <current> <new> [--match-by id|name] [--json] [--color]
      |       (each source is a schema .json file or table:<ident> — any
      |        table the session resolves, e.g. table:parquet.`/data/x.parquet`
      |        or a catalog table, mirroring the reference's from_iceberg source)
      |  evolve --data <path> --schema-path <new.json> [--dry-run] [--allow-breaking] [--no-strict] [--out <path>] [--table <ident>] [--apply] [--color]
      |         (--apply executes the emitted DDL against <ident> on the session's
      |          catalog — the reference's live-table apply; requires --table)
      |  serialize (--data <path> | --table <ident>) --output-path <schema.json>""".stripMargin

  private def flag(rest: List[String], name: String): Boolean = rest.contains(name)
  private def opt(rest: List[String], name: String): Option[String] =
    rest.sliding(2).collectFirst { case `name` :: v :: Nil => v }

  private def loadSchema(path: String): GSchema = GSchemaIO.fromFile(path)

  def diff(rest: List[String]): Unit = {
    // positional args: tokens that are not flags and not the value of
    // the (only) value-taking option
    val files = rest.zip("" :: rest).collect {
      case (tok, prev) if !tok.startsWith("--") && prev != "--match-by" => tok
    }
    if (files.length < 2) { System.err.println(usage); sys.exit(2) }
    def load(spark: => SparkSession)(tok: String): GSchema =
      if (tok.startsWith("table:")) GSchemaIO.fromTable(spark, tok.stripPrefix("table:"))
      else loadSchema(tok)
    val (cur, nxt) =
      if (files.take(2).exists(_.startsWith("table:")))
        withSession(spark => (load(spark)(files(0)), load(spark)(files(1))))
      else (loadSchema(files(0)), loadSchema(files(1)))
    val d = opt(rest, "--match-by") match {
      case Some("name")      => SchemaDiff.unionByName(cur, nxt)
      case Some("id") | None => SchemaDiff.byId(cur, nxt)
      case Some(other) =>
        System.err.println(s"bad --match-by: $other\n$usage"); sys.exit(2)
    }
    if (flag(rest, "--json")) {
      import org.json4s._
      val j = JArray(d.toOperations.map(op => JObject(
        op.toSerializableMap.toList.map { case (k, v) => k -> (JString(v): JValue) })).toList)
      println(jackson.JsonMethods.pretty(jackson.JsonMethods.render(j)))
    } else if (flag(rest, "--color")) {
      println(if (d.isEmpty) "Schemas are identical." else Render.styledDiff(d))
    } else {
      println(if (d.isEmpty) "Schemas are identical." else d.toString)
    }
  }

  private def session(): SparkSession = Sessions.local("8", logLevel = "ERROR", allowMasterOverride = true)

  /** Run `f` with a session, stopping it afterwards only if this call
    * created it (an in-process caller — e.g. a spec — keeps its own). */
  private def withSession[A](f: SparkSession => A): A = {
    val preexisting = SparkSession.getDefaultSession.isDefined
    val spark = session()
    try f(spark) finally if (!preexisting) spark.stop()
  }

  def evolve(rest: List[String]): Unit = {
    val data = opt(rest, "--data").getOrElse { System.err.println(usage); sys.exit(2) }
    val schemaPath = opt(rest, "--schema-path").getOrElse { System.err.println(usage); sys.exit(2) }
    withSession { spark =>
    val df = spark.read.parquet(data)
    val current = GSchema.fromSpark(df.schema)
    val target = loadSchema(schemaPath)
    // target JSON carries authoritative ids; align current ids by name
    // where the target knows the same column name (the reference's
    // name-match convenience for id-less sources)
    val targetIds = target.fields.map(f => f.name -> f.id).toMap
    // Ids now owned by name-matched fields. A current-only field whose
    // fromSpark-allocated id collides with one of them would alias a
    // different column in the by-id diff (toMap last-wins) and silently
    // vanish from the plan — re-id it above every current/target id.
    // Ids taken only by target-side fields are left alone: that overlap
    // is what lets the by-id diff report a rename.
    val taken = current.fields.flatMap(f => targetIds.get(f.name)).toSet
    var fresh = (0 +: (current.fields.map(_.id) ++ target.fields.map(_.id))).max
    val aligned = current.copy(fields = current.fields.map { f =>
      targetIds.get(f.name) match {
        case Some(id)                       => f.copy(id = id)
        case None if taken.contains(f.id)   => fresh += 1; f.copy(id = fresh)
        case None                           => f
      }
    })
    val result = Evolver.evolve(aligned, target, Some(df),
      table = opt(rest, "--table").getOrElse("t"),
      strict = !flag(rest, "--no-strict"),
      allowBreaking = flag(rest, "--allow-breaking"),
      dryRun = flag(rest, "--dry-run"))
    val styled = flag(rest, "--color")
    val d = SchemaDiff.byId(aligned, target)
    println("Schema Evolution Diff:\n")
    println(if (styled) Render.styledDiff(d) else d.toString)
    println("Evolution Operations:\n")
    println(if (styled) Render.styledOps(result.ops) else Render.ops(result.ops))
    println("\nDDL:\n" + result.ddl.mkString("\n"))
    if (flag(rest, "--apply") && !flag(rest, "--dry-run")) {
      val ident = opt(rest, "--table").getOrElse {
        System.err.println("--apply requires --table <ident>\n" + usage); sys.exit(2)
      }
      // drift guard: the DDL was derived from the --data schema; if the
      // live table no longer matches (drift, or this evolution already
      // ran), applying would corrupt it — refuse instead
      def shape(st: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
        st.fields.toSeq.map(f => (f.name, f.dataType.sql))
      if (shape(spark.table(ident).schema) != shape(df.schema)) {
        System.err.println(s"--apply refused: live table '$ident' does not match the --data schema the DDL was derived from (drift or already applied)")
        sys.exit(3)
      }
      Evolver.executeDdl(spark, result.ddl)
      println(s"\nApplied ${result.ddl.size} DDL statements to $ident")
    }
    if (flag(rest, "--dry-run")) println("\nDry Run - No Changes Applied")
    else opt(rest, "--out") match {
      case Some(out) =>
        result.data.get.write.mode("overwrite").parquet(out)
        println(s"\nMigrated data written to $out")
      case None => println("\n(no --out given: schema evolved, data not written)")
    }
    }
  }

  /** Schema source is `--data` (a parquet path) or `--table` (any
    * session-resolvable table ident — the reference's
    * `--table-ident` + catalog source, reference cli.py:156,
    * schema.py:10-47 from_iceberg). */
  def serialize(rest: List[String]): Unit = {
    val outPath = opt(rest, "--output-path").getOrElse { System.err.println(usage); sys.exit(2) }
    val source = opt(rest, "--data").map(Left(_))
      .orElse(opt(rest, "--table").map(Right(_)))
      .getOrElse { System.err.println(usage); sys.exit(2) }
    withSession { spark =>
      val schema = source match {
        case Left(path)   => GSchema.fromSpark(spark.read.parquet(path).schema)
        case Right(ident) => GSchemaIO.fromTable(spark, ident)
      }
      Files.writeString(Paths.get(outPath), SchemaJson.toJson(schema))
      println(s"Schema written to $outPath")
    }
  }
}
