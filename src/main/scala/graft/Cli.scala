package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.schema._

/** Typed CLI failure: carries the process exit code. Thrown by the
  * command methods (which in-process callers — CliSpec's pattern —
  * invoke directly, so they must stay exception-safe: `System.exit`
  * would kill the host JVM and skip `finally`-based session cleanup);
  * translated to an exit code only in [[Cli.main]]. */
final case class CliError(code: Int, msg: String) extends RuntimeException(msg)

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
  *
  * Catalog plumbing (the reference's `--catalog-url`/`-c` + config
  * dict, reference cli.py:70,158,183, schema.py:114): `--catalog
  * <name>` registers a named V2 catalog on the session before any
  * table resolution — implementation class from `--catalog-impl`
  * (default [[graft.catalog.GraftCatalog]]; an Iceberg deployment
  * passes `org.apache.iceberg.spark.SparkCatalog`), per-catalog
  * options from repeated `--catalog-conf k=v` flags, applied as
  * `spark.sql.catalog.<name>.k = v` session conf. `table:<name>.<ns>.
  * <tbl>` sources then resolve through it.
  */
object Cli {
  def main(args: Array[String]): Unit =
    try args.toList match {
      case "diff" :: rest      => diff(rest)
      case "evolve" :: rest    => evolve(rest)
      case "serialize" :: rest => serialize(rest)
      case other =>
        throw CliError(2, s"unknown command: ${other.headOption.getOrElse("")}\n$usage")
    } catch {
      case CliError(code, msg) =>
        System.err.println(msg)
        sys.exit(code)
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
      |  serialize (--data <path> | --table <ident>) --output-path <schema.json> [--json-schema [--flat]]
      |
      |catalog options (all commands; the reference's --catalog-url + config):
      |  --catalog <name>         register catalog <name> on the session before resolution
      |  --catalog-impl <class>   V2 TableCatalog class (default graft.catalog.GraftCatalog)
      |  --catalog-conf k=v       per-catalog option, repeatable -> spark.sql.catalog.<name>.k""".stripMargin

  private def flag(rest: List[String], name: String): Boolean = rest.contains(name)
  private def opt(rest: List[String], name: String): Option[String] =
    rest.sliding(2).collectFirst { case `name` :: v :: Nil => v }
  private def optAll(rest: List[String], name: String): List[String] =
    rest.sliding(2).collect { case `name` :: v :: Nil => v }.toList

  private def required(rest: List[String], name: String): String =
    opt(rest, name).getOrElse(throw CliError(2, s"missing $name\n$usage"))

  /** Schemed URIs (`file://`, `hdfs://`, `s3a://`, ...) load through
    * the Hadoop-FS loader (the reference's from_s3 surface,
    * schema.py:133); bare paths stay on the local-file fast path —
    * neither opens a Spark session. */
  private def loadSchema(path: String): GSchema =
    if (path.contains("://")) GSchemaIO.fromPath(path)
    else GSchemaIO.fromFile(path)

  /** Validate `--catalog-conf` syntax eagerly — every command path
    * (including file-only diffs that never open a session) must reject
    * a malformed flag instead of silently dropping it. */
  private def catalogConfPairs(rest: List[String]): List[(String, String)] =
    optAll(rest, "--catalog-conf").map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => (k, v)
        case _ => throw CliError(2, s"bad --catalog-conf (expected k=v): $kv\n$usage")
      }
    }

  /** Apply `--catalog` / `--catalog-impl` / `--catalog-conf` to the
    * session. Catalogs instantiate lazily on first resolution, so
    * setting conf here (before any `table:` load) is sufficient. */
  private def applyCatalogConf(spark: SparkSession, rest: List[String]): Unit =
    opt(rest, "--catalog").foreach { name =>
      val impl = opt(rest, "--catalog-impl").getOrElse("graft.catalog.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$name", impl)
      catalogConfPairs(rest).foreach { case (k, v) =>
        spark.conf.set(s"spark.sql.catalog.$name.$k", v)
      }
    }

  def diff(rest: List[String]): Unit = {
    catalogConfPairs(rest) // syntax-check even on the file-only path
    // positional args: tokens that are not flags and not the value of
    // a value-taking option
    val valueOpts = Set("--match-by", "--catalog", "--catalog-impl", "--catalog-conf")
    val files = rest.zip("" :: rest).collect {
      case (tok, prev) if !tok.startsWith("--") && !valueOpts.contains(prev) => tok
    }
    if (files.length < 2) throw CliError(2, usage)
    def load(spark: => SparkSession)(tok: String): GSchema =
      if (tok.startsWith("table:")) GSchemaIO.fromTable(spark, tok.stripPrefix("table:"))
      else loadSchema(tok)
    val (cur, nxt) =
      if (files.take(2).exists(_.startsWith("table:")))
        withSession { spark =>
          applyCatalogConf(spark, rest)
          (load(spark)(files(0)), load(spark)(files(1)))
        }
      else (loadSchema(files(0)), loadSchema(files(1)))
    val d = opt(rest, "--match-by") match {
      case Some("name")      => SchemaDiff.unionByName(cur, nxt)
      case Some("id") | None => SchemaDiff.byId(cur, nxt)
      case Some(other)       => throw CliError(2, s"bad --match-by: $other\n$usage")
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
    catalogConfPairs(rest) // fail fast before any session/data work
    val data = required(rest, "--data")
    val schemaPath = required(rest, "--schema-path")
    withSession { spark =>
    applyCatalogConf(spark, rest)
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
      val ident = opt(rest, "--table").getOrElse(
        throw CliError(2, "--apply requires --table <ident>\n" + usage))
      // drift guard: the DDL was derived from the --data schema; if the
      // live table no longer matches (drift, or this evolution already
      // ran), applying would corrupt it — refuse instead
      def shape(st: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
        st.fields.toSeq.map(f => (f.name, f.dataType.sql))
      if (shape(spark.table(ident).schema) != shape(df.schema))
        throw CliError(3, s"--apply refused: live table '$ident' does not match the --data schema the DDL was derived from (drift or already applied)")
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
    catalogConfPairs(rest) // fail fast before any session/data work
    val outPath = required(rest, "--output-path")
    val source = opt(rest, "--data").map(Left(_))
      .orElse(opt(rest, "--table").map(Right(_)))
      .getOrElse(throw CliError(2, usage))
    withSession { spark =>
      applyCatalogConf(spark, rest)
      val schema = source match {
        case Left(path)   => GSchema.fromSpark(spark.read.parquet(path).schema)
        case Right(ident) => GSchemaIO.fromTable(spark, ident)
      }
      // --json-schema: the reference's load_table_schema output shape
      // ({type, properties, required}, catalog.py:16) instead of the
      // Iceberg-metadata format; --flat reproduces its exact
      // container-flattening fallback
      val body =
        if (flag(rest, "--json-schema"))
          SchemaJson.toJsonSchemaDraft(schema, nested = !flag(rest, "--flat"))
        else SchemaJson.toJson(schema)
      if (outPath.contains("://")) {
        val p = new org.apache.hadoop.fs.Path(outPath)
        val out = p.getFileSystem(spark.sessionState.newHadoopConf()).create(p, true)
        try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      } else Files.writeString(Paths.get(outPath), body)
      println(s"Schema written to $outPath")
    }
  }
}
