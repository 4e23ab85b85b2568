package graft.schema

/** Error surface mirroring the reference (reference
  * iceberg_evolve/exceptions.py): parse failures carry the offending
  * path, catalog/load failures carry the table identifier. Evolution
  * gating errors live in Evolver.scala
  * ([[UnsupportedEvolutionException]], [[BreakingChangeException]]).
  */
class SchemaParseError(message: String, val path: String)
  extends RuntimeException(message)

class CatalogLoadError(message: String, val table: String)
  extends RuntimeException(message)

object GSchemaIO {
  /** Load a schema from an Iceberg-format JSON file
    * (reference schema.py:97 from_file semantics, including the
    * .json-only restriction and error wrapping). */
  def fromFile(path: String): GSchema = {
    if (!path.toLowerCase.endsWith(".json"))
      throw new IllegalArgumentException("Currently, only JSON files are supported for schema loading.")
    try SchemaJson.fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    catch {
      case e: Exception =>
        throw new SchemaParseError(s"Failed to parse schema from $path: ${e.getMessage}", path)
    }
  }

  /** Write a schema to an Iceberg-format JSON file
    * (reference serializer to_json_file parity). */
  def toFile(schema: GSchema, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), SchemaJson.toJson(schema))

  /** Load a schema from an Iceberg-format JSON file on ANY
    * Hadoop-resolvable filesystem — the Spark-native analogue of the
    * reference's object-store loader (reference schema.py:133
    * from_s3): `file://` works everywhere, `hdfs://`/`s3a://`/...
    * wherever the filesystem jars and credentials exist. Filesystem
    * resolution needs no SparkSession — a plain Hadoop Configuration
    * picks up core-site/spark-submit settings from the classpath, so
    * file-only CLI paths stay session-free. Same .json-only
    * restriction and error wrapping as [[fromFile]]. */
  def fromPath(path: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): GSchema = {
    if (!path.toLowerCase.endsWith(".json"))
      throw new IllegalArgumentException("Currently, only JSON files are supported for schema loading.")
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val in = p.getFileSystem(conf).open(p)
      try SchemaJson.fromJson(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    } catch {
      case e: Exception =>
        throw new SchemaParseError(s"Failed to parse schema from $path: ${e.getMessage}", path)
    }
  }

  /** Write a schema to an Iceberg-format JSON file on any
    * Hadoop-resolvable filesystem ([[fromPath]]'s write twin). */
  def toPath(schema: GSchema, path: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(SchemaJson.toJson(schema)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load the schema of a live Spark table (the Spark-native analogue
    * of the reference's catalog loading, schema.py:113; works against
    * any catalog the session is wired to, incl. Iceberg). */
  def fromTable(spark: org.apache.spark.sql.SparkSession, ident: String): GSchema =
    try GSchema.fromSpark(spark.table(ident).schema)
    catch {
      case e: Exception =>
        throw new CatalogLoadError(s"Failed to load table '$ident': ${e.getMessage}", ident)
    }
}
