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
