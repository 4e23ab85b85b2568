package graft.schema

/** Evolution operations (reference migrate.py): rename / update /
  * add / drop / move / union-schema, each knowing whether it is
  * breaking and/or supported, how to serialize itself, how to render,
  * and how to emit Spark DDL (`ALTER TABLE` — the statement Spark's
  * Iceberg integration executes against a live table; the reference
  * applies the same semantics through PyIceberg's UpdateSchema).
  *
  * Dotted names address nested struct fields (`metadata.location.city`).
  */
sealed trait EvolutionOp {
  def name: String
  def isSupported: Boolean = true
  def isBreaking: Boolean = false
  def toSerializableMap: Map[String, String]
  def pretty: String
  /** Spark DDL statement(s) implementing this op on `table`. */
  def toSql(table: String): Seq[String]
  protected def q(path: String): String =
    path.split('.').map(p => s"`$p`").mkString(".")
}

final case class AddColumn(name: String, newType: GType, doc: Option[String] = None) extends EvolutionOp {
  def toSerializableMap: Map[String, String] =
    Map("operation" -> "add_column", "name" -> name, "to" -> newType.typeString) ++
      doc.map("doc" -> _)
  def pretty: String = s"ADD\n└── + $name: ${newType.typeString}"
  def toSql(table: String): Seq[String] = {
    val comment = doc.map(d => s" COMMENT '${d.replace("'", "''")}'").getOrElse("")
    Seq(s"ALTER TABLE $table ADD COLUMN ${q(name)} ${GSchema.toSparkType(newType).sql}$comment")
  }
}

final case class DropColumn(name: String) extends EvolutionOp {
  override def isBreaking: Boolean = true // always removes data (migrate.py:142)
  def toSerializableMap: Map[String, String] = Map("operation" -> "drop_column", "name" -> name)
  def pretty: String = s"DROP\n└── - $name"
  def toSql(table: String): Seq[String] = Seq(s"ALTER TABLE $table DROP COLUMN ${q(name)}")
}

final case class UpdateColumn(
    name: String, currentType: Option[GType], newType: Option[GType],
    doc: Option[String] = None, clearDoc: Boolean = false) extends EvolutionOp {
  /** Nested (non-primitive) retypes are unsupported (migrate.py:169). */
  override def isSupported: Boolean = newType.forall(_.isPrimitive)
  /** Breaking iff the new type is narrower (migrate.py:228). */
  override def isBreaking: Boolean = (newType, currentType) match {
    case (Some(n), Some(c)) => Widening.isNarrowerThan(n, c)
    case _ => false
  }
  def toSerializableMap: Map[String, String] =
    Map("operation" -> "update_column_type", "name" -> name,
      "from" -> currentType.map(_.typeString).getOrElse("?"),
      "to" -> newType.map(_.typeString).getOrElse("?")) ++ doc.map("doc" -> _)
  def pretty: String = {
    val from = currentType.map(t => Render.typeTree("from", t)).getOrElse("from: ?")
    val to = newType.map(t => Render.typeTree("to", t)).getOrElse("to: ?")
    s"UPDATE${if (isSupported) "" else " (unsupported)"}\n└── ~ $name:\n" +
      Render.indent(from, "    ") + "\n" + Render.indent(to, "    ")
  }
  def toSql(table: String): Seq[String] = {
    val typeSql = newType.map(t => s"ALTER TABLE $table ALTER COLUMN ${q(name)} TYPE ${GSchema.toSparkType(t).sql}").toSeq
    val docSql = doc.map(d => s"ALTER TABLE $table ALTER COLUMN ${q(name)} COMMENT '${d.replace("'", "''")}'").toSeq
    typeSql ++ docSql
  }
}

final case class RenameColumn(name: String, target: String) extends EvolutionOp {
  def toSerializableMap: Map[String, String] =
    Map("operation" -> "rename_column", "name" -> name, "to" -> target)
  def pretty: String = s"RENAME\n└── ~ $name\n    to: $target"
  def toSql(table: String): Seq[String] =
    Seq(s"ALTER TABLE $table RENAME COLUMN ${q(name)} TO `$target`")
}

final case class MoveColumn(name: String, target: String, position: String) extends EvolutionOp {
  def toSerializableMap: Map[String, String] =
    Map("operation" -> "move_column", "name" -> name, "position" -> position, "target" -> target)
  def pretty: String = s"MOVE\n└── ~ $name\n    from: $position\n    of: $target"
  def toSql(table: String): Seq[String] = position match {
    case "first"  => Seq(s"ALTER TABLE $table ALTER COLUMN ${q(name)} FIRST")
    case "after"  => Seq(s"ALTER TABLE $table ALTER COLUMN ${q(name)} AFTER ${q(target)}")
    case "before" => // Spark DDL has no BEFORE; express as AFTER of the predecessor at plan time
      Seq(s"-- move ${q(name)} before ${q(target)}: emitted as AFTER by Evolver once ordering is resolved")
    case other => throw new IllegalArgumentException(s"bad move position: $other")
  }
}

/** DDL emission for whole schemas (complement of the per-op ALTER
  * statements): the CREATE TABLE a new lake table starts from. */
object CreateTableDdl {
  def apply(schema: GSchema, table: String, using: String = "iceberg",
      partitionedBy: Seq[String] = Nil): String = {
    val cols = schema.fields.map { f =>
      val notNull = if (f.required) " NOT NULL" else ""
      val comment = f.doc.map(d => s" COMMENT '${d.replace("'", "''")}'").getOrElse("")
      s"  `${f.name}` ${GSchema.toSparkType(f.tpe).sql}$notNull$comment"
    }.mkString(",\n")
    val part = if (partitionedBy.nonEmpty)
      s"\nPARTITIONED BY (${partitionedBy.map(p => s"`$p`").mkString(", ")})" else ""
    s"CREATE TABLE $table (\n$cols\n) USING $using$part"
  }
}

/** Merge-a-whole-schema op — declared but not auto-applied, matching
  * the reference where UnionSchema.is_supported is False
  * (migrate.py:352); `SchemaDiff.unionByName` + `Evolver` cover the
  * use case through individual adds/updates. */
final case class UnionSchema(name: String, newType: GType) extends EvolutionOp {
  override def isSupported: Boolean = false
  def toSerializableMap: Map[String, String] =
    Map("operation" -> "union_schema", "with" -> newType.typeString)
  def pretty: String = s"UNION SCHEMA (unsupported)\n└── ~ $name:\n    with type: ${newType.typeString}"
  def toSql(table: String): Seq[String] = Nil
}
