package graft.schema

import org.apache.spark.sql.types._

/** Schema model: a tree of id-carrying fields over primitive /
  * struct / list / map types, mirroring the reference's data model
  * (reference iceberg_evolve/schema.py, pyiceberg NestedField) but
  * implemented natively over Spark's `StructType` — field ids travel
  * in column `Metadata`, so diffs can be taken directly from live
  * DataFrames and migrations compile to distributed `select`s.
  */
sealed trait GType {
  def isPrimitive: Boolean = this match {
    case _: GStruct | _: GList | _: GMap => false
    case _ => true
  }

  /** Iceberg-style type string with ids hidden
    * (reference utils.py:131 clean_type_str). */
  def typeString: String = this match {
    case GList(_, _, e)          => s"list<${e.typeString}>"
    case GMap(_, k, _, _, v)     => s"map<${k.typeString}, ${v.typeString}>"
    case GStruct(fs) =>
      fs.map(f => s"${f.name}: ${if (f.required) "" else "optional "}${f.tpe.typeString}")
        .mkString("struct<", ", ", ">")
    case GDecimal(p, s)          => s"decimal($p, $s)"
    case p: GPrimitive           => p.name
  }

  /** Canonical form: struct fields sorted by id, docs stripped
    * (reference utils.py:318). Container element/key/value ids are
    * normalized to 0: Spark column metadata only carries *field* ids,
    * so a schema read back from a DataFrame re-allocates container
    * ids — they must not make otherwise-identical types inequivalent
    * (which would surface as spurious unsupported type_changed diffs). */
  def canonical: GType = this match {
    case GStruct(fs) =>
      GStruct(fs.sortBy(_.id).map(f => f.copy(tpe = f.tpe.canonical, doc = None)))
    case l: GList => l.copy(elementId = 0, element = l.element.canonical)
    case m: GMap  => m.copy(keyId = 0, valueId = 0, key = m.key.canonical, value = m.value.canonical)
    case p => p
  }

  /** Structural equivalence ignoring field order and docs
    * (reference utils.py:357). */
  def equivalent(other: GType): Boolean = canonical == other.canonical
}

sealed abstract class GPrimitive(val name: String) extends GType
case object GString    extends GPrimitive("string")
case object GInt       extends GPrimitive("int")
case object GLong      extends GPrimitive("long")
case object GFloat     extends GPrimitive("float")
case object GDouble    extends GPrimitive("double")
case object GBoolean   extends GPrimitive("boolean")
case object GDate      extends GPrimitive("date")
case object GTime      extends GPrimitive("time")
case object GTimestamp extends GPrimitive("timestamp")
case object GBinary    extends GPrimitive("binary")
final case class GDecimal(precision: Int, scale: Int) extends GPrimitive("decimal")

final case class GList(elementId: Int, elementRequired: Boolean, element: GType) extends GType
final case class GMap(keyId: Int, key: GType, valueId: Int, valueRequired: Boolean, value: GType) extends GType
final case class GStruct(fields: Seq[GField]) extends GType

final case class GField(id: Int, name: String, required: Boolean, tpe: GType, doc: Option[String] = None)

/** `lastColumnId` is the id highwater mark (Iceberg's
  * `last-column-id` table-metadata field): ids of dropped columns are
  * NEVER reused, otherwise an id-based diff would misread a later
  * add as a rename+retype of the dropped column — a hazard our
  * EvolvePropertySpec round-trip property actually caught. */
final case class GSchema(schemaId: Int, fields: Seq[GField], lastColumnId: Int = 0) {
  def struct: GStruct = GStruct(fields)
  def fieldByName(name: String): Option[GField] = fields.find(_.name == name)
  /** Highest id ever assigned: the stored highwater or the max id
    * present in the tree, whichever is larger. */
  def highwaterId: Int = {
    def maxId(t: GType): Int = t match {
      case GStruct(fs) => (0 +: fs.map(f => math.max(f.id, maxId(f.tpe)))).max
      case GList(eid, _, e) => math.max(eid, maxId(e))
      case GMap(kid, k, vid, _, v) => Seq(kid, vid, maxId(k), maxId(v)).max
      case _ => 0
    }
    math.max(lastColumnId, maxId(GStruct(fields)))
  }
}

object GSchema {
  val FieldIdKey = "graft.field.id"

  /** GSchema → Spark StructType; ids ride in column metadata, docs
    * become comments. `time` has no Spark column type and is rejected. */
  def toSpark(schema: GSchema): StructType = StructType(schema.fields.map(toSparkField))

  private def toSparkField(f: GField): StructField = {
    val mb = new MetadataBuilder().putLong(FieldIdKey, f.id.toLong)
    f.doc.foreach(dc => mb.putString("comment", dc))
    StructField(f.name, toSparkType(f.tpe), nullable = !f.required, metadata = mb.build())
  }

  def toSparkType(t: GType): DataType = t match {
    case GString    => StringType
    case GInt       => IntegerType
    case GLong      => LongType
    case GFloat     => FloatType
    case GDouble    => DoubleType
    case GBoolean   => BooleanType
    case GDate      => DateType
    case GTimestamp => TimestampNTZType
    case GBinary    => BinaryType
    case GDecimal(p, s) => DecimalType(p, s)
    case GTime =>
      throw new UnsupportedOperationException("Spark has no time-of-day column type; store as long micros")
    case GList(_, req, e)       => ArrayType(toSparkType(e), containsNull = !req)
    case GMap(_, k, _, req, v)  => MapType(toSparkType(k), toSparkType(v), valueContainsNull = !req)
    case GStruct(fs)            => StructType(fs.map(toSparkField))
  }

  /** Spark StructType → GSchema. Ids are read from column metadata
    * when present, otherwise allocated depth-first in field order
    * (same discipline as the reference's IDAllocator). */
  def fromSpark(st: StructType, schemaId: Int = 0): GSchema = {
    val alloc = new IdAllocator(startAbove = existingIds(st))
    GSchema(schemaId, st.fields.toSeq.map(f => fromSparkField(f, alloc)))
  }

  private def existingIds(st: StructType): Int = {
    def ofType(t: DataType): Seq[Long] = t match {
      case s: StructType => s.fields.toSeq.flatMap { f =>
        (if (f.metadata.contains(FieldIdKey)) Seq(f.metadata.getLong(FieldIdKey)) else Nil) ++ ofType(f.dataType)
      }
      case a: ArrayType => ofType(a.elementType)
      case m: MapType   => ofType(m.keyType) ++ ofType(m.valueType)
      case _ => Nil
    }
    (0L +: ofType(st)).max.toInt
  }

  private def fromSparkField(f: StructField, alloc: IdAllocator): GField = {
    val id = if (f.metadata.contains(FieldIdKey)) f.metadata.getLong(FieldIdKey).toInt else alloc.next()
    val doc = if (f.metadata.contains("comment")) Some(f.metadata.getString("comment")) else None
    GField(id, f.name, required = !f.nullable, fromSparkType(f.dataType, alloc), doc)
  }

  def fromSparkType(t: DataType, alloc: IdAllocator = new IdAllocator()): GType = t match {
    case StringType        => GString
    case IntegerType | ShortType | ByteType => GInt
    case LongType          => GLong
    case FloatType         => GFloat
    case DoubleType        => GDouble
    case BooleanType       => GBoolean
    case DateType          => GDate
    case TimestampNTZType | TimestampType => GTimestamp
    case BinaryType        => GBinary
    case d: DecimalType    => GDecimal(d.precision, d.scale)
    case a: ArrayType      => GList(alloc.next(), !a.containsNull, fromSparkType(a.elementType, alloc))
    case m: MapType =>
      val kid = alloc.next(); val vid = alloc.next()
      GMap(kid, fromSparkType(m.keyType, alloc), vid, !m.valueContainsNull, fromSparkType(m.valueType, alloc))
    case s: StructType     => GStruct(s.fields.toSeq.map(f => fromSparkField(f, alloc)))
    case other => throw new UnsupportedOperationException(s"unsupported Spark type: $other")
  }
}

/** Monotonic field-id allocator (reference utils.py:149). */
final class IdAllocator(startAbove: Int = 0) {
  private var counter = startAbove
  def next(): Int = { counter += 1; counter }
}

/** Numeric widening lattice (reference utils.py:112):
  * int → long/float/double/decimal, long → float/double/decimal,
  * float → double/decimal, double → decimal. */
object Widening {
  /** True if `first` promotes to `second` losslessly — i.e. `first`
    * is the narrower type. */
  def isNarrowerThan(first: GType, second: GType): Boolean = (first, second) match {
    case (GInt, GLong | GFloat | GDouble | _: GDecimal)  => true
    case (GLong, GFloat | GDouble | _: GDecimal)         => true
    case (GFloat, GDouble | _: GDecimal)                 => true
    case (GDouble, _: GDecimal)                          => true
    case _ => false
  }
}
