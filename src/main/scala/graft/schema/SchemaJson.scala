package graft.schema

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Iceberg-metadata-format JSON (de)serialization and JSON-Schema-draft
  * conversion (reference serializer/json_serializer.py and
  * utils.py:158 convert_json_to_iceberg_field).
  *
  * Format:
  * `{"type":"struct","schema-id":N,"fields":[{"id","name","required","type"},…]}`
  * where a type is a primitive string (incl. `"decimal(p, s)"`), a
  * struct dict, a list dict (`element-id`/`element-required`/`element`)
  * or a map dict (`key-id`/`key`/`value-id`/`value-required`/`value`).
  */
object SchemaJson {
  private val DecimalRe = """decimal\((\d+),\s*(\d+)\)""".r

  // --------------------------------------------------------- serialize
  def toJson(schema: GSchema, pretty: Boolean = true): String = {
    // last-column-id must survive serialization: a schema whose
    // highest-id column was dropped would otherwise come back with a
    // lower highwater and re-issue the dropped id on the next add —
    // the exact id-reuse hazard GSchema.lastColumnId exists to prevent
    val j = JObject(
      "type" -> JString("struct"),
      "schema-id" -> JInt(schema.schemaId),
      "last-column-id" -> JInt(schema.lastColumnId),
      "fields" -> JArray(schema.fields.map(fieldToJson).toList))
    if (pretty) JsonMethods.pretty(JsonMethods.render(j)) else JsonMethods.compact(JsonMethods.render(j))
  }

  private def fieldToJson(f: GField): JValue = JObject(
    List("id" -> JInt(f.id), "name" -> JString(f.name),
      "required" -> JBool(f.required), "type" -> typeToJson(f.tpe)) ++
      f.doc.map(d => "doc" -> JString(d): (String, JValue)).toList)

  def typeToJson(t: GType): JValue = t match {
    case GStruct(fs) => JObject(
      "type" -> JString("struct"), "fields" -> JArray(fs.map(fieldToJson).toList))
    case GList(eid, ereq, e) => JObject(
      "type" -> JString("list"), "element-id" -> JInt(eid),
      "element-required" -> JBool(ereq), "element" -> typeToJson(e))
    case GMap(kid, k, vid, vreq, v) => JObject(
      "type" -> JString("map"), "key-id" -> JInt(kid), "key" -> typeToJson(k),
      "value-id" -> JInt(vid), "value-required" -> JBool(vreq), "value" -> typeToJson(v))
    case GDecimal(p, s) => JString(s"decimal($p, $s)")
    case p: GPrimitive  => JString(p.name)
  }

  // ------------------------------------------------------- deserialize
  def fromJson(json: String): GSchema = {
    val j = JsonMethods.parse(json)
    val schemaId = (j \ "schema-id") match { case JInt(n) => n.toInt; case _ => 0 }
    val lastColumnId = (j \ "last-column-id") match { case JInt(n) => n.toInt; case _ => 0 }
    val fields = (j \ "fields") match {
      case JArray(fs) => fs.map(parseField)
      case _ => throw new IllegalArgumentException("schema JSON needs a 'fields' array")
    }
    GSchema(schemaId, fields, lastColumnId)
  }

  private def parseField(j: JValue): GField = {
    val JInt(id) = (j \ "id"): @unchecked
    val JString(name) = (j \ "name"): @unchecked
    val JBool(required) = (j \ "required"): @unchecked
    val doc = (j \ "doc") match { case JString(d) => Some(d); case _ => None }
    GField(id.toInt, name, required, parseType(j \ "type"), doc)
  }

  def parseType(j: JValue): GType = j match {
    case JString(s) => s match {
      case DecimalRe(p, sc) => GDecimal(p.toInt, sc.toInt)
      case other => primitiveByName.getOrElse(other.toLowerCase,
        throw new IllegalArgumentException(s"Unsupported primitive type: $other"))
    }
    case obj: JObject => (obj \ "type") match {
      case JString("struct") =>
        val JArray(fs) = (obj \ "fields"): @unchecked
        GStruct(fs.map(parseField))
      case JString("list") =>
        val JInt(eid) = (obj \ "element-id"): @unchecked
        val JBool(ereq) = (obj \ "element-required"): @unchecked
        GList(eid.toInt, ereq, parseType(obj \ "element"))
      case JString("map") =>
        val JInt(kid) = (obj \ "key-id"): @unchecked
        val JInt(vid) = (obj \ "value-id"): @unchecked
        val JBool(vreq) = (obj \ "value-required"): @unchecked
        GMap(kid.toInt, parseType(obj \ "key"), vid.toInt, vreq, parseType(obj \ "value"))
      case other => throw new IllegalArgumentException(s"Unsupported type structure: $other")
    }
    case other => throw new IllegalArgumentException(s"Unsupported type structure: $other")
  }

  private val primitiveByName: Map[String, GType] = Map(
    "string" -> GString, "int" -> GInt, "integer" -> GInt, "long" -> GLong,
    "float" -> GFloat, "double" -> GDouble, "boolean" -> GBoolean, "bool" -> GBoolean,
    "date" -> GDate, "time" -> GTime, "timestamp" -> GTimestamp, "binary" -> GBinary)

  // --------------------------------------- JSON-Schema draft conversion
  /** Convert a JSON-Schema draft document (`{"type":"object",
    * "properties":{…},"required":[…]}`) into a GSchema, with the same
    * id-allocation order as the reference (field id first, then
    * children, container ids after their children). */
  def fromJsonSchemaDraft(json: String): GSchema = {
    val j = JsonMethods.parse(json)
    val required: Set[String] = (j \ "required") match {
      case JArray(xs) => xs.collect { case JString(s) => s }.toSet
      case _ => Set.empty
    }
    val props = (j \ "properties") match {
      case JObject(fs) => fs
      case _ => throw new IllegalArgumentException("JSON-Schema draft needs 'properties'")
    }
    val alloc = new IdAllocator()
    GSchema(0, props.map { case (name, spec) => convertDraftField(name, spec, alloc, required) })
  }

  /** GSchema → JSON-Schema draft export — [[fromJsonSchemaDraft]]'s
    * inverse and the reference's `load_table_schema` output shape
    * (catalog.py:16: a `{"type":"object","properties":{…},
    * "required":[…]}` dict from a live table's schema, required =
    * the non-optional field names in field order).
    *
    * Primitive mapping is the reference's `iceberg_type_to_json_type`
    * (catalog.py:3): int/long → `integer`, float/double → `number`,
    * boolean → `boolean`, everything else (string, date, time,
    * timestamp, binary, decimal) → the `string` fallback.
    *
    * The reference flattens ALL container types through the same
    * string fallback (`str(field.field_type)` of a struct never hits
    * the mapping); `nested = false` reproduces that flat dict exactly.
    * The default `nested = true` recurses — struct → `object` with its
    * own scoped `required`, list → `array`/`items`, map → the
    * `"map"`-typed key/value form — emitting precisely the dialect
    * [[fromJsonSchemaDraft]] parses, so export∘import∘export is a
    * fixpoint (property-pinned in `SchemaJsonSpec`). */
  def toJsonSchemaDraft(schema: GSchema, nested: Boolean = true, pretty: Boolean = true): String = {
    val props = schema.fields.map { f =>
      f.name -> (if (nested) draftType(f.tpe)
                 else JObject("type" -> JString(draftPrimName(f.tpe))))
    }
    val j = JObject(
      "type" -> JString("object"),
      "properties" -> JObject(props.toList),
      "required" -> JArray(schema.fields.filter(_.required).map(f => JString(f.name)).toList))
    if (pretty) JsonMethods.pretty(JsonMethods.render(j)) else JsonMethods.compact(JsonMethods.render(j))
  }

  private def draftPrimName(t: GType): String = t match {
    case GInt | GLong     => "integer"
    case GFloat | GDouble => "number"
    case GBoolean         => "boolean"
    case _                => "string" // reference fallback (incl. containers when nested = false)
  }

  private def draftType(t: GType): JValue = t match {
    case GStruct(fs) => JObject(
      "type" -> JString("object"),
      "properties" -> JObject(fs.map(f => f.name -> draftType(f.tpe)).toList),
      "required" -> JArray(fs.filter(_.required).map(f => JString(f.name)).toList))
    case GList(_, _, e) => JObject(
      "type" -> JString("array"), "items" -> draftType(e))
    case GMap(_, k, _, _, v) => JObject(
      "type" -> JString("map"),
      "properties" -> JObject(List(
        "key" -> JObject("type" -> JString(draftPrimName(k))),
        "value" -> draftType(v))))
    case p => JObject("type" -> JString(draftPrimName(p)))
  }

  private def convertDraftField(name: String, spec: JValue, alloc: IdAllocator, required: Set[String]): GField = {
    val fieldId = alloc.next()
    val req = required.contains(name)
    val tpe = (spec \ "type") match {
      case JString("object") =>
        (spec \ "properties") match {
          case JObject(props) =>
            // JSON-Schema 'required' is scoped per object: a nested
            // object's members are governed by its own array, not the
            // enclosing document's
            val nestedRequired: Set[String] = (spec \ "required") match {
              case JArray(xs) => xs.collect { case JString(s) => s }.toSet
              case _ => Set.empty
            }
            GStruct(props.map { case (n, sp) => convertDraftField(n, sp, alloc, nestedRequired) })
          case _ => (spec \ "additionalProperties") match {
            case JNothing => throw new IllegalArgumentException(
              s"Object field '$name' must define either 'properties' or 'additionalProperties'.")
            case valueSpec =>
              val valueField = convertDraftField(name + "_value", valueSpec, alloc, required)
              GMap(alloc.next(), GString, alloc.next(), valueRequired = true, valueField.tpe)
          }
        }
      case JString("array") =>
        val items = (spec \ "items") match {
          case o: JObject => o
          case _ => throw new IllegalArgumentException(s"Array field '$name' must have 'items' defined.")
        }
        val elemField = convertDraftField(name + "_element", items, alloc, required)
        GList(alloc.next(), elementRequired = true, elemField.tpe)
      case JString("map") =>
        val keySpec = spec \ "properties" \ "key"
        val valSpec = spec \ "properties" \ "value"
        if (keySpec == JNothing || valSpec == JNothing)
          throw new IllegalArgumentException(s"Map field '$name' must have 'key' and 'value' under 'properties'.")
        val JString(kt) = (keySpec \ "type"): @unchecked
        val keyType = primitiveByName(kt match { case "integer" => "int"; case o => o })
        val valueField = convertDraftField(name + "_value", valSpec, alloc, required)
        GMap(alloc.next(), keyType, alloc.next(), valueRequired = true, valueField.tpe)
      case JString(prim) =>
        primitiveByName.getOrElse(if (prim == "number") "double" else prim,
          throw new IllegalArgumentException(s"Unsupported primitive type '$prim' in JSON schema."))
      case other => throw new IllegalArgumentException(s"Field '$name' has unsupported type spec: $other")
    }
    GField(fieldId, name, req, tpe)
  }
}
