package graft.schema

/** SQL-style type-string parser (reference utils.py:43,62,109):
  * primitives, `decimal(p, s)`, `array<…>`/`list<…>`, `map<k, v>`,
  * `struct<name: type, …>`, splitting only at top level of `<>`.
  * Container/element ids are assigned from the allocator, struct
  * members are optional — matching the reference exactly.
  */
object TypeParser {
  private val primitives: Map[String, GType] = Map(
    "string" -> GString, "int" -> GInt, "integer" -> GInt, "long" -> GLong,
    "float" -> GFloat, "double" -> GDouble, "boolean" -> GBoolean,
    "bool" -> GBoolean, "date" -> GDate, "time" -> GTime,
    "timestamp" -> GTimestamp, "binary" -> GBinary)

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  /** Split on `sep` only at bracket depth 0 (reference utils.py:43).
    * Parentheses count toward depth too, so the comma inside
    * `decimal(10, 2)` never splits a struct/map member list. */
  def splitTopLevel(s: String, sep: Char = ','): Seq[String] = {
    val parts = Seq.newBuilder[String]
    val buf = new StringBuilder
    var depth = 0
    s.foreach { ch =>
      if (ch == '<' || ch == '(') depth += 1
      else if (ch == '>' || ch == ')') depth -= 1
      if (ch == sep && depth == 0) { parts += buf.toString; buf.clear() }
      else buf += ch
    }
    if (buf.nonEmpty) parts += buf.toString
    parts.result()
  }

  def parse(typeStr: String): GType = parse(typeStr, new IdAllocator())

  def parse(typeStr: String, alloc: IdAllocator): GType = {
    val s = typeStr.trim
    val ls = s.toLowerCase

    DecimalRe.findPrefixMatchOf(ls) match {
      case Some(m) if m.matched == ls => return GDecimal(m.group(1).toInt, m.group(2).toInt)
      case _ =>
    }
    def inner(prefix: String): String = s.substring(prefix.length, s.length - 1)

    if ((ls.startsWith("array<") || ls.startsWith("list<")) && ls.endsWith(">")) {
      val pre = if (ls.startsWith("array<")) "array<" else "list<"
      val elem = parse(inner(pre), alloc)
      GList(alloc.next(), elementRequired = false, elem)
    } else if (ls.startsWith("map<") && ls.endsWith(">")) {
      val Seq(kStr, vStr) = splitTopLevel(inner("map<")).map(_.trim): @unchecked
      val k = parse(kStr, alloc)
      val v = parse(vStr, alloc)
      GMap(alloc.next(), k, alloc.next(), valueRequired = false, v)
    } else if (ls.startsWith("struct<") && ls.endsWith(">")) {
      val fields = splitTopLevel(inner("struct<")).map { spec =>
        val i = spec.indexOf(':')
        require(i > 0, s"struct field spec needs 'name: type': $spec")
        val name = spec.substring(0, i).trim
        val (req, tStr) = {
          val raw = spec.substring(i + 1).trim
          if (raw.toLowerCase.startsWith("optional ")) (false, raw.substring("optional ".length))
          else (false, raw) // struct members are optional in the reference parser
        }
        GField(alloc.next(), name, required = req, parse(tStr, alloc))
      }
      GStruct(fields)
    } else primitives.getOrElse(ls,
      throw new IllegalArgumentException(s"Unsupported type string '$typeStr'"))
  }
}
