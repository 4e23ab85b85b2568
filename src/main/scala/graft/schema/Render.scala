package graft.schema

/** Plain-text tree rendering of types, diffs, and operation plans —
  * the console-output capability of the reference (renderer.py,
  * utils.py:261 render_type / type_to_tree) without the `rich`
  * dependency: deterministic ASCII trees suitable for logs and CI.
  */
object Render {

  def indent(s: String, pad: String): String =
    s.linesIterator.map(pad + _).mkString("\n")

  /** `label: type` as a tree; nested structs/lists/maps expand into
    * child nodes (reference utils.py:308 type_to_tree). */
  def typeTree(label: String, t: GType): String = t match {
    case s: GStruct => s"$label: struct\n" + renderType(s)
    case l: GList   => s"$label: list\n" + renderType(l)
    case m: GMap    => s"$label: ${m.typeString}\n" + renderType(m)
    case p          => s"$label: ${p.typeString}"
  }

  /** Children of a container type, one per line, └──/├── tree bars. */
  def renderType(t: GType): String = bars(children(t))

  private def children(t: GType): Seq[String] = t match {
    case GStruct(fs) => fs.map { f =>
      val req = if (f.required) " required" else ""
      f.tpe match {
        case s: GStruct => s"${f.name}: struct$req\n" + renderType(s)
        case GList(_, _, e: GStruct) => s"${f.name}: list<struct>$req\n" + renderType(e)
        case l: GList => s"${f.name}: list<${l.element.typeString}>$req"
        case m: GMap => s"${f.name}: map$req\n" + bars(Seq(
          "key\n" + renderType(GStruct(Seq(GField(0, "k", required = false, m.key)))),
          "value\n" + renderType(GStruct(Seq(GField(0, "v", required = false, m.value))))))
        case p => s"${f.name}: ${p.typeString}$req"
      }
    }
    case l: GList => Seq(l.element match {
      case s: GStruct => "list<struct>\n" + renderType(s)
      case e => s"list<${e.typeString}>"
    })
    case m: GMap => Seq(
      "key\n" + renderType(GStruct(Seq(GField(0, "k", required = false, m.key)))),
      "value\n" + renderType(GStruct(Seq(GField(0, "v", required = false, m.value)))))
    case p => Seq(p.typeString)
  }

  private def bars(items: Seq[String]): String =
    items.zipWithIndex.map { case (item, i) =>
      val last = i == items.length - 1
      val head = if (last) "└── " else "├── "
      val pad = if (last) "    " else "│   "
      val lines = item.linesIterator.toSeq
      ((head + lines.head) +: lines.tail.map(pad + _)).mkString("\n")
    }.mkString("\n")

  /** Render a schema as a field tree. */
  def schema(s: GSchema): String = renderType(s.struct)

  /** Render a diff with ADDED/REMOVED/CHANGED sections. */
  def diff(d: SchemaDiff): String = d.toString

  /** Render an operation plan. */
  def ops(ops: Seq[EvolutionOp]): String = ops.map(_.pretty).mkString("\n")

  // ------------------------------------------------- styled (rich parity)
  /** ANSI styling mirroring the reference's `rich` console output
    * (reference renderer.py:17-52 SchemaDiffRenderer /
    * renderer.py:138 EvolutionOperationsRenderer): bold colored
    * section headers, +/-/~ change glyphs, colorized from/to type
    * trees with per-leaf highlighting, and the unsupported-ops
    * warning footer. `color=false` degrades to the same text without
    * escape codes (logs / CI). */
  private val Reset = "\u001b[0m"
  private def paint(s: String, code: String, color: Boolean): String =
    if (color) s"\u001b[${code}m$s$Reset" else s

  private val SectionColor = Map("added" -> "32", "removed" -> "31", "changed" -> "33")
  private val SectionGlyph = Map("added" -> "+", "removed" -> "-", "changed" -> "~")

  def styledDiff(d: SchemaDiff, color: Boolean = true): String = {
    val sections = Seq("added" -> d.added, "removed" -> d.removed, "changed" -> d.changed)
    sections.collect { case (sec, all) if all.nonEmpty =>
      // top-level changed entries subsume their nested changes
      // (reference renderer.py:24-30)
      val cs =
        if (sec != "changed") all
        else {
          val topLevel = all.collect { case c if !c.name.contains('.') => c.name }.toSet
          all.filter(c => !c.name.contains('.') || !topLevel.contains(c.name.split('.').head))
        }
      val header = paint(sec.toUpperCase, "1;" + SectionColor(sec), color)
      header + "\n" + bars(cs.map(renderChange(sec, _, d, color)))
    }.mkString("\n\n")
  }

  private def renderChange(sec: String, c: FieldChange, d: SchemaDiff, color: Boolean): String = {
    val glyph = SectionGlyph(sec)
    val code = SectionColor(sec)
    val label = sec match {
      case "added"   => paint(s"$glyph ${c.name}", code, color) +
        s": ${c.newType.map(_.typeString).getOrElse("?")}"
      case "removed" => paint(s"$glyph ${c.name}", code, color)
      case _         => paint(s"$glyph ${c.previousName.getOrElse(c.name)}", code, color)
    }
    val children: Seq[String] = c.change match {
      case "renamed"      => Seq(s"renamed to: ${paint(c.name, "33", color)}")
      case "doc_changed"  => Seq(paint("doc changed", "33", color))
      case "moved"        =>
        Seq(s"moved ${c.position.getOrElse("")}: ${paint(c.relativeTo.getOrElse(""), "33", color)}")
      case "type_changed" =>
        Seq(sideTree("from", c.currentType, c.name, d, color),
          sideTree("to", c.newType, c.name, d, color))
      case _ => Nil
    }
    if (children.isEmpty) label else label + "\n" + bars(children)
  }

  /** `from:`/`to:` subtree of a type change; struct (and
    * list<struct>) types expand with per-leaf diff highlighting
    * (reference renderer.py:94 _walk_and_color). */
  private def sideTree(side: String, t: Option[GType], base: String,
      d: SchemaDiff, color: Boolean): String = t match {
    case Some(s: GStruct) => s"$side:\n" + bars(walkColored(s, side, base, d, color))
    case Some(GList(_, _, s: GStruct)) => s"$side:\n" + bars(walkColored(s, side, base, d, color))
    case other => s"$side: ${other.map(_.typeString).getOrElse("?")}"
  }

  private def walkColored(s: GStruct, side: String, base: String,
      d: SchemaDiff, color: Boolean): Seq[String] =
    s.fields.map { f =>
      val path = s"$base.${f.name}"
      val req = if (f.required) " required" else ""
      val style =
        if (side == "from" && d.removed.exists(c => c.name == path && c.change == "removed")) Some("31")
        else if (side == "to" && d.added.exists(c => c.name == path && c.change == "added")) Some("32")
        else if (side == "to" && d.changed.exists(c => c.name == path && c.change == "type_changed")) Some("33")
        else None
      def lbl(text: String): String = style.map(paint(text, _, color)).getOrElse(text)
      f.tpe match {
        case st: GStruct =>
          lbl(s"${f.name}: struct$req") + "\n" + bars(walkColored(st, side, path, d, color))
        case GList(_, _, st: GStruct) =>
          lbl(s"${f.name}: list<struct>$req") + "\n" + bars(walkColored(st, side, path, d, color))
        case other => lbl(s"${f.name}: ${other.typeString}$req")
      }
    }

  /** Operation plan with colored op headers, blank lines between op
    * kinds, and the unsupported warning footer (reference
    * renderer.py:138). */
  def styledOps(ops: Seq[EvolutionOp], color: Boolean = true): String = {
    def opCode(op: EvolutionOp): String = op match {
      case _: AddColumn => "32"
      case _: DropColumn => "31"
      case _ => "33"
    }
    val grouped = ops.foldLeft(Seq.empty[(Class[_], Seq[EvolutionOp])]) { (acc, op) =>
      acc.lastOption match {
        case Some((cls, group)) if cls == op.getClass => acc.init :+ (cls, group :+ op)
        case _ => acc :+ (op.getClass, Seq(op))
      }
    }
    val body = grouped.map { case (_, group) =>
      group.map { op =>
        val lines = op.pretty.linesIterator.toSeq
        (paint(lines.head, "1;" + opCode(op), color) +: lines.tail).mkString("\n")
      }.mkString("\n")
    }.mkString("\n\n")
    if (ops.forall(_.isSupported)) body
    else body + "\n\n" + paint("⚠ Warning:", "1;33", color) +
      " Some operations are not supported (yet) and will be skipped.\n" +
      "Consider adding new columns with the desired structure and migrating data manually.\n" +
      paint("Always compare the applied schema with the expected to ensure correctness.", "1;33", color)
  }
}
