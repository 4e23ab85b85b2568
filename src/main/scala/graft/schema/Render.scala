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
}
