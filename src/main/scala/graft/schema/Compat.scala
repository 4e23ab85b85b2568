package graft.schema

/** Schema compatibility governance: can data written with `writer`'s
  * schema be read through `reader`'s schema? The standard lake /
  * CI gate (the reference's README names CI/CD schema checks as a
  * primary use case): every reader field must either exist in the
  * writer (same id) with an identical-or-widenable type, or be
  * optional; struct recursion applies. Returns every violation, not
  * just the first.
  */
object Compat {
  final case class Violation(path: String, kind: String, detail: String)

  def canRead(writer: GSchema, reader: GSchema): Seq[Violation] =
    checkStruct(GStruct(writer.fields), GStruct(reader.fields), "")

  private def checkStruct(w: GStruct, r: GStruct, prefix: String): Seq[Violation] = {
    val wById = w.fields.map(f => f.id -> f).toMap
    r.fields.flatMap { rf =>
      val path = if (prefix.isEmpty) rf.name else s"$prefix.${rf.name}"
      wById.get(rf.id) match {
        case None if rf.required =>
          Seq(Violation(path, "missing_required",
            s"reader requires '$path' but the writer never wrote it"))
        case None => Nil // optional, null-filled on read
        case Some(wf) => checkType(wf.tpe, rf.tpe, path) ++ (
          if (rf.required && !wf.required)
            Seq(Violation(path, "nullability",
              s"reader requires '$path' but writer may have written nulls"))
          else Nil)
      }
    }
  }

  private def checkType(w: GType, r: GType, path: String): Seq[Violation] = (w, r) match {
    case (a, b) if a.equivalent(b) => Nil
    case (ws: GStruct, rs: GStruct) => checkStruct(ws, rs, path)
    case (wl: GList, rl: GList) =>
      checkType(wl.element, rl.element, s"$path.element") ++ (
        if (rl.elementRequired && !wl.elementRequired)
          Seq(Violation(s"$path.element", "nullability",
            s"reader requires non-null elements in '$path' but writer may have written null elements"))
        else Nil)
    case (wm: GMap, rm: GMap) =>
      checkType(wm.key, rm.key, s"$path.key") ++ checkType(wm.value, rm.value, s"$path.value") ++ (
        if (rm.valueRequired && !wm.valueRequired)
          Seq(Violation(s"$path.value", "nullability",
            s"reader requires non-null values in '$path' but writer may have written null values"))
        else Nil)
    case (wp, rp) if Widening.isNarrowerThan(wp, rp) => Nil // widening read is safe
    case (wp, rp) =>
      Seq(Violation(path, "incompatible_type",
        s"writer ${wp.typeString} cannot be read as ${rp.typeString}"))
  }
}
