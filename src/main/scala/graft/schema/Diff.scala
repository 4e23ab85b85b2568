package graft.schema

/** A single field difference (reference diff.py:17 FieldChange).
  * `change` ∈ added | removed | type_changed | doc_changed | renamed | moved.
  */
final case class FieldChange(
    name: String,
    change: String,
    currentType: Option[GType] = None,
    newType: Option[GType] = None,
    doc: Option[String] = None,
    previousName: Option[String] = None,
    position: Option[String] = None,
    relativeTo: Option[String] = None,
    targetIndex: Option[Int] = None) {

  def pretty: String = change match {
    case "added"        => s"$name: ${newType.map(_.typeString).getOrElse("?")}"
    case "removed"      => name
    case "type_changed" =>
      s"$name:\n  from: ${currentType.map(_.typeString).getOrElse("?")}\n    to: ${newType.map(_.typeString).getOrElse("?")}"
    case "doc_changed"  => s"$name: doc changed"
    case "renamed"      => s"${previousName.getOrElse("?")} renamed to $name"
    case "moved"        => s"$name moved ${position.getOrElse("")} ${relativeTo.getOrElse("")}".trim
    case _              => toString
  }
}

/** Differences between two schemas (reference diff.py:63 SchemaDiff):
  * field-id-based matching with nested-struct recursion, rename /
  * type / doc detection, minimal top-level move detection, plus the
  * name-based union variant.
  */
final case class SchemaDiff(
    added: Seq[FieldChange],
    removed: Seq[FieldChange],
    changed: Seq[FieldChange],
    viaUnionByName: Boolean = false) {

  def isEmpty: Boolean = added.isEmpty && removed.isEmpty && changed.isEmpty

  override def toString: String = {
    val sections = Seq("added" -> added, "removed" -> removed, "changed" -> changed)
    sections.collect { case (sec, cs) if cs.nonEmpty =>
      (s"${sec.toUpperCase}:" +: cs.map(c => s"  - ${c.pretty}")).mkString("\n") + "\n"
    }.mkString("\n")
  }

  /** Diff → dependency-safe ordered operations: renames → type/doc
    * updates → adds → drops → moves (reference diff.py:270). */
  def toOperations: Seq[EvolutionOp] = {
    val renames = changed.collect { case fc if fc.change == "renamed" =>
      // fc.name is the full new path; the source path is that path
      // with the old leaf name, so nested renames address the field
      // where it actually lives (parents are renamed first, so the
      // parent prefix already carries new names by apply time)
      val cut = fc.name.lastIndexOf('.')
      val (prefix, newLeaf) =
        if (cut < 0) ("", fc.name) else (fc.name.substring(0, cut + 1), fc.name.substring(cut + 1))
      RenameColumn(prefix + fc.previousName.getOrElse(""), newLeaf)
    }
    val updates = changed.collect {
      case fc if fc.change == "type_changed" =>
        UpdateColumn(fc.name, fc.currentType, fc.newType, fc.doc)
      case fc if fc.change == "doc_changed" =>
        // doc-only change: carry no type, or a struct-typed field's
        // doc edit would read as an unsupported nested retype
        UpdateColumn(fc.name, None, None, fc.doc, clearDoc = fc.doc.isEmpty)
    }
    val adds = added.map(fc => AddColumn(fc.name, fc.newType.getOrElse(GString), fc.doc))
    val drops = removed.map(fc => DropColumn(fc.name))
    // position-fixing moves: reordered common fields plus positioned
    // adds, applied in target-index order so each "after" predecessor
    // is already in its final relative place
    val moves = (changed.filter(_.change == "moved") ++
        added.filter(fc => fc.position.isDefined && fc.targetIndex.isDefined))
      .sortBy(_.targetIndex.getOrElse(Int.MaxValue))
      .map(fc => MoveColumn(fc.name, fc.relativeTo.getOrElse(""), fc.position.getOrElse("after")))
    renames ++ updates ++ adds ++ drops ++ moves
  }
}

object SchemaDiff {

  /** Field-id-based diff (reference diff.py:104). */
  def byId(current: GSchema, next: GSchema): SchemaDiff = {
    val added = Seq.newBuilder[FieldChange]
    val removed = Seq.newBuilder[FieldChange]
    val changed = Seq.newBuilder[FieldChange]

    def diffFields(curFields: Seq[GField], newFields: Seq[GField], parentPath: String): Unit = {
      val curById = curFields.map(f => f.id -> f).toMap
      val newById = newFields.map(f => f.id -> f).toMap

      newFields.zipWithIndex.foreach { case (nf, idx) =>
        val path = if (parentPath.isEmpty) nf.name else s"$parentPath.${nf.name}"
        curById.get(nf.id) match {
          case None =>
            // top-level adds carry their target position so the op plan
            // can place them (the reference appends and loses the
            // position — an enhancement our round-trip property needs)
            val (pos, rel) =
              if (parentPath.nonEmpty) (None, None)
              else if (idx == 0) (Some("first"), None)
              else (Some("after"), Some(newFields(idx - 1).name))
            added += FieldChange(path, "added", newType = Some(nf.tpe), doc = nf.doc,
              position = pos, relativeTo = rel,
              targetIndex = if (parentPath.isEmpty) Some(idx) else None)
          case Some(cf) =>
            if (cf.name != nf.name)
              changed += FieldChange(path, "renamed", previousName = Some(cf.name),
                currentType = Some(cf.tpe), newType = Some(nf.tpe), doc = nf.doc)
            if (cf.doc != nf.doc)
              changed += FieldChange(path, "doc_changed",
                currentType = Some(cf.tpe), newType = Some(nf.tpe), doc = nf.doc)
            (cf.tpe, nf.tpe) match {
              // struct-vs-struct: the recursion below reports each
              // member change precisely; also emitting a parent-level
              // type_changed would double-report it as an unsupported
              // whole-struct retype and abort strict evolution
              case (GStruct(cfs), GStruct(nfs)) => diffFields(cfs, nfs, path)
              case _ =>
                if (!cf.tpe.equivalent(nf.tpe))
                  changed += FieldChange(path, "type_changed",
                    currentType = Some(cf.tpe), newType = Some(nf.tpe), doc = nf.doc)
            }
        }
      }

      // minimal moves, top level only (reference diff.py:181)
      if (parentPath.isEmpty) {
        val curOrder = curFields.map(_.id)
        val newOrder = newFields.map(_.id)
        minimalMoves(curOrder, newOrder).foreach { fid =>
          val name = newById(fid).name
          val i = newOrder.indexOf(fid)
          changed += FieldChange(name, "moved",
            position = Some(if (i > 0) "after" else "first"),
            relativeTo = if (i > 0) Some(newById(newOrder(i - 1)).name) else None,
            targetIndex = Some(i))
        }
      }

      curFields.foreach { cf =>
        if (!newById.contains(cf.id)) {
          val path = if (parentPath.isEmpty) cf.name else s"$parentPath.${cf.name}"
          removed += FieldChange(path, "removed", currentType = Some(cf.tpe), doc = cf.doc)
        }
      }
    }

    diffFields(current.fields, next.fields, "")
    SchemaDiff(added.result(), removed.result(), changed.result())
  }

  /** Ids whose position changed, computed exactly like the reference
    * (diff.py:183): common ids in original order vs sorted by new
    * position, flagged where the matching blocks of a difflib-style
    * sequence match don't cover them. */
  def minimalMoves(orig: Seq[Int], next: Seq[Int]): Seq[Int] = {
    if (orig == next) return Nil
    val nextIdx = next.zipWithIndex.toMap
    val common = orig.filter(nextIdx.contains)
    val commonSorted = common.sortBy(nextIdx)
    val blocks = SeqMatch.matchingBlocks(common, commonSorted)
    val covered = blocks.flatMap { case (i, _, n) => i until (i + n) }.toSet
    common.indices.filterNot(covered).map(common)
  }

  /** Name-based union diff: adds + type updates, never removals
    * (reference diff.py:225). */
  def unionByName(current: GSchema, next: GSchema): SchemaDiff = {
    val curByName = current.fields.map(f => f.name -> f).toMap
    val added = next.fields.filterNot(f => curByName.contains(f.name))
      .map(nf => FieldChange(nf.name, "added", newType = Some(nf.tpe)))
    val changed = next.fields.flatMap { nf =>
      curByName.get(nf.name) match {
        case Some(cf) if !cf.tpe.equivalent(nf.tpe) =>
          Some(FieldChange(nf.name, "type_changed",
            currentType = Some(cf.tpe), newType = Some(nf.tpe)))
        case _ => None
      }
    }
    SchemaDiff(added, Nil, changed, viaUnionByName = true)
  }
}

/** Minimal difflib-compatible sequence matching (matching blocks of
  * python's difflib.SequenceMatcher with no junk heuristic), used for
  * the same minimal-move detection the reference delegates to difflib.
  */
object SeqMatch {
  /** Longest matching block in a[alo,ahi) x b[blo,bhi), difflib rules:
    * longest; ties broken by smallest i, then smallest j. */
  private def longestMatch(a: IndexedSeq[Int], b: IndexedSeq[Int],
      alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
    val b2j = scala.collection.mutable.Map.empty[Int, List[Int]]
    ((bhi - 1) to blo by -1).foreach(j => b2j(b(j)) = j :: b2j.getOrElse(b(j), Nil))
    var besti = alo; var bestj = blo; var bestsize = 0
    var j2len = Map.empty[Int, Int]
    (alo until ahi).foreach { i =>
      val newj2len = scala.collection.mutable.Map.empty[Int, Int]
      b2j.getOrElse(a(i), Nil).foreach { j =>
        if (j >= blo && j < bhi) {
          val k = j2len.getOrElse(j - 1, 0) + 1
          newj2len(j) = k
          if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
        }
      }
      j2len = newj2len.toMap
    }
    (besti, bestj, bestsize)
  }

  /** All matching blocks as (i, j, size), difflib recursion order. */
  def matchingBlocks(aSeq: Seq[Int], bSeq: Seq[Int]): Seq[(Int, Int, Int)] = {
    val a = aSeq.toIndexedSeq; val b = bSeq.toIndexedSeq
    val out = Seq.newBuilder[(Int, Int, Int)]
    def recurse(alo: Int, ahi: Int, blo: Int, bhi: Int): Unit = {
      val (i, j, k) = longestMatch(a, b, alo, ahi, blo, bhi)
      if (k > 0) {
        recurse(alo, i, blo, j)
        out += ((i, j, k))
        recurse(i + k, ahi, j + k, bhi)
      }
    }
    recurse(0, a.length, 0, b.length)
    out.result()
  }
}
