package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.schema._

/** Snapshot spec for the rich-parity styled renderer (reference
  * renderer.py): sectioned colored diff trees and the styled op plan
  * with the unsupported-ops warning footer. */
class RenderStyledSpec extends AnyFunSuite {

  private val current = GSchema(0, Seq(
    GField(1, "id", required = true, GLong),
    GField(2, "qty", required = false, GInt),
    GField(3, "old_name", required = false, GString),
    GField(4, "obsolete", required = false, GDouble),
    GField(5, "meta", required = false, GStruct(Seq(
      GField(6, "city", required = false, GString),
      GField(7, "zip", required = false, GInt))))),
    lastColumnId = 7)

  private val target = GSchema(0, Seq(
    GField(1, "id", required = true, GLong),
    GField(2, "qty", required = false, GLong),
    GField(3, "new_name", required = false, GString),
    GField(5, "meta", required = false, GStruct(Seq(
      GField(6, "city", required = false, GString),
      GField(7, "zip", required = false, GString),
      GField(8, "country", required = false, GString)))),
    GField(9, "score", required = false, GDouble)),
    lastColumnId = 9)

  private val diff = SchemaDiff.byId(current, target)

  test("styledDiff(color=false) snapshot: sections, glyphs, nested struct expansion") {
    val out = Render.styledDiff(diff, color = false)
    assert(out.contains("ADDED\n"))
    assert(out.contains("REMOVED\n"))
    assert(out.contains("CHANGED\n"))
    // section members carry their glyphs
    assert(out.contains("+ score: double"))
    assert(out.contains("- obsolete"))
    assert(out.contains("~ old_name"))
    assert(out.contains("renamed to: new_name"))
    // type change renders from/to
    assert(out.contains("from: int"))
    assert(out.contains("to: long"))
    // nested struct type change expands both sides as trees
    assert(out.contains("meta"))
    assert(out.contains("country: string"))
    // tree bars present
    assert(out.contains("└── ") && out.contains("├── "))
    // no escape codes without color
    assert(!out.contains("["))
  }

  test("styledDiff(color=true) paints headers and glyphs with ANSI codes") {
    val out = Render.styledDiff(diff, color = true)
    assert(out.contains("[1;32mADDED[0m"))
    assert(out.contains("[1;31mREMOVED[0m"))
    assert(out.contains("[1;33mCHANGED[0m"))
    assert(out.contains("[32m+ score[0m"))
    assert(out.contains("[31m- obsolete[0m"))
  }

  test("styledOps groups op kinds, colors headers, and appends the unsupported warning") {
    val ops = Seq(
      RenameColumn("old_name", "new_name"),
      AddColumn("score", GDouble),
      DropColumn("obsolete"),
      UnionSchema("whole", GStruct(Seq(GField(1, "x", required = false, GInt)))))
    val out = Render.styledOps(ops, color = false)
    assert(out.contains("RENAME"))
    assert(out.contains("ADD"))
    assert(out.contains("DROP"))
    // blank line between different op kinds
    assert(out.contains("\n\n"))
    assert(out.contains("Warning:"))
    assert(out.contains("not supported"))

    val colored = Render.styledOps(ops.take(3), color = true)
    assert(colored.contains("[1;32mADD"))
    assert(colored.contains("[1;31mDROP"))
    assert(!colored.contains("Warning:"))
  }

  test("styledDiff exact snapshot for a minimal rename-only diff") {
    val a = GSchema(0, Seq(GField(1, "a", required = false, GInt)), lastColumnId = 1)
    val b = GSchema(0, Seq(GField(1, "b", required = false, GInt)), lastColumnId = 1)
    val out = Render.styledDiff(SchemaDiff.byId(a, b), color = false)
    assert(out ==
      """CHANGED
        |└── ~ a
        |    └── renamed to: b""".stripMargin)
  }
}
