package graft.schema

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Driver-gate query for the schema engine (SURVEY.md §2.1 S13):
  * a full evolve — rename + widen + add + drop + move — applied as a
  * distributed data migration on `lineitem`, verified value-for-value
  * against a hand-written SQL projection in DuckDB.
  */
object SchemaQueries {

  val migrate = QueryDef(
    "schema_migrate",
    Some("""SELECT l_returnflag, l_orderkey, l_partkey, l_suppkey,
      CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity AS quantity,
      l_extendedprice, l_discount, l_linestatus, l_shipdate,
      CAST(NULL AS VARCHAR) AS l_flag
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
    (s, d) => {
      val df = Tables.lineitem(s, d)
      val current = GSchema.fromSpark(df.schema)
      val ops = Seq[EvolutionOp](
        RenameColumn("l_quantity", "quantity"),
        UpdateColumn("l_linenumber", Some(GInt), Some(GLong)),
        AddColumn("l_flag", GString),
        DropColumn("l_tax"),
        MoveColumn("l_returnflag", "", "first"))
      val target = ops.foldLeft(current)(Evolver.applyOp)
      // evolve() re-derives the ops from the schema diff and migrates
      val result = Evolver.evolve(current, target, Some(df),
        table = "lineitem", allowBreaking = true)
      result.data.get.orderBy(col("l_orderkey"), col("l_linenumber"))
    })

  val defs: Seq[QueryDef] = Seq(migrate)
}
