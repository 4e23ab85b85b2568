package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The integer-arithmetic PageRank must be EXACTLY reproducible under
  * any partitioning (the property the micro-unit/floor-div discipline
  * buys — a double-valued PR differs across shuffle merge orders),
  * and structurally sane: rank mass concentrates on high-degree
  * nodes. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def chain(edges: Seq[(Long, Long)], parts: Int) = {
    import spark.implicits._
    val und = edges ++ edges.map(e => (e._2, e._1))
    CacheScope.withScope { implicit s =>
      operators.Graph.pagerank(und.toDF("src", "dst").repartition(parts))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
  }

  test("pagerank is bit-reproducible across partitionings and favors hubs") {
    val rnd = new scala.util.Random(83)
    // a hub (node 0) plus random sparse edges
    val edges = (1L to 40L).map(v => (0L, v)) ++
      (0 until 60).map(_ => (1 + rnd.nextInt(40).toLong, 1 + rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
    val a = chain(edges, 2)
    val b = chain(edges, 13)
    assert(a == b, "integer pagerank must not depend on partitioning")
    val hubRank = a(0L)
    assert(a.values.count(_ > hubRank) == 0, "the hub must carry the top rank")
  }
}
