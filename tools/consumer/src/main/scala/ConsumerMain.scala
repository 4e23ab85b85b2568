import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.schema.{Evolver, GSchema}
import graft.dedup.DedupApi

/** Packaging proof: a 3rd-party program compiled ONLY against the
  * published graft jar (no source dependency) that runs one schema
  * evolution (diff → gate → DDL → data migration) and one dedup call
  * end to end. Exits nonzero on any mismatch. */
object ConsumerMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-consumer").master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // schema evolution: add a column, migrate data through conform
    val cur = GSchema.fromSpark(StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))
    val tgt = GSchema.fromSpark(StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType))))
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val res = Evolver.evolve(cur, tgt, Some(df))
    require(res.data.get.columns.toSeq == Seq("id", "name", "score"),
      s"evolved columns: ${res.data.get.columns.toSeq}")
    require(res.data.get.count() == 2L, "evolved rows")
    require(res.ddl.exists(_.contains("ADD COLUMN")), s"ddl: ${res.ddl}")

    // dedup: identical 20-token docs must pair at hamming 0
    val base = (0 until 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, "something else entirely " +
      (0 until 16).map(i => s"oth$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = DedupApi.simhashPairs(docs, "doc_id", "text").collect()
    require(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0),
      s"pairs: ${pairs.mkString(", ")}")

    println("CONSUMER_OK ddl=" + res.ddl.mkString(" | ") + " pairs=" + pairs.length)
    spark.stop()
  }
}
