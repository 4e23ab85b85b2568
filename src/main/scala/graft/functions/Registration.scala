package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared session-scoped function registration: one weak map of
  * session → registered names (weak keys so stopped sessions are
  * never pinned in long-lived multi-session processes), with check,
  * registration, and marking all inside ONE lock — marking before
  * `createOrReplaceTempFunction` completes would let a concurrent
  * caller observe "registered" and fail analysis with an unresolved
  * routine. */
object Registration {
  private val registered =
    new java.util.WeakHashMap[SparkSession, java.util.HashSet[String]]()

  def ensure(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit =
    registered.synchronized {
      val names = registered.computeIfAbsent(spark, _ => new java.util.HashSet[String]())
      if (!names.contains(name)) {
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(name, builder, "built-in")
        names.add(name)
      }
    }
}
