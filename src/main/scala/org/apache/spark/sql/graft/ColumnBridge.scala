package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression conversions — the
  * standard pattern for Spark extension libraries that compose custom
  * Catalyst aggregates into DataFrame operations (the public `functions._`
  * surface has no constructor for a Column over a caller-built
  * AggregateExpression). Lives in an `org.apache.spark.sql` subpackage
  * solely to satisfy the access modifier; contains no Spark-internal logic. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The session's stable unique id (`private[sql]` on SparkSession) — a
    * memo key that, unlike `System.identityHashCode`, can never alias two
    * sessions (identity hashes are reusable after GC). */
  def sessionUUID(spark: org.apache.spark.sql.SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID

  /** Constructs a session over an EXISTING SparkContext with the named
    * `spark.sql.extensions` class applied — the loader semantics of
    * `builder().config("spark.sql.extensions", name).getOrCreate()`
    * (0-arg instantiate, apply to a fresh SparkSessionExtensions) without
    * the global default/active-session swap getOrCreate needs to construct
    * a fresh session, which races concurrently-running code that calls
    * getOrCreate itself. Used by the production-wiring spec; the
    * constructor is `private[sql]`, hence this bridge. */
  def sessionWithExtensions(
      sc: org.apache.spark.SparkContext,
      extensionsClassName: String,
      options: Map[String, String]): org.apache.spark.sql.SparkSession = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    Class.forName(extensionsClassName).getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit](ext)
    // the full constructor is class-private (getOrCreate is the only
    // in-tree caller); reflection on our own classpath, no module opens
    val ctor = classOf[org.apache.spark.sql.classic.SparkSession]
      .getDeclaredConstructors.find(_.getParameterCount == 6)
      .getOrElse(sys.error("classic.SparkSession 6-arg constructor not found"))
    ctor.setAccessible(true)
    ctor.newInstance(sc, None, None, ext, options, Map.empty[String, String])
      .asInstanceOf[org.apache.spark.sql.SparkSession]
  }
}
