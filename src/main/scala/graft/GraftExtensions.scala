package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Registration of the engine's native expressions for SQL use.
  *
  * Two entry points (same registrations):
  *  - at session build: `.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.GraftExtensions`
  *  - on a live session: `GraftExtensions.install(spark)` (builder
  *    extensions are ignored by `getOrCreate` when a session exists)
  *
  * {{{
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq((
    new FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"cosine_similarity takes 2 arguments, got ${args.length}")
      CosineSimilarity(args.head, args(1))
    }))

  /** Register on an already-running session. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}
