package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, MinHashSignature, SimHashSignature, SqCosine, SqEncode, UniqueTrigramCount}

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

  /** A foldable int argument (e.g. the hash/bit count), evaluated at
    * registration time — these sizes shape the generated code, so they
    * must be literals, mirroring built-ins like approx_percentile. */
  private def intArg(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: size argument must be a literal")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$fn: size argument must be an int literal, got $other")
    }
  }

  private def binary(name: String, f: (Expression, Expression) => Expression,
      cls: Class[_]): FunctionDescription = (
    new FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"$name takes 2 arguments, got ${args.length}")
      f(args.head, args(1))
    })

  private def sized(name: String, f: (Expression, Int) => Expression,
      cls: Class[_]): FunctionDescription = (
    new FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"$name takes 2 arguments, got ${args.length}")
      f(args.head, intArg(args(1), name))
    })

  private def unary(name: String, f: Expression => Expression,
      cls: Class[_]): FunctionDescription = (
    new FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"$name takes 1 argument, got ${args.length}")
      f(args.head)
    })

  private def ternary(name: String,
      f: (Expression, Expression, Expression) => Expression,
      cls: Class[_]): FunctionDescription = (
    new FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (args: Seq[Expression]) => {
      require(args.length == 3, s"$name takes 3 arguments, got ${args.length}")
      f(args.head, args(1), args(2))
    })

  val functions: Seq[FunctionDescription] = Seq(
    unary("unique_trigram_count",
      (e: Expression) => UniqueTrigramCount(e), classOf[UniqueTrigramCount]),
    binary("cosine_similarity", CosineSimilarity.apply, classOf[CosineSimilarity]),
    binary("dot_product", DotProduct.apply, classOf[DotProduct]),
    sized("minhash_signature", MinHashSignature.apply, classOf[MinHashSignature]),
    sized("simhash_signature", SimHashSignature.apply, classOf[SimHashSignature]),
    binary("sq_encode", SqEncode.apply, classOf[SqEncode]),
    ternary("sq_cosine", SqCosine.apply, classOf[SqCosine]))

  /** Register on an already-running session. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}
