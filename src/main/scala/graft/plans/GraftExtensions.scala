package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native codegen expressions: registers
  * `float_dot(ARRAY<FLOAT>, ARRAY<FLOAT>)` and
  * `double_dot(ARRAY<DOUBLE>, ARRAY<DOUBLE>)` so `spark.sql` users get
  * the same tight-loop expressions the Column API exposes
  * ([[FloatDotProduct.floatDot]]/[[FloatDotProduct.doubleDot]]).
  *
  * Two wiring paths:
  *  - Production: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (or `SparkSession.builder.withExtensions(new GraftExtensions)`) —
  *    the functions exist in every session of the context.
  *  - Interactive/test: [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def binary(name: String, clazz: Class[_],
      build: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"$name expects exactly 2 arguments")
        build(args(0), args(1))
      })

  private def unary(name: String, clazz: Class[_],
      build: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"$name expects exactly 1 argument")
        build(args.head)
      })

  /** The injectable function set (shared by both wiring paths). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    binary("float_dot", classOf[FloatDotProduct], FloatDotProduct(_, _)),
    binary("double_dot", classOf[DoubleDotProduct], DoubleDotProduct(_, _)),
    unary("nfc_normalize", classOf[NfcNormalize], NfcNormalize(_)))

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}
