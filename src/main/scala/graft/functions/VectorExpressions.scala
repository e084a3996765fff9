package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns, accumulated
  * sequentially in double — numerically identical to the
  * aggregate(zip_with(...)) fold used elsewhere (and to the DuckDB
  * oracle's list_sum fold), but a real Catalyst expression with
  * codegen: Spark's higher-order functions are CodegenFallback and
  * interpret one lambda call per element, which is the entire inner
  * loop of brute-force similarity search. This is preference order
  * (b) from the build brief: a custom Expression where built-ins
  * can't express the semantics *efficiently*.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh names: two vec_dot calls in one projection would otherwise
    // redeclare the same locals and Janino rejects the whole generated
    // class — silently demoting the projection to interpreter mode
    val n = ctx.freshName("vdN")
    val s = ctx.freshName("vdS")
    val i = ctx.freshName("vdI")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column API. `register` is idempotent and is called
  * by every query that uses the function, so plain sessions (Verify,
  * Bench, the driver's smoke check) work without special setup;
  * [[graft.plans.GraftExtensions]] does the same through the
  * SparkSessionExtensions path for library users.
  */
object VectorFunctions {

  val dotInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProductFloat].getName, "vec_dot"),
    (exprs: Seq[Expression]) => DotProductFloat(exprs.head, exprs(1)))

  def register(spark: SparkSession): Unit = {
    // register only when absent: every query that uses the function
    // calls this, and an unconditional createOrReplace emits one
    // "replaced a previously registered function" WARN per query build
    // — dozens per bench sweep, drowning any registry WARN that
    // actually matters. A rare concurrent double-register is harmless
    // (same definition, one redundant WARN); VectorExpressionsSpec
    // covers the two-instances-in-one-projection codegen path.
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("vec_dot")))
      reg.createOrReplaceTempFunction(
        "vec_dot", exprs => DotProductFloat(exprs.head, exprs(1)), "built-in")
  }

  /** Codegen'd dot product; caller must have invoked [[register]]. */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}
