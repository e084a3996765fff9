package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler algorithm, standard parameterization (match window
  * ⌊max(|a|,|b|)/2⌋−1, transpositions halved, Winkler prefix boost
  * p = 0.1 over at most 4 leading characters, applied only when the
  * Jaro score exceeds 0.7) — the same definition DuckDB's
  * `jaro_winkler_similarity` implements, verified value-identical on
  * probe pairs including the boost-threshold and shared-prefix edges.
  * The score arithmetic is a fixed-order formula over integer match
  * counts, so for a given pair both engines produce bit-identical
  * doubles. Comparison runs on UTF-16 code units; on ASCII (the whole
  * differential surface) this coincides with DuckDB's byte-wise view.
  */
object JaroWinklerImpl {

  /** Static entry shared by interpreted eval and generated code —
    * the Levenshtein pattern: whole-stage codegen emits one static
    * call, keeping the projection compiled while the O(|a|·|b|)
    * scan lives in ordinary JVM code the JIT optimizes once.
    */
  def similarity(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString, b.toString)

  def similarity(a: String, b: String): Double = {
    val jaro = jaroScore(a, b)
    if (jaro <= 0.7) return jaro
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  private def jaroScore(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val fa = new Array[Boolean](la)
    val fb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!fb(j) && a.charAt(i) == b.charAt(j)) {
          fa(i) = true; fb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (fa(i)) {
        while (!fb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    (m.toDouble / la + m.toDouble / lb + (m - half).toDouble / m) / 3.0
  }
}

/** Codegen'd Jaro–Winkler similarity over two string columns — the
  * scoring primitive for fuzzy record linkage ([[graft.ops.Joins
  * .joinFuzzyJaro]]). A Scala UDF would work but deserializes both
  * strings per row outside the generated plan; this stays inside
  * whole-stage codegen like the built-in `levenshtein`.
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column API, mirroring [[VectorFunctions]]. */
object StringFunctions {

  val jaroWinklerInfo
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "jaro_winkler"),
    (exprs: Seq[Expression]) => JaroWinklerSimilarity(exprs.head, exprs(1)))

  def register(spark: SparkSession): Unit = {
    // register only when absent — same rationale as
    // VectorFunctions.register: an unconditional replace emits a
    // SimpleFunctionRegistry WARN per query build, drowning registry
    // WARNs that matter. A rare concurrent double-register is
    // harmless (same definition, one redundant WARN).
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("jaro_winkler")))
      reg.createOrReplaceTempFunction(
        "jaro_winkler", exprs => JaroWinklerSimilarity(exprs.head, exprs(1)),
        "built-in")
  }

  /** Codegen'd Jaro–Winkler; caller must have invoked [[register]]. */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("jaro_winkler", a, b)
}
