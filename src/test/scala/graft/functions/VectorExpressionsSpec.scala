package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class VectorExpressionsSpec extends AnyFunSuite {
  import TestSpark._

  test("vec_dot equals the higher-order-function fold on the fixture") {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sfTiny)
    val both = e.select(
      VectorFunctions.vecDot(col("embedding"), col("embedding")).as("native"),
      graft.dedup.DedupOps.dot(col("embedding"), col("embedding")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "native and HOF fold must be bit-identical")
    }
  }

  test("vec_dot handles simple literals and nulls") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f), Array(8.0f))).toDF("a", "b")
    val vals = df.select(VectorFunctions.vecDot(col("a"), col("b"))).as[Double].collect()
    assert(vals.toSeq == Seq(32.0, 4.0))
    val withNull = df.select(
      VectorFunctions.vecDot(lit(null).cast("array<float>"), col("b"))).collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("two vec_dot instances compile in ONE generated projection") {
    // UnsafeProjection.create catches Janino errors and silently
    // interprets — generate() rethrows, so this fails loudly if the
    // codegen re-declares locals across instances (the bug this pins).
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val ref = BoundReference(0, ArrayType(FloatType), nullable = true)
    val dot = DotProductFloat(ref, ref)
    GenerateUnsafeProjection.generate(Seq(dot, dot))
    // and via the full query path: a projection using vec_dot twice
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.vecDot(col("a"), col("b")).as("ab"),
      VectorFunctions.vecDot(col("a"), col("a")).as("aa")).head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
  }

  test("GraftExtensions registers vec_dot; SQL surface works") {
    // extensions apply at session build; here exercise the injection
    // call itself plus the same registry path on a derived session
    new graft.plans.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    val s2 = spark.newSession()
    VectorFunctions.register(s2)
    assert(s2.sql("SELECT vec_dot(array(cast(1.0 as float)), array(cast(2.0 as float)))")
      .head().getDouble(0) == 2.0)
  }
}
