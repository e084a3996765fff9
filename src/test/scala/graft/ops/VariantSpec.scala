package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins what VARIANT buys over from_json: per-row shape variance
  * without a reader schema, typed lazy extraction, and shape
  * introspection — the schema-drift posture variantExtract's
  * scaladoc claims.
  */
class VariantSpec extends AnyFunSuite {
  import TestSpark._

  test("variant handles heterogeneous payload shapes in one column") {
    import spark.implicits._
    val df = Seq(
      """{"k": 1}""",
      """{"k": 2, "extra": "x"}""",
      """{"k": "3"}""",
      """{"nested": {"k": 4}}""").toDF("props")
      .select(parse_json(col("props")).as("v"))
    // typed extraction: absent path → null, string "3" coerces to int
    val ks = df.select(variant_get(col("v"), "$.k", "int")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(ks == Seq(Some(1), Some(2), Some(3), None))
    // nested navigation reaches what a flat schema would have dropped
    val nested = df.select(variant_get(col("v"), "$.nested.k", "int")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(nested == Seq(None, None, None, Some(4)))
    // shape introspection reports the drift per row
    val shapes = df.select(schema_of_variant(col("v"))).collect().map(_.getString(0)).toSeq
    assert(shapes.distinct.size >= 3, s"expected drifting shapes, got $shapes")
  }

  test("variant_extract registry query equals the string-path extraction") {
    val viaVariant = ScalarOps.variantExtract(spark, sfTiny).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val viaString = ScalarOps.scalarJson(spark, sfTiny).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(viaVariant == viaString)
  }
}
