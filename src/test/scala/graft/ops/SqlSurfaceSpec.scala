package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The SQL front door beyond plain text: Spark 4 parameterized
  * queries — named and positional markers keep user values out of the
  * SQL string (no injection, no literal-formatting bugs, and the plan
  * cache can reuse across parameter values).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  test("named and positional parameter markers bind without string splicing") {
    val s2 = spark.newSession()
    Tables.lineitem(s2, sfTiny).createOrReplaceTempView("lineitem")
    try {
      val named = s2.sql(
        "SELECT count(*) AS n FROM lineitem WHERE l_quantity < :q AND l_discount >= :d",
        Map("q" -> 24, "d" -> 0.05)).head().getLong(0)
      val positional = s2.sql(
        "SELECT count(*) AS n FROM lineitem WHERE l_quantity < ? AND l_discount >= ?",
        Array(24, 0.05)).head().getLong(0)
      val spliced = s2.sql(
        "SELECT count(*) AS n FROM lineitem WHERE l_quantity < 24 AND l_discount >= 0.05")
        .head().getLong(0)
      assert(named == spliced && positional == spliced && spliced > 0)
    } finally s2.catalog.dropTempView("lineitem")
  }

  test("a hostile parameter value stays a VALUE, not SQL") {
    val s2 = spark.newSession()
    Tables.part(s2, sfTiny).createOrReplaceTempView("part")
    try {
      val hostile = "' OR '1'='1"
      val n = s2.sql("SELECT count(*) AS n FROM part WHERE p_name = :name",
        Map("name" -> hostile)).head().getLong(0)
      assert(n == 0, "parameter was interpolated as SQL")
    } finally s2.catalog.dropTempView("part")
  }
}
