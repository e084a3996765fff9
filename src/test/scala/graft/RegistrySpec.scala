package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run at sf0.001 with a sane schema.
  * Row counts are asserted > 0 except for queries whose semantics can
  * legitimately produce an empty result on the tiny fixture (pair
  * finders above a high threshold, set difference).
  */
class RegistrySpec extends AnyFunSuite {
  import TestSpark._

  // pair finders can legitimately find nothing on a tiny fixture, and
  // the queries derived from their pairs inherit that
  private val mayBeEmpty = Set(
    "set_except", "dedup_ngram_jaccard", "dedup_minhash", "dedup_embedding",
    "dedup_edit_distance", "dedup_clusters")

  test("registry has no duplicate names and oracles reference known queries") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("dirKey is injective where plain sanitization collides") {
    assert(Tables.dirKey("/data/a-b") != Tables.dirKey("/data/a_b"))
    assert(Tables.dirKey("/data/sf0.1") != Tables.dirKey("/data/sf0_1"))
    assert(Tables.dirKey("/x") == Tables.dirKey("/x")) // stable
    assert(Tables.dirKey("/x").matches("[A-Za-z0-9_]+"), "filesystem/identifier-safe")
  }

  SparkEntry.registry.foreach { q =>
    test(s"query ${q.name} runs at sf0.001") {
      val df = q.fn(spark, sfTiny)
      assert(df.schema.nonEmpty, "empty schema")
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
