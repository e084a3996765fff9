package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Round-trips for every sink shape plus the multi-format read
  * surface (SURVEY.md §2.1 "other formats — built-in"): what goes out
  * through each sink comes back identical through the matching source.
  */
class SinksSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    Files.createTempDirectory("sinks").resolve("out").toString

  private def wc = graft.text.TextOps.wordCount(spark, sfTiny)

  test("tsv sink: k\\tv lines, round-trips through csv source") {
    val path = tmp()
    Sinks.writeTsv(wc, path)
    val back = spark.read.option("sep", "\t")
      .schema("word STRING, cnt LONG").csv(path)
    assert(back.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      wc.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("single-file tsv sink produces exactly one part file") {
    val path = tmp()
    Sinks.writeTsv(wc, path, singleFile = true)
    val parts = new java.io.File(path).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
  }

  test("partitioned parquet sink prunes partitions on read") {
    val path = tmp()
    val orders = Tables.orders(spark, sfTiny)
    Sinks.writeParquet(orders, path, partitionBy = Seq("o_orderstatus"))
    val one = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    val expected = orders.filter(col("o_orderstatus") === "F").count()
    assert(one.count() == expected)
    // partition pruning must reach the scan
    val plan = one.queryExecution.executedPlan.toString
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("o_orderstatus=")))
    assert(!plan.toLowerCase.contains("filter") ||
      one.queryExecution.optimizedPlan.toString.contains("o_orderstatus"))
  }

  test("json sink round-trips") {
    val path = tmp()
    Sinks.writeJson(wc, path)
    val back = spark.read.json(path).select(col("word"), col("cnt"))
    assert(back.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      wc.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("parquet with zstd codec round-trips") {
    val path = tmp()
    wc.write.mode("overwrite").option("compression", "zstd").parquet(path)
    val files = new java.io.File(path).listFiles().map(_.getName)
    assert(files.exists(_.contains(".zstd.parquet")), files.mkString(","))
    assert(spark.read.parquet(path).count() == wc.count())
  }

  test("orc round-trips (multi-format surface)") {
    val path = tmp()
    wc.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    assert(back.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      wc.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("multi-path read unions files (J5)") {
    val p1 = tmp(); val p2 = tmp()
    Sinks.writeParquet(wc, p1)
    Sinks.writeParquet(wc, p2)
    val both = spark.read.parquet(p1, p2)
    assert(both.count() == 2 * wc.count())
  }

  test("jdbc source reads as a partitioned parallel range scan") {
    // the single-cursor JDBC pull is the classic relational-source
    // bottleneck; the plan must show the partitioned relation
    val p = FileSources.jdbcEvents(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(p.contains(s"numPartitions=${FileSources.JdbcReadPartitions}"),
      s"jdbc read not range-partitioned:\n${p.take(1500)}")
  }

  test("permissive csv quarantines exactly the planted malformed rows") {
    val total = Tables.events(spark, sfTiny).count()
    val planted = Tables.events(spark, sfTiny)
      .filter(pmod(col("event_id"), lit(1000)) === 0).count()
    val row = FileSources.corruptCsv(spark, sfTiny).collect().head
    assert(row.getLong(0) == total - planted, "good-row count off")
    assert(row.getLong(1) == planted, "corrupt-row count off")
    assert(planted > 0, "fixture too small to plant any corrupt row")
  }

  test("dynamic partition overwrite rewrites only the touched partitions") {
    // the incremental-backfill write mode: overwrite day N's partition
    // without clobbering days 1..N−1 (static overwrite mode would drop
    // the whole table root — the classic data-loss footgun)
    val path = tmp()
    val orders = Tables.orders(spark, sfTiny)
    Sinks.writeParquet(orders, path, partitionBy = Seq("o_orderstatus"))
    val before = spark.read.parquet(path).count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // rewrite ONLY status 'F', with a marker change (negated price)
      orders.filter(col("o_orderstatus") === "F")
        .withColumn("o_totalprice", -col("o_totalprice"))
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    val after = spark.read.parquet(path)
    assert(after.count() == before, "row count changed — a partition was lost")
    // untouched partitions keep original values; the rewritten one
    // carries the marker
    assert(after.filter(col("o_orderstatus") =!= "F")
      .filter(col("o_totalprice") < 0).count() == 0)
    assert(after.filter(col("o_orderstatus") === "F")
      .filter(col("o_totalprice") >= 0).count() == 0)
  }
}
