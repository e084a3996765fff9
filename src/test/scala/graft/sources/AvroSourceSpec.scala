package graft.sources

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The graft-avro DataSource V2 (AvroSource.scala): container-file
  * round-trips, byte-range split reading, decoder-level column
  * pruning, the strict type matrix, and the overwrite/commit
  * protocol. The `source_avro` registry entry puts the events
  * round-trip under the DuckDB gate; this suite covers what the gate
  * can't see (split boundaries, plan shape, staging files, the type
  * corners the events schema doesn't reach).
  */
class AvroSourceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-avro-$tag").toString

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.mkString(" "))

  test("events round-trip: every column, every row, timestamp-micros intact") {
    val out = tmpDir("events")
    val ev = graft.Tables.events(spark, sfTiny)
      .select($"event_id", $"user_id", $"event_type", $"value", $"ts")
    ev.write.mode("overwrite").format("graft-avro").save(out)
    val back = spark.read.format("graft-avro").load(out)
      .select($"event_id", $"user_id", $"event_type", $"value", $"ts")
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      ev.schema.map(f => (f.name, f.dataType)))
    assert(sortedRows(back) === sortedRows(ev))
  }

  test("type matrix round-trips: bool/int/float/binary/date/arrays/nulls") {
    val schema = StructType(Seq(
      StructField("b", BooleanType, nullable = false),
      StructField("i", IntegerType, nullable = true),
      StructField("f", FloatType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("d", DateType, nullable = true),
      StructField("arr_l", ArrayType(LongType, containsNull = false), nullable = true),
      StructField("arr_s", ArrayType(StringType, containsNull = true), nullable = true),
      StructField("ts", TimestampType, nullable = true)))
    val rows = Seq(
      Row(true, 42, 1.5f, Array[Byte](1, 2, 3), Date.valueOf("2020-02-29"),
        Seq(1L, 2L, 3L), Seq("a", null, "c"), Timestamp.valueOf("2021-06-01 12:34:56.789")),
      Row(false, null, null, null, null, null, null, null),
      Row(true, -7, -0.25f, Array[Byte](), Date.valueOf("1969-12-31"),
        Seq.empty[Long], Seq.empty[String], Timestamp.valueOf("1969-12-31 23:59:59.000001")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = tmpDir("types")
    df.write.mode("overwrite").format("graft-avro").save(out)
    val back = spark.read.format("graft-avro").load(out)
    assert(back.schema.map(f => (f.name, f.dataType, f.nullable)) ===
      schema.map(f => (f.name, f.dataType, f.nullable)))
    def norm(r: Row): String = r.toSeq.map {
      case b: Array[Byte] => b.toList
      case s: scala.collection.Seq[_] => s.toList
      case v => v
    }.mkString("|")
    assert(back.collect().toSeq.map(norm).sorted === rows.map(norm).sorted)
  }

  test("byte-range splits: small blocks + small splits read every block exactly once") {
    val out = tmpDir("splits")
    // one fat partition -> ONE container file with many 1 KiB blocks,
    // so the split planner must fan it out and the sync/pastSync
    // handoff between adjacent ranges is actually exercised
    spark.range(0, 20000).select($"id",
        concat(lit("payload-"), $"id").as("s"))
      .coalesce(1)
      .write.mode("overwrite").option("sync.bytes", "1024")
      .option("codec", "null")
      .format("graft-avro").save(out)
    val split = spark.read.format("graft-avro")
      .option("split.bytes", "65536").load(out)
    assert(split.rdd.getNumPartitions > 1,
      s"expected multiple byte-range splits, got ${split.rdd.getNumPartitions}")
    assert(split.count() === 20000L)
    val whole = spark.read.format("graft-avro").load(out)
    assert(split.agg(sum($"id")).head.getLong(0) ===
      whole.agg(sum($"id")).head.getLong(0))
    assert(split.select($"id").distinct().count() === 20000L)
  }

  test("column pruning reaches the scan (pruned reader schema in the plan)") {
    val out = tmpDir("prune")
    graft.Tables.events(spark, sfTiny)
      .select($"event_id", $"user_id", $"event_type", $"value", $"ts")
      .write.mode("overwrite").format("graft-avro").save(out)
    val pruned = spark.read.format("graft-avro").load(out).select($"event_type")
    val scanDesc = pruned.queryExecution.executedPlan.toString()
    assert(scanDesc.contains("ReadSchema: struct<event_type:string>"),
      s"scan did not prune to event_type only:\n$scanDesc")
    assert(pruned.distinct().count() > 0)
    // empty projection (count(*)) resolves to a zero-field reader schema
    assert(spark.read.format("graft-avro").load(out).count() ===
      graft.Tables.events(spark, sfTiny).count())
  }

  test("overwrite truncates; commit leaves no staging files") {
    val out = tmpDir("commit")
    spark.range(0, 100).write.mode("overwrite").format("graft-avro").save(out)
    spark.range(0, 50).write.mode("overwrite").format("graft-avro").save(out)
    assert(spark.read.format("graft-avro").load(out).count() === 50L)
    spark.range(50, 75).write.mode("append").format("graft-avro").save(out)
    assert(spark.read.format("graft-avro").load(out).count() === 75L)
    // NOTE: Hadoop's local ChecksumFileSystem writes a hidden
    // `.<name>.crc` sidecar per visible file — those are filesystem
    // artifacts, not staging leftovers; only .inprogress files count
    val leftovers = new java.io.File(out).listFiles()
      .filter(_.getName.contains(".inprogress"))
    assert(leftovers.isEmpty, s"staging files survived commit: ${leftovers.mkString(",")}")
  }

  test("deflate/null/snappy/zstandard codecs all read back; unsupported codec rejected") {
    val df = spark.range(0, 1000).select($"id", ($"id" * 2).as("v"))
    for (codec <- Seq("deflate", "null", "snappy", "zstandard")) {
      val out = tmpDir(s"codec-$codec")
      df.write.mode("overwrite").option("codec", codec)
        .format("graft-avro").save(out)
      assert(spark.read.format("graft-avro").load(out).count() === 1000L)
    }
    val err = intercept[org.apache.spark.SparkException] {
      df.write.mode("overwrite").option("codec", "zstd-nope")
        .format("graft-avro").save(tmpDir("codec-bad"))
    }
    assert(err.getMessage.contains("unsupported codec") ||
      String.valueOf(err.getCause).contains("unsupported codec"))
  }

  test("nested structs and string-keyed maps round-trip") {
    val df = spark.range(0, 100).select(
      $"id",
      struct($"id".as("a"), concat(lit("s"), $"id").as("b"),
        struct(($"id" * 2).as("deep")).as("inner")).as("rec"),
      map(lit("k1"), $"id", lit("k2"), $"id" * 10).as("m"),
      when($"id" % 3 === 0, struct($"id".as("a"), lit("x").as("b"),
        struct($"id".as("deep")).as("inner"))).as("opt_rec"))
    val out = tmpDir("nested")
    df.write.mode("overwrite").format("graft-avro").save(out)
    val back = spark.read.format("graft-avro").load(out)
    assert(back.schema("rec").dataType.isInstanceOf[StructType])
    assert(back.schema("m").dataType === MapType(StringType, LongType, false))
    def key(r: Row) = r.getLong(0)
    val a = df.collect().sortBy(key).map(_.toString).toSeq
    val b = back.select(df.columns.map(col): _*).collect().sortBy(key).map(_.toString).toSeq
    assert(a === b)
    // and a nested field survives a pruned projection
    assert(back.select($"rec.inner.deep").as[Long].collect().sorted.toSeq ===
      (0L until 100L).map(_ * 2))
  }

  test("unsupported types fail loudly, not silently") {
    val df = spark.range(3).select(map($"id", $"id").as("int_keyed"))
    val err = intercept[Exception] {
      df.write.mode("overwrite").format("graft-avro").save(tmpDir("bad-type"))
    }
    assert(err.getMessage.contains("unsupported Spark type") ||
      String.valueOf(err.getCause).contains("unsupported Spark type"))
  }

  test("drifted writer schemas resolve by name: inference unions, readers null-fill") {
    val out = tmpDir("evolve")
    // generation 1: (id, a) — no b yet; generation 2: (id, b) — a dropped
    spark.range(0, 50).select($"id", ($"id" * 10).as("a"))
      .write.mode("overwrite").format("graft-avro").save(out)
    spark.range(50, 80).select($"id", concat(lit("v"), $"id").as("b"))
      .write.mode("append").format("graft-avro").save(out)
    val back = spark.read.format("graft-avro").load(out)
    // union-by-name inference; fields absent from a file are nullable
    assert(back.columns.toSeq === Seq("id", "a", "b"))
    assert(back.schema("a").nullable && back.schema("b").nullable)
    assert(back.count() === 80L)
    assert(back.filter($"a".isNull).count() === 30L, "gen-2 rows must null-fill a")
    assert(back.filter($"b".isNull).count() === 50L, "gen-1 rows must null-fill b")
    assert(back.filter($"id" < 50).agg(sum($"a")).as[Long].head() ===
      (0L until 50L).map(_ * 10).sum)
    assert(back.filter($"id" === 60).select($"b").as[String].head() === "v60")
  }

  test("schema drift guards: type conflicts and non-nullable gaps fail loudly") {
    // same column name, different type across files → inference refuses
    val out = tmpDir("evolve-conflict")
    spark.range(0, 5).select($"id", ($"id" * 1.5).as("x"))
      .write.mode("overwrite").format("graft-avro").save(out)
    spark.range(5, 9).select($"id", concat(lit("s"), $"id").as("x"))
      .write.mode("append").format("graft-avro").save(out)
    val err = intercept[Exception] { spark.read.format("graft-avro").load(out).count() }
    assert(String.valueOf(err.getMessage).contains("conflicting types") ||
      String.valueOf(err.getCause).contains("conflicting types"))
    // explicit schema demanding a NON-NULL column a file lacks → loud
    val out2 = tmpDir("evolve-nonnull")
    spark.range(0, 5).toDF("id")
      .write.mode("overwrite").format("graft-avro").save(out2)
    val strict = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("extra", LongType, nullable = false)))
    val err2 = intercept[Exception] {
      spark.read.schema(strict).format("graft-avro").load(out2).collect()
    }
    def chain(e: Throwable): Seq[Throwable] =
      if (e == null) Seq.empty else e +: chain(e.getCause)
    assert(chain(err2).exists(c =>
      String.valueOf(c.getMessage).contains("non-nullable column 'extra' missing")))
  }
}
