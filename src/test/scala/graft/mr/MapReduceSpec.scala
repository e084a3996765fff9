package graft.mr

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Differential tests of the generic MapReduce contract against an
  * in-process sequential simulator — the same oracle shape as the
  * reference's own test suite (reference test.py:48-72 runs each job
  * on the cluster and in a local map→group→reduce loop and compares
  * order-insensitively).
  */
class MapReduceSpec extends AnyFunSuite {
  import TestSpark._

  /** The reference oracle: sequential map → group → reduce. */
  private def runLocally[IN, K2, V2, OUT](
      input: Seq[IN],
      mapFn: IN => IterableOnce[(K2, V2)],
      reduceFn: (K2, Iterator[V2]) => IterableOnce[OUT]): Seq[OUT] =
    input.flatMap(mapFn.andThen(_.iterator)).groupBy(_._1).toSeq
      .flatMap { case (k, kvs) => reduceFn(k, kvs.iterator.map(_._2)) }

  private def tmpTextFiles(contents: Seq[String]): String = {
    val dir = Files.createTempDirectory("mrspec")
    contents.zipWithIndex.foreach { case (c, i) =>
      Files.writeString(dir.resolve(s"f$i.txt"), c)
    }
    dir.toString
  }

  test("S2 textLines yields per-file line indexes") {
    val dir = tmpTextFiles(Seq("a\nb\nc", "x\ny"))
    val lines = MapReduce.textLines(spark, dir).collect().toSet
    assert(lines == Set((0L, "a"), (1L, "b"), (2L, "c"), (0L, "x"), (1L, "y")))
  }

  test("S1 wholeFiles reads full bytes with metadata") {
    val dir = tmpTextFiles(Seq("hello world", "second file"))
    val files = MapReduce.wholeFiles(spark, dir).collect()
    assert(files.length == 2)
    val byName = files.map(f => f._2.path.split('/').last -> new String(f._1, "UTF-8")).toMap
    assert(byName == Map("f0.txt" -> "hello world", "f1.txt" -> "second file"))
    assert(files.forall(f => f._2.size == f._1.length))
  }

  test("S3 custom iterator + full contract = reference word count over files") {
    import spark.implicits._
    val texts = Seq("the cat sat", "the dog SAT on the cat", "Cat!")
    val dir = tmpTextFiles(texts)
    // reference word_count.py: iterator yields (path, text); map tokenizes
    val records = MapReduce.iterate[String, String](
      MapReduce.wholeFiles(spark, dir),
      (bytes, meta) => Iterator((meta.path, new String(bytes, "UTF-8"))))
    val result = MapReduce.run[(String, String), String, Long, (String, Long)](
      records,
      { case (_, text) => MrJobs.tokenize(text).map(w => (w, 1L)) },
      (w, counts) => Iterator((w, counts.sum)))
      .collect().toMap
    val expected = runLocally[String, String, Long, (String, Long)](
      texts,
      t => MrJobs.tokenize(t).map(w => (w, 1L)),
      (w, counts) => Iterator((w, counts.sum))).toMap
    assert(result == expected)
    assert(result("the") == 3 && result("cat") == 3 && result("sat") == 2)
  }

  test("runReduced (combiner path) equals generic run") {
    import spark.implicits._
    val data = spark.range(1000).as[Long].map(i => (s"k${i % 13}", i)).cache()
    val generic = MapReduce.run[(String, Long), String, Long, (String, Long)](
      data, Iterator(_), (k, vs) => Iterator((k, vs.sum))).collect().toMap
    val reduced = MapReduce.runReduced[(String, Long), String, Long, (String, Long)](
      data, Iterator(_), _ + _, (k, v) => (k, v)).collect().toMap
    assert(generic == reduced)
  }

  test("partition invariance: results identical at 1/4/32 shuffle partitions") {
    // The invariant the reference's salted hash() violates
    // (reference worker.py:136): results must not depend on the
    // partition count.
    import spark.implicits._
    val data = spark.range(500).as[Long].map(i => (s"k${i % 7}", i)).cache()
    val results = Seq(1, 4, 32).map { n =>
      withShufflePartitions(n) {
        MapReduce.run[(String, Long), String, Long, (String, Long)](
          data, Iterator(_),
          (k, vs) => Iterator((k, vs.sum))).collect().toSet
      }
    }
    assert(results.distinct.size == 1)
  }

  test("mr jobs agree with declarative twins on the fixture") {
    val mr = MrJobs.mrWordCount(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val sql = graft.text.TextOps.wordCount(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(mr == sql)
    val mrIdx = MrJobs.mrInvertedIndex(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val sqlIdx = graft.text.TextOps.invertedIndex(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(mrIdx == sqlIdx)
  }
}
