package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite

/** J6 — concurrent jobs on one shared session (the reference's
  * 3-thread submission test, reference test.py:173-236): several
  * registry queries run simultaneously must each produce the same
  * result as when run serially.
  */
class ConcurrencySpec extends AnyFunSuite {
  import TestSpark._

  test("3 queries run concurrently match their serial results") {
    val names = Seq("word_count", "q1_agg", "join_inner")
    runConcurrent(names)
  }

  test("cache-backed queries race safely (verifiedPairs + trained-merges memos)") {
    // dedup_edit_distance reads the session-keyed verifiedPairs cache,
    // bpe_encode the trained-merges cache — 3 threads each hit the
    // cold-miss path simultaneously and must agree with serial runs
    runConcurrent(Seq("dedup_edit_distance", "bpe_encode", "dup_count"))
  }

  private def runConcurrent(names: Seq[String]): Unit = {
    val serial = names.map { n =>
      n -> SparkEntry.queries(n)(spark, sfTiny).collect().map(_.toString).sorted.toSeq
    }.toMap
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (1 to 3).flatMap(_ => names.map { n =>
        Future(n -> SparkEntry.queries(n)(spark, sfTiny)
          .collect().map(_.toString).sorted.toSeq)
      })
      val results = Await.result(Future.sequence(futures), 120.seconds)
      results.foreach { case (n, rows) =>
        assert(rows == serial(n), s"concurrent run of $n diverged")
      }
    } finally pool.shutdown()
  }
}
