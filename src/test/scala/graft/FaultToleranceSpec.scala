package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.{Success => TaskSuccess, TaskContext}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F3/F4 — Spark's built-in task-retry recovery, demonstrated rather
  * than reimplemented. The reference's flagship fault suite
  * (test_health_check.sh:134-227, Tests 8–9) kills a worker mid-map
  * and mid-reduce and asserts the job still completes with the right
  * answer; its master re-dispatches the dead worker's task
  * (master.py:373-396). Spark ships that machinery (SURVEY §2 F3/F4,
  * "built-in — do not re-implement"), and this suite is the in-process
  * analog: one partition's task throws deterministically on its FIRST
  * attempt only (keyed by `TaskContext.attemptNumber`, the same
  * "worker dies once, retry succeeds" shape), under the test
  * session's `local[4, 2]` master (maxFailures=2). The assertions are
  * exactly the reference's: the job completes, the result equals the
  * no-failure run, and a retry actually happened (a SparkListener
  * observes the failed attempt AND the succeeding one for the same
  * stage — so the test can never silently pass by not injecting).
  */
class FaultToleranceSpec extends AnyFunSuite {
  import TestSpark._

  /** (stageId, success?) per completed task attempt, listener-fed. */
  private def withTaskLog[T](body: => T): (T, Seq[(Int, Boolean)]) = {
    val log = new ConcurrentLinkedQueue[(Int, Boolean)]()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        log.add((e.stageId, e.reason == TaskSuccess))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = body
      // the listener bus is async: poll until the failure AND a
      // success for its stage have both been delivered (bounded)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def retried: Boolean = {
        val snap = log.toArray(Array.empty[(Int, Boolean)])
        snap.exists { case (st, ok) => !ok && snap.contains((st, true)) }
      }
      while (!retried && System.nanoTime() < deadline) Thread.sleep(50)
      (r, log.toArray(Array.empty[(Int, Boolean)]).toSeq)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def assertRetryObserved(log: Seq[(Int, Boolean)]): Unit = {
    val failedStages = log.collect { case (st, false) => st }.toSet
    assert(failedStages.nonEmpty,
      "no task attempt failed — the fault was never injected")
    assert(failedStages.exists(st => log.contains((st, true))),
      s"failed stage(s) $failedStages never logged a succeeding attempt")
  }

  test("task thrown mid-MAP on attempt 0 is retried; result equals the clean run") {
    import spark.implicits._
    val clean = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
      .map { case (k, q) => (k % 10, q) }
      .groupByKey(_._1).mapValues(_._2).keys.toDF("b").count()
    val (faulty, log) = withTaskLog {
      Tables.lineitem(spark, sfTiny)
        .select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
        .mapPartitions { it =>
          val tc = TaskContext.get()
          if (tc.partitionId() == 0 && tc.attemptNumber() == 0)
            throw new RuntimeException("injected mid-map worker death")
          it
        }
        .map { case (k, q) => (k % 10, q) }
        .groupByKey(_._1).mapValues(_._2).keys.toDF("b").count()
    }
    assert(faulty == clean)
    assertRetryObserved(log)
  }

  test("task thrown mid-REDUCE on attempt 0 is retried; result equals the clean run") {
    import spark.implicits._
    def grouped = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
      .groupByKey(_._1 % 10)
    val clean = grouped.mapGroups((b, it) => (b, it.map(_._2).sum))
      .toDF("b", "s").orderBy("b").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (faulty, log) = withTaskLog {
      grouped.mapGroups { (b, it) =>
        val tc = TaskContext.get()
        // the reduce task has consumed part of its input when it dies
        val s = it.map(_._2).sum
        if (tc.partitionId() == 0 && tc.attemptNumber() == 0)
          throw new RuntimeException("injected mid-reduce worker death")
        (b, s)
      }.toDF("b", "s").orderBy("b").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    assert(faulty == clean)
    assertRetryObserved(log)
  }
}
