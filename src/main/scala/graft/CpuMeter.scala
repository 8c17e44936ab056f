package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/**
 * Executor-CPU accounting shared by the measurement harnesses (Bench's
 * `queries_cpu`, RunOne's per-rep column, ScaleSmoke's CPU gates): one
 * task-end listener summing `executorCpuTime`, with the listener-bus
 * drain that makes a before/after snapshot attribute tasks to the work
 * between the two calls. One implementation so a future accounting fix
 * (filtering speculative tasks, adding run time) lands everywhere.
 */
final class CpuMeter private (sc: SparkContext) {
  private val cpuNs = new AtomicLong(0L)
  private val listener = new SparkListener {
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) { cpuNs.addAndGet(m.executorCpuTime); () }
    }
  }
  sc.addSparkListener(listener)

  /** Drain the listener bus, then read the accumulated CPU nanos —
    * without the drain, tasks that finished before the call can still
    * be in flight on the bus and land in the NEXT interval. */
  def snapshotNs(): Long = {
    org.apache.spark.sql.graftshim.GraftShims.waitListenerBusEmpty(sc)
    cpuNs.get
  }

  def remove(): Unit = sc.removeSparkListener(listener)
}

object CpuMeter {
  def attach(sc: SparkContext): CpuMeter = new CpuMeter(sc)
}
