package graft

import java.util.concurrent.atomic.AtomicLong

/** Host-contention instrumentation for the benchmark artifact.
  *
  * Two committed rounds in a row lost their headline perf signal to
  * external host load that only a separate isolated re-run could
  * litigate. These probes make contamination machine-detectable from
  * the committed JSON alone:
  *
  *  - `externalCpuFrac` — the fraction of the machine's CPU bandwidth
  *    consumed by OTHER processes during a measured window, from
  *    `/proc/stat` (whole-system busy jiffies) minus `/proc/self/stat`
  *    (this JVM's own jiffies). `/proc/loadavg` alone can't separate
  *    the bench's own 32 threads from a contending neighbor; the
  *    subtraction can.
  *  - `calibProbe` — a fixed 32-thread CPU workload with a pinned
  *    idle-host reference in `bench_baseline.json`; its ratio to the
  *    pin is a direct slowdown factor for CPU-bound Spark stages.
  */
object HostLoad {
  private val sink = new AtomicLong(0L)

  /** 1-minute loadavg; NaN if /proc is unavailable. */
  def loadavg1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split("\\s+")(0).toDouble
    catch { case _: Throwable => Double.NaN }

  /** (whole-system busy jiffies summed over all cpus, this process's
    * utime+stime+cutime+cstime jiffies). USER_HZ = 100 on Linux.
    */
  def cpuJiffies(): (Long, Long) = {
    val sys =
      try {
        val parts = scala.io.Source.fromFile("/proc/stat").getLines().next()
          .trim.split("\\s+").drop(1).map(_.toLong)
        // exclude idle (3) and iowait (4); count user/nice/system/irq/softirq/steal
        parts.zipWithIndex.collect { case (v, i) if i != 3 && i != 4 => v }.sum
      } catch { case _: Throwable => -1L }
    val self =
      try {
        val raw = scala.io.Source.fromFile("/proc/self/stat").mkString
        // comm (field 2) may contain spaces; fields after the last ')'
        // are fixed-position: utime/stime/cutime/cstime at 11..14 of
        // the remainder (state at 0).
        val rest = raw.substring(raw.lastIndexOf(')') + 1).trim.split("\\s+")
        rest(11).toLong + rest(12).toLong + rest(13).toLong + rest(14).toLong
      } catch { case _: Throwable => -1L }
    (sys, self)
  }

  /** Fraction of total machine CPU bandwidth used by processes OTHER
    * than this JVM across a window delimited by two `cpuJiffies()`
    * snapshots. ~0.0 idle; 0.12 ≈ four external runnable threads on a
    * 32-core host. -1 if /proc was unreadable.
    */
  def externalCpuFrac(before: (Long, Long), after: (Long, Long), wallSec: Double): Double = {
    if (before._1 < 0 || before._2 < 0 || after._1 < 0 || after._2 < 0 || wallSec <= 0) return -1.0
    val ext = (after._1 - before._1) - (after._2 - before._2)
    val cap = Runtime.getRuntime.availableProcessors().toDouble * wallSec * 100.0 // USER_HZ
    math.max(0.0, ext / cap)
  }

  /** Wall seconds for a fixed CPU workload: `threads` dependency-chained
    * LCG-mix loops run concurrently (~0.3 s on an idle 32-core host).
    * On an idle machine every thread gets its own core and wall time ≈
    * single-thread time; contention stretches it proportionally. The
    * AtomicLong sink defeats dead-code elimination.
    */
  def calibProbe(threads: Int = 32, iters: Long = 150000000L): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => {
        var h = 0x9E3779B97F4A7C15L + i
        var k = 0L
        while (k < iters) {
          h = h * 6364136223846793005L + 1442695040888963407L
          h ^= (h >>> 33)
          k += 1
        }
        sink.addAndGet(h): Unit
      })
      t.setDaemon(true); t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** min-of-k probe (transient scheduler noise defense, same rationale
    * as the bench's min-of-k query timing).
    */
  def calibMin(k: Int = 3): Double = (1 to k).map(_ => calibProbe()).min
}
