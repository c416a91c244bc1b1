package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the host-contention instrumentation the bench artifact relies
  * on ([[HostLoad]]): if these probes silently break (a /proc format
  * change, a DCE'd calibration loop), the committed `host` block would
  * report a clean run on a contaminated host.
  */
class HostLoadSpec extends AnyFunSuite {

  test("cpuJiffies is readable and monotone across a busy interval") {
    val a = HostLoad.cpuJiffies()
    assert(a._1 > 0, "/proc/stat busy jiffies should parse")
    assert(a._2 > 0, "/proc/self/stat jiffies should parse")
    // burn ~100ms of CPU so both counters must advance
    val t0 = System.nanoTime()
    var h = 1L
    while (System.nanoTime() - t0 < 150e6) { h = h * 6364136223846793005L + 1 }
    assert(h != 0)
    val b = HostLoad.cpuJiffies()
    assert(b._1 >= a._1 && b._2 >= a._2)
  }

  test("externalCpuFrac: self-only burn reports ~zero external share") {
    val before = HostLoad.cpuJiffies()
    val t0 = System.nanoTime()
    var h = 1L
    while (System.nanoTime() - t0 < 300e6) { h = h * 6364136223846793005L + 1 }
    assert(h != 0)
    val wall = (System.nanoTime() - t0) / 1e9
    val frac = HostLoad.externalCpuFrac(before, HostLoad.cpuJiffies(), wall)
    // other test threads / JVM background can contribute a little, but
    // a single-thread self-burn must not read as heavy external load
    assert(frac >= 0.0 && frac < 0.5, s"frac=$frac")
  }

  test("externalCpuFrac flags sentinel on unreadable snapshots") {
    assert(HostLoad.externalCpuFrac((-1L, 10L), (100L, 20L), 1.0) == -1.0)
    assert(HostLoad.externalCpuFrac((10L, 10L), (100L, 20L), 0.0) == -1.0)
  }

  test("calibProbe does fixed work and returns a plausible wall time") {
    // tiny variant so the suite doesn't pay the full 32x150M probe
    val t = HostLoad.calibProbe(threads = 4, iters = 2000000L)
    assert(t > 0.0 && t < 30.0, s"t=$t")
  }
}
