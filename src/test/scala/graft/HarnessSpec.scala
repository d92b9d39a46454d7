package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-18 measurement plumbing — pure JVM, no Spark:
  * the MemoLog self-time arithmetic the bench artifacts report, and
  * the IO-gate predicate that decides which family windows re-run. */
class HarnessSpec extends AnyFunSuite {

  test("MemoLog: nested builds report self time, total includes children") {
    MemoLog.drain() // isolate from anything a prior suite recorded
    MemoLog.setContext("spec")
    MemoLog.timed("outer") {
      Thread.sleep(60)
      MemoLog.timed("inner") { Thread.sleep(120) }
      Thread.sleep(30)
    }
    val by = MemoLog.drain().map(b => b.tag -> b).toMap
    assert(by.keySet == Set("outer", "inner"))
    val (o, i) = (by("outer"), by("inner"))
    assert(o.by == "spec" && i.by == "spec")
    // inner is a leaf: self == total, ≥ its sleep
    assert(i.selfSec >= 0.110 && math.abs(i.selfSec - i.totalSec) < 0.005)
    // outer's total includes the child; its self excludes it
    assert(o.totalSec >= i.totalSec + 0.085)
    assert(o.selfSec >= 0.085 && o.selfSec <= o.totalSec - i.totalSec + 0.05)
    // drained means drained
    assert(MemoLog.drain().isEmpty)
  }

  test("MemoLog: self time never goes negative and ledger sums to wall") {
    MemoLog.drain()
    MemoLog.timed("a") { MemoLog.timed("b") { MemoLog.timed("c") { () } } }
    val entries = MemoLog.drain()
    assert(entries.forall(_.selfSec >= 0.0))
    val wall = entries.find(_.tag == "a").get.totalSec
    val selfSum = entries.map(_.selfSec).sum
    // self times partition the outermost wall (within timer slack)
    assert(math.abs(selfSum - wall) < 0.01, s"$selfSum vs $wall")
  }

  test("io gate: flags 3x fsync or 1/3 reread; invalid probes never flag") {
    import Yardstick.{IoProbe, ioFlagged}
    val medF = 12.0
    val medR = 4000.0
    val healthy = IoProbe(4100.0, 2800.0, 11.0)
    assert(!ioFlagged(healthy, medF, medR))
    // fsync contention window (the r17 q_stream_session signature)
    assert(ioFlagged(IoProbe(4100.0, 2800.0, 150.0), medF, medR))
    // page-cache eviction window (the r16 dedup signature)
    assert(ioFlagged(IoProbe(900.0, 2800.0, 11.0), medF, medR))
    // exactly-at-threshold is NOT flagged (strict inequalities)
    assert(!ioFlagged(IoProbe(medR / 3, 2800.0, 3 * medF), medF, medR))
    // degraded probes (-1 fields) and unmeasurable medians never flag
    assert(!ioFlagged(IoProbe(-1.0, -1.0, -1.0), medF, medR))
    assert(!ioFlagged(IoProbe(900.0, 2800.0, 150.0), -1.0, -1.0))
  }
}
