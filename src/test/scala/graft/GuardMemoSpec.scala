package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GuardMemo

/** The shared probe-guard memo: per-path interval memoization under an
  * LRU size cap (r18 ADVICE — the ANN guard's unbounded map grew for the
  * JVM's life in a serving process cycling rebuilt index paths).
  */
class GuardMemoSpec extends AnyFunSuite {

  test("memoizes per path within the interval; interval <= 0 forces every call") {
    val m = new GuardMemo(8)
    val hour = 3600L * 1000 * 1000 * 1000
    assert(m.shouldCheck("a", hour), "first sighting of a path must check")
    assert(!m.shouldCheck("a", hour), "within the interval the memo holds")
    assert(m.shouldCheck("b", hour), "paths memoize independently")
    assert(m.shouldCheck("a", 0L), "zero interval is the force-every-call spec setting")
    assert(m.shouldCheck("a", -1L))
  }

  test("LRU cap: the map never outgrows maxEntries; eviction re-arms the evicted path") {
    val m = new GuardMemo(4)
    val hour = 3600L * 1000 * 1000 * 1000
    (1 to 100).foreach(i => m.shouldCheck(s"p$i", hour))
    assert(m.size == 4, s"cap must hold under churn, size ${m.size}")
    // p1 was evicted long ago: it checks again (a re-check, never a miss
    // of a warning — eviction errs toward re-checking)
    assert(m.shouldCheck("p1", hour))
    // recently-used survives: p1 was just touched, so adding one more
    // path evicts an older entry, not p1
    m.shouldCheck("p101", hour)
    assert(!m.shouldCheck("p1", hour), "recently-touched paths stay memoized")
  }
}
