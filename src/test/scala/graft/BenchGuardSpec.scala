package graft

import org.scalatest.funsuite.AnyFunSuite

/** The dirty-tree guard in [[Bench]]: a bench run from an uncommitted
  * tree produced a silently broken artifact once (10 errored
  * store-backed queries in a `-dirty` sf100 run, caused by a
  * concurrent compile rewriting the shared classes dir). The guard
  * must refuse exactly the dirty+no-override case and nothing else.
  */
class BenchGuardSpec extends AnyFunSuite {
  test("clean tree always runs") {
    assert(!Bench.refuseDirty(dirty = false, None))
    assert(!Bench.refuseDirty(dirty = false, Some("1")))
    assert(!Bench.refuseDirty(dirty = false, Some("0")))
  }
  test("dirty tree refuses unless explicitly overridden with 1") {
    assert(Bench.refuseDirty(dirty = true, None))
    assert(Bench.refuseDirty(dirty = true, Some("0")))
    assert(Bench.refuseDirty(dirty = true, Some("")))
    assert(Bench.refuseDirty(dirty = true, Some("true"))) // only "1" overrides
    assert(!Bench.refuseDirty(dirty = true, Some("1")))
  }
}
