package graft.sources

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The per-key build lock behind every persisted artifact:
  * `TrieMap.getOrElseUpdate` only guarantees one VALUE wins — the thunk
  * can still run twice concurrently, and two simultaneous `write()`s race
  * on DROP TABLE + directory delete + saveAsTable. [[ManagedTable.once]]
  * must elect exactly one builder and park everyone else on its result. */
class ManagedTableSpec extends AnyFunSuite {

  test("once: N racing threads -> exactly one build, all see its result") {
    val builds = new AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            gate.await(5, TimeUnit.SECONDS)
            ManagedTable.once("spec/race-key") {
              Thread.sleep(50) // widen the window a lost race would hit
              builds.incrementAndGet()
            }
          }
        })
      }
      gate.countDown()
      val results = futs.map(_.get(30, TimeUnit.SECONDS))
      assert(builds.get() == 1, s"build ran ${builds.get()} times")
      assert(results.toSet == Set(1))
    } finally pool.shutdownNow()
  }

  test("once: a failed build clears the slot so a later call can retry") {
    var attempts = 0
    intercept[RuntimeException] {
      ManagedTable.once("spec/fail-key") {
        attempts += 1; throw new RuntimeException("boom")
      }
    }
    val v = ManagedTable.once("spec/fail-key") { attempts += 1; attempts }
    assert(v == 2 && attempts == 2)
    // and the success is now memoized
    assert(ManagedTable.once("spec/fail-key") { attempts += 1; attempts } == 2)
  }
}
