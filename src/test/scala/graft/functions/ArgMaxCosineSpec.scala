package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Direct kernel tests for [[ArgMaxCosine.compute]] — deterministic
  * same-thread calls, which is exactly the regime the thread-local decode
  * cache lives in. */
class ArgMaxCosineSpec extends AnyFunSuite {

  private def cents(rows: (Long, Array[Double], Double)*) =
    new GenericArrayData(rows.map { case (id, e, nsq) =>
      InternalRow(id, new GenericArrayData(e.map(x => x: Any)), nsq)
    }.toArray[Any])

  private def emb(xs: Double*) = new GenericArrayData(xs.toArray.map(x => x: Any))

  test("argmax picks the highest cosine; ties break toward the smaller id") {
    val cs = cents(
      (0L, Array(1.0, 0.0), 1.0),
      (1L, Array(0.0, 2.0), 4.0),
      (2L, Array(0.5, 0.5), 0.5))
    assert(ArgMaxCosine.compute(emb(0.0, 1.0), 1.0, cs, false, false) == 1L)
    // exact tie between ids 0 and 1 for the diagonal probe at equal sims
    val tie = cents((7L, Array(1.0, 0.0), 1.0), (3L, Array(1.0, 0.0), 1.0))
    assert(ArgMaxCosine.compute(emb(1.0, 0.0), 1.0, tie, false, false) == 3L)
  }

  test("cache key distinguishes centroid sets sharing n, boundary ids and first norm") {
    // the ADVICE aliasing scenario: set B differs from A ONLY in the
    // middle centroid (different norm) — a boundary-only cache key calls
    // this a hit and silently reuses A's decode on the same thread
    val a = cents(
      (0L, Array(1.0, 0.0), 1.0),
      (1L, Array(0.0, 2.0), 4.0),
      (2L, Array(0.5, 0.5), 0.5))
    val b = cents(
      (0L, Array(1.0, 0.0), 1.0),
      (1L, Array(3.0, 0.0), 9.0), // moved: now orthogonal to the probe
      (2L, Array(0.5, 0.5), 0.5))
    val probe = emb(0.0, 1.0)
    assert(ArgMaxCosine.compute(probe, 1.0, a, false, false) == 1L)
    // same thread, immediately after: must reflect B, not A's stale decode
    assert(ArgMaxCosine.compute(probe, 1.0, b, false, false) == 2L)
  }

  test("cache cannot alias two sets sharing EVERY id and norm but " +
      "differing in the embeddings (verify-on-hit)") {
    // the SemDedupIncrProps falsification class: equal ids, equal norms,
    // embeddings swapped — the id+norm prefilter key is identical by
    // construction, so only the full-content verify can tell them apart;
    // a stale hit would assign the probe against the WRONG quantizer
    val a = cents(
      (0L, Array(1.0, 0.0), 1.0),
      (1L, Array(0.0, 1.0), 1.0))
    val b = cents(
      (0L, Array(0.0, 1.0), 1.0),
      (1L, Array(1.0, 0.0), 1.0))
    val probe = emb(1.0, 0.0)
    assert(ArgMaxCosine.compute(probe, 1.0, a, false, false) == 0L)
    // same thread, immediately after: B swaps the embeddings under the
    // SAME prefilter key — the answer must flip
    assert(ArgMaxCosine.compute(probe, 1.0, b, false, false) == 1L)
    assert(ArgMaxCosine.compute(probe, 1.0, a, false, false) == 0L)
  }

  test("dimension mismatch throws instead of silently truncating the dot") {
    val cs = cents((0L, Array(1.0, 0.0, 0.0), 1.0))
    val e = intercept[IllegalArgumentException] {
      ArgMaxCosine.compute(emb(1.0, 0.0), 1.0, cs, false, false)
    }
    assert(e.getMessage.contains("dim"))
  }

  test("empty centroid array returns -1 (joins drop the row)") {
    assert(ArgMaxCosine.compute(emb(1.0), 1.0, new GenericArrayData(Array.empty[Any]), false, false) == -1L)
  }
}
