package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.CandOut

/** The streaming-LSH parity invariant, driven to exhaustion on the pure
  * bucket transition ([[StatefulOps.bucketStep]] — the exact function
  * `lshCandidatesStream` folds per micro-batch): for ANY id multiset and
  * ANY partitioning of it into arrival chunks (the micro-batch
  * boundaries), the union of emissions must be EXACTLY the set of
  * unordered distinct-id pairs sharing the bucket — no pair missing, no
  * duplicate emission, orientation canonical — and the final state must
  * be the distinct id set. This is the order/boundary-independence the
  * end-to-end `minhashParity` gate row asserts on real corpora, proven
  * here across thousands of adversarial partitionings (duplicates inside
  * a chunk, re-arrivals across chunks, empty chunks, singleton buckets).
  */
object LshBucketProps extends Properties("LshBucket") {

  // ids from a small domain → heavy duplicate/re-arrival pressure
  private val genIds: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 12L))

  // random chunking of the arrival sequence, preserving order
  private val genChunked: Gen[List[List[Long]]] = for {
    ids <- genIds
    cuts <- Gen.listOfN(ids.length, Gen.prob(0.3))
  } yield {
    val out = List.newBuilder[List[Long]]
    var cur = List.newBuilder[Long]
    ids.zip(cuts).foreach { case (id, cut) =>
      cur += id
      if (cut) { out += cur.result(); cur = List.newBuilder[Long] }
    }
    out += cur.result()
    out.result()
  }

  private def replay(chunks: List[List[Long]]): (List[Long], Set[CandOut]) =
    chunks.foldLeft((List.empty[Long], Set.empty[CandOut])) {
      case ((state, emitted), chunk) =>
        val (next, out) = StatefulOps.bucketStep(state, chunk)
        // duplicate-free emission is part of the invariant: nothing this
        // chunk emits may have been emitted before
        out.foreach(p => assert(!emitted(p), s"duplicate emission $p"))
        (next, emitted ++ out)
    }

  property("emissions union to exactly the all-distinct-pairs set") =
    forAll(genChunked) { chunks =>
      val ids = chunks.flatten.distinct
      val expected = (for {
        a <- ids; b <- ids if a < b
      } yield CandOut(a, b)).toSet
      val (state, emitted) = replay(chunks)
      emitted == expected && state.toSet == ids.toSet &&
        state.length == ids.length // no duplicate ids retained in state
    }

  property("chunking is irrelevant: any two partitionings emit the same set") =
    forAll(genChunked) { chunks =>
      val flat = chunks.flatten
      val (_, asChunked) = replay(chunks)
      val (_, oneShot) = replay(List(flat))
      val (_, singletons) = replay(flat.map(List(_)))
      asChunked == oneShot && asChunked == singletons
    }

  property("pairs are canonically oriented (id_a < id_b)") =
    forAll(genChunked) { chunks =>
      replay(chunks)._2.forall(p => p.id_a < p.id_b)
    }
}
