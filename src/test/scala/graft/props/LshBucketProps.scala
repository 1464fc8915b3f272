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

  // ── the BOUNDED-HORIZON transition ([[StatefulOps.timedBucketStep]]) ──
  // arrivals carry event times; the invariant gains a time window: over
  // ANY chronological chunking, emissions union to exactly
  // { (a, b) : 0 <= t_b - t_a <= horizon }, still duplicate-free, and
  // state never holds a member older than horizon behind the newest.

  private val Horizon = 10L

  // (id, ts) arrivals with ts drawn small → dense windows AND evictions;
  // ids unique per sequence (re-arrival handling is pinned separately)
  private val genTimed: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 24)
    ts <- Gen.listOfN(n, Gen.chooseNum(0L, 40L))
  } yield ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.sortBy(p => (p._2, p._1))

  private def chunkChrono(arr: List[(Long, Long)], cuts: List[Boolean]): List[List[(Long, Long)]] = {
    val out = List.newBuilder[List[(Long, Long)]]
    var cur = List.newBuilder[(Long, Long)]
    arr.zip(cuts).foreach { case (a, cut) =>
      cur += a
      if (cut) { out += cur.result(); cur = List.newBuilder[(Long, Long)] }
    }
    out += cur.result()
    out.result()
  }

  private val genTimedChunked: Gen[List[List[(Long, Long)]]] = for {
    arr <- genTimed
    cuts <- Gen.listOfN(arr.length, Gen.prob(0.3))
  } yield chunkChrono(arr, cuts)

  private def replayTimed(chunks: List[List[(Long, Long)]]): (List[(Long, Long)], Set[CandOut]) =
    chunks.foldLeft((List.empty[(Long, Long)], Set.empty[CandOut])) {
      case ((state, emitted), chunk) =>
        val (next, out) = StatefulOps.timedBucketStep(state, chunk, Horizon)
        out.foreach(p => assert(!emitted(p), s"duplicate emission $p"))
        (next, emitted ++ out)
    }

  property("timed: emissions are exactly the within-horizon pair set, any chunking") =
    forAll(genTimedChunked) { chunks =>
      val arr = chunks.flatten
      val expected = (for {
        (a, ta) <- arr; (b, tb) <- arr
        if a < b && math.abs(tb - ta) <= Horizon
      } yield CandOut(a, b)).toSet
      val (state, emitted) = replayTimed(chunks)
      val (_, oneShot) = replayTimed(List(arr))
      val maxTs = state.map(_._2).maxOption.getOrElse(0L)
      emitted == expected && oneShot == expected &&
        // eviction bound: nothing older than horizon behind the newest
        // SURVIVING member after the last processed arrival
        state.forall { case (_, t) => t >= maxTs - Horizon || {
          // members can only outlive the bound if no later arrival hit
          // their bucket — here everything is one bucket, so the newest
          // arrival's eviction pass must have dropped them
          val newestArrival = arr.map(_._2).maxOption.getOrElse(0L)
          t >= newestArrival - Horizon
        } }
    }

  // ── LATE delivery within a bounded watermark ──
  // the operator's real-world contract: arrivals may run behind the
  // stream's clock by up to `lateness` (what a watermark of that delay
  // admits), and the emission set must STILL be exactly the two-sided
  // within-horizon pair set — the round-9 eager eviction lost pairs
  // here, and the one-sided emission bound let a late arrival pair
  // beyond the horizon.

  private val Lateness = 6L

  /** Arrival sequences in PROCESSING order with bounded lateness: each
    * event time sits within `Lateness` of the running max. */
  private val genLateTimed: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 24)
    deltas <- Gen.listOfN(n, Gen.chooseNum(-Lateness, 8L))
  } yield {
    var tmax = 100L
    deltas.zipWithIndex.map { case (d, i) =>
      val t = tmax + d
      tmax = math.max(tmax, t)
      (i.toLong, t)
    }
  }

  private val genLateChunked: Gen[List[List[(Long, Long)]]] = for {
    arr <- genLateTimed
    cuts <- Gen.listOfN(arr.length, Gen.prob(0.3))
  } yield chunkChrono(arr, cuts) // chunker preserves processing order

  property("timed+late: watermark-admissible disorder still emits the exact two-sided horizon set") =
    forAll(genLateChunked) { chunks =>
      val arr = chunks.flatten
      val expected = (for {
        (a, ta) <- arr; (b, tb) <- arr
        if a < b && math.abs(tb - ta) <= Horizon
      } yield CandOut(a, b)).toSet
      val (_, emitted) = chunks.foldLeft((List.empty[(Long, Long)], Set.empty[CandOut])) {
        case ((state, acc), chunk) =>
          val (next, out) = StatefulOps.timedBucketStep(state, chunk, Horizon, Lateness)
          out.foreach(p => assert(!acc(p), s"duplicate emission $p"))
          (next, acc ++ out)
      }
      emitted == expected
    }

  property("timed: a re-arrival of a held id emits nothing new") =
    forAll(genTimedChunked) { chunks =>
      val arr = chunks.flatten
      // replay, then re-send the newest arrival again: no new emissions
      arr.lastOption.forall { last =>
        val (state, _) = replayTimed(chunks)
        val (next, out) = StatefulOps.timedBucketStep(state, Seq(last), Horizon)
        out.isEmpty && next.toSet == state.toSet
      }
    }
}
