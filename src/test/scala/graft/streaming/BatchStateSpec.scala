package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Direct pinning of the shared batch-state machinery both runnable
  * pipelines sit on ([[BatchState]]) — the invariants the pipeline specs
  * exercise only incidentally:
  *
  *  - READ-UNION PRESERVATION: any sequence of tiered folds leaves
  *    `state(before = N)` row-identical for every N above the fold;
  *  - the LADDER BOUND: after folding at cadence K over T batches, the
  *    per-sub directory count is ≤ K + log₂(T/K) + 2 and unit masses
  *    strictly increase with age;
  *  - REPLAY IDEMPOTENCE: re-running a completed fold changes nothing
  *    (no raw directories, no mergeable unit pair);
  *  - CRASH RECOVERY on both sides of the commit marker: a staged fold
  *    WITHOUT the marker is aborted (sources intact), a staged fold
  *    WITH the marker is completed (swap finished), and both shapes are
  *    invisible to state reads in the meantime.
  */
class BatchStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val Schema = "id BIGINT, v BIGINT"

  private def freshRoot(name: String): String = {
    val root = s"target/batchstate_spec/$name"
    BatchState.fs(spark, root)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    root
  }

  private def writeBatch(root: String, b: Long, rows: Range): Unit = {
    import spark.implicits._
    BatchState.write(rows.map(i => (b * 1000L + i, b)).toDF("id", "v"),
      root, "s", b)
  }

  private def rowsOf(root: String, before: Long): Set[(Long, Long)] =
    BatchState.state(spark, root, "s", before, Schema)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def dirIds(root: String): Seq[Long] =
    BatchState.batchDirs(spark, root, "s", Long.MaxValue)
      .map(_.split("batch=").last.toLong).sorted

  test("tiered folds preserve the read union and hold the ladder bound " +
      "over many cadences; a replayed fold is a no-op") {
    val k = 8
    for (t <- Seq(1, 7, 8, 9, 23, 64)) {
      val root = freshRoot(s"ladder_$t")
      var expected = Set.empty[(Long, Long)]
      (0 until t).foreach { b =>
        writeBatch(root, b.toLong, 0 until 3)
        expected ++= (0 until 3).map(i => (b * 1000L + i, b.toLong))
        if (b > 0 && b % k == 0)
          BatchState.tieredFold(spark, root, "s", b.toLong, Schema, identity)
        assert(rowsOf(root, Long.MaxValue) === expected,
          s"t=$t b=$b: fold must preserve the read union")
      }
      // final fold over everything committed, then the ladder claims
      BatchState.tieredFold(spark, root, "s", t.toLong, Schema, identity)
      assert(rowsOf(root, Long.MaxValue) === expected)
      val bound = k + (63 - java.lang.Long.numberOfLeadingZeros(
        math.max(1L, t.toLong / k))) + 2
      assert(dirIds(root).length <= bound,
        s"t=$t: ${dirIds(root).length} dirs > ladder bound $bound")
      // unit masses strictly increase with age
      val f = BatchState.fs(spark, root)
      val masses = dirIds(root).flatMap(id =>
        BatchState.unitLo(f, root, "s", id).map(lo => id - lo))
      assert(masses == masses.sorted.reverse,
        s"t=$t: unit masses must not increase toward the newest: $masses")
      // replay: an immediate second fold changes no directory
      val before = dirIds(root)
      BatchState.tieredFold(spark, root, "s", t.toLong, Schema, identity)
      assert(dirIds(root) === before, s"t=$t: replayed fold must no-op")
    }
  }

  test("crash recovery: a stage without the marker aborts; a staged " +
      "commit completes; neither shape is visible to reads") {
    import spark.implicits._
    val root = freshRoot("crash")
    (0L to 3L).foreach(b => writeBatch(root, b, 0 until 2))
    val all = rowsOf(root, Long.MaxValue)
    val f = BatchState.fs(spark, root)

    // crash BEFORE the marker: a bare _stage directory must be dropped
    // and the sources left untouched
    Seq((9L, 9L)).toDF("id", "v").write.parquet(s"$root/s/_stage")
    assert(rowsOf(root, Long.MaxValue) === all,
      "a stage directory must be invisible to state reads")
    BatchState.recoverFold(spark, root, "s")
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/s/_stage")))
    assert(rowsOf(root, Long.MaxValue) === all)
    assert(dirIds(root) === Seq(0L, 1L, 2L, 3L))

    // crash AFTER the marker: the staged union is the committed truth —
    // recovery must finish the swap exactly as the fold would have
    BatchState.state(spark, root, "s", 4L, Schema)
      .write.parquet(s"$root/s/_stage")
    val out = f.create(
      new org.apache.hadoop.fs.Path(s"$root/s/_stage_commit"), true)
    out.writeLong(4L); out.writeLong(0L); out.writeBoolean(false)
    out.close()
    BatchState.recoverFold(spark, root, "s")
    assert(dirIds(root) === Seq(3L),
      "recovery must complete the committed fold into batch=3")
    assert(rowsOf(root, Long.MaxValue) === all,
      "the completed fold must preserve the read union")
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/s/_stage_commit")))
  }

  test("a TORN commit marker aborts cleanly instead of wedging recovery") {
    val root = freshRoot("torn")
    (0L to 2L).foreach(b => writeBatch(root, b, 0 until 2))
    val all = rowsOf(root, Long.MaxValue)
    val f = BatchState.fs(spark, root)
    // simulate a crash mid-marker-write (pre-atomic-publish shape, or a
    // filesystem without atomic rename): empty marker + complete stage
    BatchState.state(spark, root, "s", 3L, Schema)
      .write.parquet(s"$root/s/_stage")
    f.create(new org.apache.hadoop.fs.Path(s"$root/s/_stage_commit"), true)
      .close() // zero bytes — readLong would throw
    BatchState.recoverFold(spark, root, "s")
    // aborted: both shapes gone, sources intact — and recovery is
    // callable again (not wedged)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/s/_stage")))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/s/_stage_commit")))
    assert(rowsOf(root, Long.MaxValue) === all)
    assert(dirIds(root) === Seq(0L, 1L, 2L))
    BatchState.recoverFold(spark, root, "s") // no-op
    assert(dirIds(root) === Seq(0L, 1L, 2L))
  }

  test("a unit demoted by a crashed in-place rewrite (lost sidecar) is " +
      "re-adopted by the next fold, not orphaned forever") {
    val root = freshRoot("orphan")
    // build two units: [0..3] and [4..5]
    (0L to 3L).foreach(b => writeBatch(root, b, 0 until 2))
    BatchState.tieredFold(spark, root, "s", 4L, Schema, identity)
    (4L to 5L).foreach(b => writeBatch(root, b, 0 until 2))
    BatchState.tieredFold(spark, root, "s", 6L, Schema, identity)
    val f = BatchState.fs(spark, root)
    val units = dirIds(root).filter(id =>
      BatchState.unitLo(f, root, "s", id).isDefined)
    assert(units.length >= 2, s"need two units, got $units")
    val older = units.head
    val origLo = BatchState.unitLo(f, root, "s", older).get
    // crash window: the rewrite overwrote the directory (sidecar gone)
    // before re-writing it
    f.delete(new org.apache.hadoop.fs.Path(
      s"$root/s/batch=$older/_unit_lo"), false)
    assert(BatchState.unitLo(f, root, "s", older).isEmpty)
    val all = rowsOf(root, Long.MaxValue)
    BatchState.tieredFold(spark, root, "s", 6L, Schema, identity)
    // re-adopted with its exact original span (units partition the id
    // axis), rows preserved, and the fold cascade still proceeds
    val adopted = dirIds(root).filter(id =>
      BatchState.unitLo(f, root, "s", id).isDefined)
    assert(adopted.nonEmpty)
    assert(rowsOf(root, Long.MaxValue) === all)
    val stillThere = dirIds(root).find(_ == older)
    stillThere.foreach { id =>
      assert(BatchState.unitLo(f, root, "s", id) === Some(origLo))
    }
  }

  test("rewriteDirPreservingUnit keeps the unit sidecar through an " +
      "in-place rewrite (a lost sidecar would demote the unit to raw)") {
    val root = freshRoot("sidecar")
    (0L to 4L).foreach(b => writeBatch(root, b, 0 until 2))
    BatchState.tieredFold(spark, root, "s", 5L, Schema, identity)
    val f = BatchState.fs(spark, root)
    val unitId = dirIds(root).max
    assert(BatchState.unitLo(f, root, "s", unitId).isDefined)
    BatchState.rewriteDirPreservingUnit(spark, root, "s",
      s"$root/s/batch=$unitId", df => df.filter(col("v") =!= 1L))
    assert(BatchState.unitLo(f, root, "s", unitId) === Some(0L))
    assert(rowsOf(root, Long.MaxValue) ===
      Set(0L, 2L, 3L, 4L).flatMap(b => (0 until 2).map(i => (b * 1000L + i, b))))
    // and the next fold still treats it as a unit: replay no-op
    val before = dirIds(root)
    BatchState.tieredFold(spark, root, "s", 5L, Schema, identity)
    assert(dirIds(root) === before)
  }
}
