package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Managed-parquet write with the stale-location guard every persisted
  * layout in this library shares (bucketed facts, the IVF index, the
  * near-dup pair table): DROP the catalog entry, delete a
  * dropped-but-undeleted warehouse directory left by a previous JVM, then
  * save — otherwise the CREATE fails with LOCATION_ALREADY_EXISTS. */
object ManagedTable {

  def write(df: DataFrame, table: String,
      partitionCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(warehouse), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // Cluster by the partition column before a dynamic-partition write:
    // without it every writer task emits a file into every partition it
    // touches — T tasks × P partitions files (measured: the 320-cluster
    // IVF assignment table landed as 10,161 files for 49k rows, and the
    // LISTING + open cost dominated every downstream read). One shuffle
    // at ingest buys ~1 file per partition forever after — the compaction
    // every production dynamic-partition writer does.
    val clustered = partitionCol.fold(df)(p =>
      df.repartition(org.apache.spark.sql.functions.col(p)))
    val w = clustered.write.mode(SaveMode.Overwrite).format("parquet")
    partitionCol.fold(w)(p => w.partitionBy(p)).saveAsTable(table)
  }

  /** Table-name-safe tag for a fixture dir. */
  def tag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")

  private val memo = scala.collection.concurrent
    .TrieMap[String, java.util.concurrent.CompletableFuture[Any]]()

  /** Run `build` AT MOST ONCE per key per JVM; concurrent callers block on
    * the winner's result instead of racing a second build.
    * `TrieMap.getOrElseUpdate` only guarantees one VALUE wins — the thunk
    * itself can still run twice concurrently, and two simultaneous
    * `write()`s for the same table race on DROP TABLE + directory delete +
    * saveAsTable and can corrupt the artifact. `putIfAbsent` on a
    * CompletableFuture elects exactly one builder; a failed build clears
    * the slot so a later call can retry (its concurrent waiters see the
    * failure, not a hang). */
  def once[A](key: String)(build: => A): A = {
    val mine = new java.util.concurrent.CompletableFuture[Any]()
    memo.putIfAbsent(key, mine) match {
      case None =>
        try mine.complete(build)
        catch {
          case e: Throwable =>
            memo.remove(key, mine)
            mine.completeExceptionally(e)
            throw e
        }
        mine.join().asInstanceOf[A]
      case Some(winner) => winner.join().asInstanceOf[A]
    }
  }

  /** One-time-per-JVM memoized persist: builds and saves `table` the first
    * time this (app, table) pair is seen, then returns the catalog read —
    * the shared economics of every persisted artifact here (bucketed
    * facts, IVF index, near-dup pairs/clusters/ranks): the expensive
    * derivation is a one-time ingest decision, the reads are the
    * workload. `build` is by-name so memoized hits never construct the
    * plan at all; the first build holds a per-(app, table) lock ([[once]])
    * so concurrent first readers cannot double-write the artifact. */
  def persisted(spark: org.apache.spark.sql.SparkSession, table: String,
      partitionCol: Option[String] = None)(
      build: => DataFrame): DataFrame = {
    once(s"${spark.sparkContext.applicationId}/$table") {
      write(build, table, partitionCol); table
    }
    spark.table(table)
  }

  /** MAINTENANCE-WINDOW physical rewrite of a persisted per-document
    * artifact (postings/doclen, band signatures, fingerprints, IVF
    * assignment): drop the expired rows FROM THE TABLE ITSELF — snapshot
    * the pruned rows ([[graft.ops.Dedup.expireRows]]' broadcast
    * anti-join; Spark cannot overwrite its own input in place), then
    * overwrite the table under the same name and layout.
    *
    * This is the amortized twin of serve-time expiry: applying the
    * anti-join per query is right for a fresh TTL batch, but it is a
    * standing per-query tax that grows with the expired set; after the
    * rewrite, serve plans read the index as-is — post-rewrite serve cost
    * equals the never-expired baseline (receipt in SCALE.md). Same
    * operational contract as any compaction: run between queries (the
    * reference's TTL is likewise a maintenance-window merge), and
    * re-running with the same expiry is an idempotent no-op rewrite. */
  /** Cheap order-independent identity of an id set — what the `_rwret`
    * maintenance builders pin their memoized rewrite to: the physical
    * table copy is pruned of ONE specific expired set, so a later call
    * in the same JVM with a DIFFERENT set must fail loudly instead of
    * silently serving the first call's survivors (the once key alone
    * cannot distinguish them, and re-running the rewrite on the
    * already-pruned copy would compound the two sets). Count + summed
    * per-id hash over the distinct ids (XOR-folded — order-independent
    * and overflow-free under ANSI, where a BIGINT sum of 64-bit hashes
    * throws) — collision odds are the 64-bit birthday bound, and a
    * collision needs the COUNTS equal too. */
  def idSetFingerprint(expiredIds: DataFrame, idCol: String): String = {
    import org.apache.spark.sql.functions._
    val r = expiredIds.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col(idCol))), lit(0L)).as("h")).head()
    s"${r.getLong(0)}_${r.getLong(1)}"
  }

  /** Assert a memoized maintenance rewrite was built for THIS expired
    * set ([[idSetFingerprint]]) — the fail-loud half of the `_rwret`
    * contract. */
  def requireSameExpiry(builtFp: String, fp: String, what: String): Unit =
    require(builtFp == fp,
      s"$what was already rewritten in this JVM for a DIFFERENT expired " +
      s"set (built $builtFp, requested $fp); a physical rewrite is " +
      "per-expiry-set — use a separate dir, or restart the app")

  def rewriteExpired(spark: org.apache.spark.sql.SparkSession,
      table: String, idCol: String, expiredIds: DataFrame,
      partitionCol: Option[String] = None): Unit = {
    val pruned = graft.ops.Dedup
      .expireRows(spark.table(table), idCol, expiredIds)
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    write(pruned, table, partitionCol)
    graft.Snap.free(pruned)
    ()
  }
}
