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
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
    partitionCol.fold(w)(p => w.partitionBy(p)).saveAsTable(table)
  }

  /** Table-name-safe tag for a fixture dir. */
  def tag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")
}
