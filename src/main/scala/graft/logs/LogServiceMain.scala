package graft.logs

import org.apache.spark.sql.SparkSession

/** Runnable service assembly — the library-user's `cmd/server/main.go`
  * (main.go:24-96): env-driven config, the streaming micro-batcher, the
  * HTTP transport over live table reads, and signal-driven shutdown.
  *
  * Env (names mirror the reference where one exists):
  *  - `HTTP_PORT` (default 8080; reference HTTP_ADDR, main.go:26)
  *  - `LOG_TABLE_PATH` (default `target/log_service/table` — the
  *    DATABASE_URL analogue, main.go:28)
  *  - `LOG_INGEST_DIR` (optional): when set, a Structured Streaming
  *    file source watches this directory for wire-shaped JSON (RFC3339
  *    ts string + attrs map — [[LogSchema.wireSchema]]) and runs it
  *    through [[graft.streaming.LogStream.ingest]]; the file source
  *    stands in for the gRPC listener (SURVEY §2.1), the trigger is the
  *    100 ms batcher
  *  - `INGEST_MAX_DELAY_MS` (default 100; main.go:30)
  *
  * The HTTP server re-reads the table per request ([[LogHttpServer]]'s
  * provider contract), so rows the batcher lands are queryable on the
  * next request without restarting anything — the reference's
  * DB-mediated freshness. Ctrl-C/SIGTERM runs the JVM shutdown hook:
  * stop HTTP, stop the stream, stop Spark — main.go's signal.NotifyContext.
  */
object LogServiceMain {
  def main(args: Array[String]): Unit = {
    val httpPort = sys.env.getOrElse("HTTP_PORT", "8080").toInt
    val tablePath = sys.env.getOrElse("LOG_TABLE_PATH", "target/log_service/table")
    val ingestDir = sys.env.get("LOG_INGEST_DIR").filter(_.nonEmpty)
    val maxDelayMs = sys.env.getOrElse("INGEST_MAX_DELAY_MS", "100").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-log-service")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // an empty table must serve (and answer count 0), not crash the first
    // query — LogTable.read's explicit schema handles the no-files case,
    // but the path must exist for the file index
    new java.io.File(tablePath).mkdirs()

    val stream = ingestDir.map { dir =>
      new java.io.File(dir).mkdirs()
      graft.streaming.LogStream.ingest(
        spark.readStream.schema(LogSchema.wireSchema).json(dir),
        tablePath, s"$tablePath/_checkpoint", maxDelayMs)
    }

    val server = new LogHttpServer(
      () => LogTable.read(spark, tablePath), httpPort,
      LogApi.DefaultTimeoutMs).start()
    System.err.println(s"[log-service] http on ${server.port}, table $tablePath" +
      ingestDir.fold("")(d => s", ingesting $d"))

    val done = new java.util.concurrent.CountDownLatch(1)
    sys.addShutdownHook {
      server.stop()
      stream.foreach(_.stop())
      spark.stop()
      done.countDown()
    }
    done.await() // serve until SIGINT/SIGTERM
  }
}
