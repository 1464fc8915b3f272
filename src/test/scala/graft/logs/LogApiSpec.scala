package graft.logs

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LogApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def t(s: String) = Timestamp.from(java.time.Instant.parse(s))

  private lazy val logs = {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Row(t("2024-01-10T00:00:00Z"), "api", "INFO", "a", """{"user":"jane"}""", "", ""),
      Row(t("2024-01-11T00:00:00Z"), "api", "ERROR", "b", "{}", "", ""))
    spark.createDataFrame(rows.asJava, LogSchema.schema)
  }

  test("V2: missing service rejected") {
    assert(LogApi.parseParams(Map()).isLeft)
    assert(LogApi.parseParams(Map("service" -> "")).isLeft)
  }

  test("V3: from/to must parse RFC3339; offsets accepted") {
    val bad = LogApi.parseParams(Map("service" -> "api", "from" -> "not-a-time"))
    assert(bad == Left("invalid from: must be RFC3339"))
    val ok = LogApi.parseParams(Map(
      "service" -> "api",
      "from" -> "2024-01-01T00:00:00Z",
      "to" -> "2024-02-01T01:00:00+01:00"))
    assert(ok.isRight)
    assert(ok.toOption.get.to == t("2024-02-01T00:00:00Z"))
  }

  test("V4: limit defaults to 100, rejects non-positive and junk") {
    assert(LogApi.parseParams(Map("service" -> "api")).toOption.get.limit == 100)
    assert(LogApi.parseParams(Map("service" -> "api", "limit" -> "0")).isLeft)
    assert(LogApi.parseParams(Map("service" -> "api", "limit" -> "abc")).isLeft)
  }

  test("V5: from after to rejected") {
    assert(LogApi.parseParams(Map(
      "service" -> "api",
      "from" -> "2024-03-01T00:00:00Z",
      "to" -> "2024-01-01T00:00:00Z")).isLeft)
  }

  test("V6: a slow query is cancelled at the timeout") {
    import org.apache.spark.sql.functions._
    // a scan whose every row takes ~1s: 60 rows on 4 cores ≫ the 2s budget
    val slowUdf = udf { (ts: Timestamp) => Thread.sleep(1000L); ts }
    val slow = logs.sparkSession.range(60)
      .select(
        slowUdf(lit(t("2024-01-10T00:00:00Z"))).as("ts"),
        lit("api").as("service"), lit("INFO").as("level"), lit("m").as("msg"),
        lit("{}").as("attrs"), lit("").as("trace_id"), lit("").as("span_id"))
    val t0 = System.nanoTime()
    val res = LogApi.query(slow, Map(
      "service" -> "api",
      "from" -> "2024-01-01T00:00:00Z",
      "to" -> "2024-02-01T00:00:00Z"), timeoutMs = 2000L)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // a timeout is a SERVER-side failure (Go maps the DB context deadline
    // to http.Error 500), not a parameter rejection
    assert(res == Left(LogApi.ServerError("query timed out after 2000 ms")))
    // returned at the deadline, not after the query's natural ~15s runtime
    assert(elapsedMs < 10000, s"timeout returned after $elapsedMs ms")
  }

  test("V7: envelope carries post-limit count and echoed params") {
    val res = LogApi.query(logs, Map(
      "service" -> "api",
      "from" -> "2024-01-01T00:00:00Z",
      "to" -> "2024-02-01T00:00:00Z",
      "limit" -> "1"))
    assert(res.isRight)
    val env = res.toOption.get
    assert(env.count == 1 && env.logs.length == 1)
    assert(env.query.service == "api" && env.query.limit == 1)
    // ts-desc: the newest row wins the limit
    assert(env.logs.head.getAs[String]("msg") == "b")
  }
}
