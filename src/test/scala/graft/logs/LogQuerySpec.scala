package graft.logs

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LogQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def t(s: String) = Timestamp.from(java.time.Instant.parse(s))

  private lazy val logs = {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Row(t("2024-01-10T00:00:00Z"), "api", "INFO", "a", """{"user":"jane"}""", "", ""),
      Row(t("2024-01-11T00:00:00Z"), "api", "ERROR", "b", """{"user":"bob"}""", "", ""),
      Row(t("2024-01-12T00:00:00Z"), "api", "ERROR", "c", "{}", "", ""),
      Row(t("2024-01-12T00:00:00Z"), "db", "ERROR", "d", "{}", "", ""),
      Row(t("2024-02-01T00:00:00Z"), "api", "INFO", "e", "{}", "", ""))
    spark.createDataFrame(rows.asJava, LogSchema.schema)
  }

  test("validation: V2 service required, V4 limit positive, V5 from<=to") {
    val ok = LogQueryParams("api", t("2024-01-01T00:00:00Z"), t("2024-02-01T00:00:00Z"))
    assert(LogQuery.validate(ok).isRight)
    assert(LogQuery.validate(ok.copy(service = "")).isLeft)
    assert(LogQuery.validate(ok.copy(limit = 0)).isLeft)
    assert(LogQuery.validate(ok.copy(from = t("2024-03-01T00:00:00Z"))).isLeft)
  }

  test("flagship: service equality + half-open range, ts desc order") {
    val p = LogQueryParams("api", t("2024-01-10T00:00:00Z"), t("2024-02-01T00:00:00Z"))
    val got = LogQuery.flagship(logs, p).collect()
    // 2024-02-01 row excluded (half-open `ts < to`), db row excluded
    assert(got.map(_.getAs[String]("msg")).toSeq == Seq("c", "b", "a"))
  }

  test("flagship: optional level and JSON user filters") {
    val base = LogQueryParams("api", t("2024-01-01T00:00:00Z"), t("2024-03-01T00:00:00Z"))
    val lvl = LogQuery.flagship(logs, base.copy(level = Some("ERROR"))).collect()
    assert(lvl.map(_.getAs[String]("msg")).toSeq == Seq("c", "b"))
    val usr = LogQuery.flagship(logs, base.copy(user = Some("jane"))).collect()
    assert(usr.map(_.getAs[String]("msg")).toSeq == Seq("a"))
  }

  test("flagship: limit caps rows") {
    val p = LogQueryParams("api", t("2024-01-01T00:00:00Z"), t("2024-03-01T00:00:00Z"), limit = 2)
    assert(LogQuery.flagship(logs, p).count() == 2)
  }

  test("month predicate brackets the ts range") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val months = Seq("202312", "202401", "202402").toDF("month")
    val pred = LogQuery.monthPredicate(col("month"),
      t("2024-01-10T00:00:00Z"), t("2024-02-01T00:00:00Z"))
    // to is exclusive at exactly 2024-02-01T00:00, so 202402 not needed
    assert(months.filter(pred).collect().map(_.getString(0)).toSeq == Seq("202401"))
  }
}
