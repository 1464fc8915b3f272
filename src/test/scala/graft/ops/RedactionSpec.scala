package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RedactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("redact replaces emails, IPs and phone runs with typed tokens") {
    val d = docs(
      1L -> "mail jane.doe+x@corp.example.org or call 555-123-4567 from 192.168.0.1 now",
      2L -> "clean text with no pii at all")
    val got = d.select(col("doc_id"), Redaction.redact(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "mail <EMAIL> or call <PHONE> from <IP> now")
    assert(got(2L) == "clean text with no pii at all")
  }

  test("piiReport counts per category and flags changed rows only") {
    val d = docs(
      1L -> "a@b.co and c@d.org plus 10.0.0.1 and 10.0.0.2 and 555-000-1234",
      2L -> "nothing here")
    val rows = Redaction.piiReport(d, col("text")).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Long]("n_emails") == 2 && r1.getAs[Long]("n_ips") == 2 &&
      r1.getAs[Long]("n_phones") == 1 && r1.getAs[Boolean]("changed"))
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getAs[Long]("n_emails") == 0 && !r2.getAs[Boolean]("changed"))
  }

  test("an IP inside an email host is consumed by the email pass") {
    val d = docs(1L -> "x@10.0.0.1.example.com done")
    val got = Redaction.redact(col("text"))
    val s = d.select(got).collect().head.getString(0)
    assert(s == "<EMAIL> done", s)
  }

  test("withPlantedPii plants on every third doc and leaves others alone") {
    import spark.implicits._
    val d = Seq((0L, "zero"), (1L, "one"), (3L, "three"))
      .toDF("doc_id", "text")
    val planted = d.select(col("doc_id"), Redaction.withPlantedPii(d).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(planted(0L).contains("user0@example.com") && planted(0L).endsWith(" zero"))
    assert(planted(3L).contains("user3@example.com"))
    assert(planted(1L) == "one")
    // and the planted text redacts fully
    val red = d.select(Redaction.redact(Redaction.withPlantedPii(d))).collect()
      .map(_.getString(0)).find(_.contains("<EMAIL>")).get
    assert(red.contains("<IP>") && red.contains("<PHONE>"))
    assert(!red.contains("example.com") && !red.contains("10.0."))
  }
}
