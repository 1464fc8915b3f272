package graft.props

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase
import graft.logs.{LogQuery, LogQueryParams, LogSchema}

/** Property-based invariants (SURVEY §5.3): random log batches → query
  * soundness/completeness/bounds; random RFC3339 strings → parse chain;
  * random token sets → signature laws. Pure ScalaCheck `Properties` (sbt
  * runs these alongside the ScalaTest suites).
  */
object LogQueryProps extends Properties("LogQuery") {
  lazy val spark = SparkTestBase.spark

  private val genTs: Gen[Timestamp] = Gen.choose(
    Timestamp.valueOf("2023-06-01 00:00:00").getTime,
    Timestamp.valueOf("2024-06-01 00:00:00").getTime).map(new Timestamp(_))

  private val genLog: Gen[(Timestamp, String, String)] = for {
    ts <- genTs
    svc <- Gen.oneOf("api", "db", "auth")
    lvl <- Gen.oneOf("INFO", "WARN", "ERROR", "DEBUG")
  } yield (ts, svc, lvl)

  property("flagship soundness, completeness, limit, ordering") =
    forAll(Gen.listOfN(60, genLog)) { rows =>
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(
        rows.map { case (ts, svc, lvl) => Row(ts, svc, lvl, "m", "{}", "", "") }.asJava,
        LogSchema.schema)
      val from = Timestamp.valueOf("2023-09-01 00:00:00")
      val to = Timestamp.valueOf("2024-03-01 00:00:00")
      val p = LogQueryParams("api", from, to, level = Some("ERROR"), limit = 10)
      val got = LogQuery.flagship(df, p).collect()
      val expected = rows.filter { case (ts, svc, lvl) =>
        svc == "api" && lvl == "ERROR" && !ts.before(from) && ts.before(to)
      }
      val tss = got.map(_.getAs[Timestamp]("ts").getTime)
      (got.length == math.min(expected.size, 10)) &&
        got.forall { r =>
          val ts = r.getAs[Timestamp]("ts")
          r.getAs[String]("service") == "api" && r.getAs[String]("level") == "ERROR" &&
            !ts.before(from) && ts.before(to)
        } &&
        tss.zip(tss.drop(1)).forall { case (a, b) => a >= b }
    }

  private val genFrac = Gen.choose(0, 9).flatMap(n =>
    if (n == 0) Gen.const("")
    else Gen.listOfN(n, Gen.choose(0, 9)).map(ds => "." + ds.mkString))
  private val genOffset: Gen[String] = Gen.oneOf(
    Gen.const("Z"),
    for {
      sign <- Gen.oneOf("+", "-")
      h <- Gen.choose(0, 13)
      m <- Gen.oneOf(0, 15, 30, 45)
    } yield f"$sign$h%02d:$m%02d")

  property("RFC3339 parse: any offset/fraction form maps to the right ms instant") =
    forAll(Gen.listOfN(25, for {
      epochSec <- Gen.choose(1600000000L, 1800000000L)
      frac <- genFrac
      off <- genOffset
    } yield (epochSec, frac, off))) { specs =>
      import scala.jdk.CollectionConverters._
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      val inputs = specs.map { case (sec, frac, off) =>
        val zone = java.time.ZoneOffset.of(if (off == "Z") "+00:00" else off)
        val local = java.time.OffsetDateTime.ofInstant(java.time.Instant.ofEpochSecond(sec), zone)
        (local.format(fmt) + frac + off, sec, frac)
      }
      val df = spark.createDataFrame(
        inputs.map(i => Row(i._1, "s", "l", "m", Map.empty[String, String], "", "")).asJava,
        LogSchema.wireSchema)
      val got = LogSchema.normalize(df).select(col("ts")).collect().map(_.getTimestamp(0))
      inputs.zip(got).forall { case ((_, sec, frac), ts) =>
        val fracMs = if (frac.isEmpty) 0L else frac.drop(1).padTo(3, '0').take(3).toLong
        ts.getTime == sec * 1000L + fracMs
      }
    }
}

object DedupProps extends Properties("Dedup") {
  lazy val spark = SparkTestBase.spark

  property("minhash: length k; identical texts → identical signatures") =
    forAll(Gen.nonEmptyListOf(Gen.identifier)) { words =>
      import spark.implicits._
      val doc = words.mkString(" ")
      val sigs = Seq(doc, doc).toDF("text")
        .select(graft.ops.Dedup.minHashSignature(
          graft.ops.Dedup.shingles(col("text"), 2), 32))
        .collect().map(_.getSeq[Long](0))
      sigs.forall(_.length == 32) && sigs(0) == sigs(1)
    }

  property("redaction: idempotent, and clean of raw pattern matches after one pass") =
    forAll(Gen.listOfN(6, Gen.oneOf(
      Gen.identifier,
      Gen.const("a@b.io"), Gen.const("10.1.2.3"), Gen.const("555-123-4567")))) { words =>
      import spark.implicits._
      val doc = words.mkString(" ")
      val once = Seq(doc).toDF("text")
        .select(graft.ops.Redaction.redact(col("text"))).collect().head.getString(0)
      val twice = Seq(once).toDF("text")
        .select(graft.ops.Redaction.redact(col("text"))).collect().head.getString(0)
      // a second pass finds nothing new: placeholders are fixed points
      once == twice
    }

  property("contamination: ratio bounded in [0,1]; self-contamination is total") =
    forAll(Gen.nonEmptyListOf(Gen.identifier).map(_.take(8))) { words =>
      import spark.implicits._
      val doc = words.mkString(" ")
      val d = Seq((1L, doc)).toDF("doc_id", "text")
      val self = graft.ops.Contamination.benchmarkOverlap(d, d).collect().head
      val other = graft.ops.Contamination.benchmarkOverlap(
        d, Seq((2L, "qq ww ee rr tt yy uu")).toDF("doc_id", "text")).collect().head
      Prop.all(
        self.getAs[Double]("contamination") == 1.0,
        other.getAs[Double]("contamination") >= 0.0,
        other.getAs[Double]("contamination") <= 1.0)
    }

  property("charset jaccard: reflexive 1.0, symmetric, bounded") =
    forAll(Gen.listOfN(4, Gen.asciiPrintableStr.suchThat(_.nonEmpty))) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val pairs = df.select(col("id").as("ia"), col("t").as("ta"))
        .crossJoin(df.select(col("id").as("ib"), col("t").as("tb")))
        .select(col("ia"), col("ib"),
          graft.functions.CharSetJaccard.charsetJaccard(col("ta"), col("tb")).as("j"))
        .collect()
      val m = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      Prop.all(
        texts.indices.forall(i => m((i.toLong, i.toLong)) == 1.0),
        texts.indices.forall(i => texts.indices.forall { j =>
          val v = m((i.toLong, j.toLong))
          v == m((j.toLong, i.toLong)) && v >= 0.0 && v <= 1.0
        }))
    }
}
