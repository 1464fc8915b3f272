package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestBase, Tables}

class AnomalySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("rateAnomalies: every flagged hour exceeds the threshold; raising it shrinks the set") {
    val ev = Tables.events(spark, SparkTestBase.sfDir)
    val at2 = Anomaly.rateAnomalies(ev, 2.0).collect()
    val at3 = Anomaly.rateAnomalies(ev, 3.0).collect()
    assert(at2.nonEmpty, "fixture should contain some >2-sigma hours")
    at2.foreach(r => assert(math.abs(r.getAs[Double]("z")) > 2.0))
    assert(at3.length <= at2.length)
    val k2 = at2.map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("hr"))).toSet
    val k3 = at3.map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("hr"))).toSet
    assert(k3.subsetOf(k2))
  }
}
