package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift tripwire — intentionally named to sort FIRST so a
  * driver-side regeneration of `/root/testdata` is a one-line diagnosis,
  * not a 25-suite archaeology dig (the round-6 nanos→micros switch cost an
  * entire round).
  *
  * For every fixture table this asserts (a) the NORMALIZED schema exactly
  * as the rest of the engine expects it out of [[Tables]], naming any
  * drifted column and its old→new type in the failure message, and (b) a
  * one-row read, so physical-decode errors also surface here first.
  *
  * `events.ts` is asserted POST-normalization (TimestampType): the loader
  * itself accepts three physical shapes (INT64 nanos, micros NTZ, micros
  * UTC) and throws a "fixture drift" error naming any fourth.
  */
class AAFixtureDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  for ((name, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$name: normalized schema and one-row read") {
      val df = Tables.table(spark, dir, name)
      val got = df.schema.map(f => f.name -> f.dataType)
      val gotMap = got.toMap
      val drift = cols.flatMap { case (c, t) =>
        gotMap.get(c) match {
          case None => Some(s"column '$c' MISSING (expected $t)")
          case Some(g) if g != t => Some(s"column '$c' drifted: expected $t, fixture now decodes as $g")
          case _ => None
        }
      } ++ gotMap.keySet.diff(cols.map(_._1).toSet).toSeq.sorted
        .map(c => s"column '$c' UNEXPECTED (new in fixture, type ${gotMap(c)})")
      assert(drift.isEmpty,
        s"\nFIXTURE DRIFT in $dir/$name.parquet —\n  ${drift.mkString("\n  ")}\n" +
          "If the driver regenerated /root/testdata, update Tables/this spec first.")
      assert(df.limit(1).count() == 1L, s"$name: could not read a single row")
    }
  }
}
