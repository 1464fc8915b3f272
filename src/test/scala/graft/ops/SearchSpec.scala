package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
  }

  // ── BM25 ──────────────────────────────────────────────────────────

  test("bm25: doc with more matching terms outranks doc with fewer") {
    val d = docs(Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha alpha beta noise noise noise"),
      (3L, "noise noise noise noise")))
    val out = Search.bm25TopK(d, Seq("alpha", "beta"), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // doc 3 has no terms → dropped; 2 (tf alpha=2 + beta) beats 1 on tf
    // but is longer — both must appear, and 3 must not
    assert(out.toSet == Set(1L, 2L))
  }

  test("bm25: rarer term dominates via idf (raw odds monotone)") {
    // 'rare' appears in 1 of 5 docs, 'common' in all 5; a doc with only
    // 'rare' must outrank a doc with only 'common' at equal tf and dl
    val d = docs(Seq(
      (1L, "rare pad1 pad2 pad3"),
      (2L, "common pad1 pad2 pad3"),
      (3L, "common x1 x2 x3"),
      (4L, "common y1 y2 y3"),
      (5L, "common z1 z2 z3")))
    val out = Search.bm25TopK(d, Seq("rare", "common"), k = 10)
      .select("doc_id", "score").collect()
    val score = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(score(1L) > score(2L))
  }

  test("bm25: length normalization — same tf, shorter doc scores higher") {
    val d = docs(Seq(
      (1L, "hit a b c"),
      (2L, "hit a b c d e f g h i j k l m n o p q r s t u v w x y z")))
    val out = Search.bm25TopK(d, Seq("hit"), k = 10)
      .select("doc_id", "score").collect()
    val score = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(score(1L) > score(2L))
  }

  test("bm25: deterministic under repartition (top-k hash-stable)") {
    val d = docs((0L until 60L).map(i =>
      (i, s"w$i spark " * (i.toInt % 5 + 1) + "tail")))
    val a = Search.bm25TopK(d, Seq("spark", "tail"), k = 20).collect().toSeq
    val b = Search.bm25TopK(d.repartition(7), Seq("spark", "tail"), k = 20)
      .collect().toSeq
    assert(a == b)
  }

  // ── bigram LM ─────────────────────────────────────────────────────

  test("lm: in-distribution held-out doc scores higher than OOV doc") {
    // train split = doc_id % 5 != 0; docs 0,5,10 are held out
    val base = (1L until 40L).filter(_ % 5 != 0).map(i => (i, "the cat sat on the mat"))
    val d = docs(base ++ Seq(
      (5L, "the cat sat on the mat"),       // pure in-distribution
      (10L, "zorp blag frum quux zib nok"))) // all-OOV
    val out = Search.bigramLmScore(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap // (n_oov, mean_ppb)
    assert(out(5L)._1 == 0L, "in-distribution doc has no OOV bigrams")
    assert(out(10L)._1 == 5L, "all 5 bigrams of the OOV doc are unseen")
    assert(out(5L)._2 > out(10L)._2, "in-distribution doc has higher mean prob")
  }

  test("lm: single-token and empty held-out docs are absent (no bigrams)") {
    val d = docs(Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b c"), (4L, "a b c"),
      (5L, "solo"), (10L, "  ")))
    val ids = Search.bigramLmScore(d).select("doc_id").collect().map(_.getLong(0))
    assert(!ids.contains(5L) && !ids.contains(10L))
  }

  test("lm: deterministic under repartition (fixed-point sums order-free)") {
    val d = docs((0L until 50L).map(i => (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7}")))
    val a = Search.bigramLmScore(d).collect().toSeq
    val b = Search.bigramLmScore(d.repartition(5)).collect().toSeq
    assert(a == b)
  }

  // ── log templates ─────────────────────────────────────────────────

  test("logTemplates: numeric runs mask to one template with correct stats") {
    import spark.implicits._
    val frame = Seq(
      ("conn from 10.0.0.1 port 443", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("conn from 10.0.0.2 port 80", 2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00")),
      ("conn from 192.168.7.9 port 8080", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00")),
      ("disk full on /dev/sda1", 3L, java.sql.Timestamp.valueOf("2024-01-01 00:03:00")))
      .toDF("msg", "group_key", "ts")
    val out = TextAnalysis.logTemplates(frame).collect()
    assert(out.length == 2)
    val top = out.head
    assert(top.getString(0) == "conn from <num>.<num>.<num>.<num> port <num>")
    assert(top.getLong(1) == 3L) // n_msgs
    assert(top.getLong(2) == 2L) // n_keys
    assert(top.getTimestamp(3) == java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(top.getTimestamp(4) == java.sql.Timestamp.valueOf("2024-01-01 00:02:00"))
  }

  test("logTemplates: prefix depth bounds template length") {
    import spark.implicits._
    val frame = Seq(
      ("a b c d e f g h i j k l", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("a b c d e f g h DIFFERENT tail here now", 2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01")))
      .toDF("msg", "group_key", "ts")
    val out = TextAnalysis.logTemplates(frame, prefixTokens = 8).collect()
    // identical first 8 tokens → ONE template of exactly 8 tokens
    assert(out.length == 1)
    assert(out.head.getString(0) == "a b c d e f g h")
    assert(out.head.getLong(1) == 2L)
  }

  // ── persisted inverted index ──────────────────────────────────────

  test("bm25TopKIndexed: identical rows to the scan path; shard-pruned scan") {
    val dir = graft.SparkTestBase.sfDir
    val d = graft.Tables.documents(spark, dir)
    val terms = Seq("spark", "vector", "merge")
    val scan = Search.bm25TopK(d, terms, k = 50).collect().toSeq
    val indexed = Search.bm25TopKIndexed(spark, dir, d, terms, k = 50)
    assert(indexed.collect().toSeq == scan)
    // the postings scan must carry the shard partition filter — the
    // whole point of the term-sharded layout is pruning 64 → ≤ |terms|
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("shard"), s"no shard pruning in plan:\n$plan")
  }

  test("bm25TopKIncremental: base index ∪ delta batch equals the full scan") {
    val dir = graft.SparkTestBase.sfDir
    val d = graft.Tables.documents(spark, dir)
    val terms = Seq("spark", "vector", "merge")
    val scan = Search.bm25TopK(d, terms, k = 50).collect().toSeq
    // df/N/Σdl recompose from disjoint halves, so scores are
    // bit-identical to the full rebuild — any split must work
    val incr = Search.bm25TopKIncremental(spark, dir,
      d.filter(org.apache.spark.sql.functions.col("doc_id") % 7 =!= 0),
      d.filter(org.apache.spark.sql.functions.col("doc_id") % 7 === 0),
      terms, k = 50)
    assert(incr.collect().toSeq == scan && scan.nonEmpty)
  }

  test("hybridRrfTopKIndexed: identical rows to the scan-leg fusion") {
    val dir = graft.SparkTestBase.sfDir
    val d = graft.Tables.documents(spark, dir)
    val e = graft.Tables.embeddings(spark, dir)
    val terms = Seq("spark", "vector", "merge")
    val scan = Search.hybridRrfTopK(d, e, terms, probeId = 7L,
      nCand = 100, k = 20).collect().toSeq
    val indexed = Search.hybridRrfTopKIndexed(spark, dir, d, e, terms,
      probeId = 7L, nCand = 100, k = 20)
    assert(indexed.collect().toSeq == scan && scan.nonEmpty)
    // the sparse leg must ride the shard-pruned postings, not the corpus
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("shard"), s"no shard pruning in plan:\n${plan.take(1200)}")
  }

  test("booleanAndIndexed: equals the direct conjunctive scan") {
    val dir = graft.SparkTestBase.sfDir
    val d = graft.Tables.documents(spark, dir)
    val terms = Seq("spark", "vector", "merge")
    val toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
    val cols = col("doc_id") ::
      coalesce(size(toks), lit(0)).cast("long").as("dl") ::
      terms.map(t => size(filter(toks, tk => tk === t)).as(s"n_$t")).toList
    val direct = d
      .select(cols: _*)
      .filter(terms.map(t => col(s"n_$t") > 0).reduce(_ && _))
      .select(col("doc_id"), col("dl"))
      .orderBy(col("doc_id"))
      .collect().toSeq
    val indexed = Search.booleanAndIndexed(spark, dir, d, terms)
      .collect().toSeq
    assert(indexed == direct && direct.nonEmpty)
  }

  test("phraseIndexed: hand-checked occurrences, overlaps and repeated terms") {
    val d = docs(Seq(
      (1L, "a b a b a"),   // "a b" at 0,2 -> 2; "a b a" at 0,2 -> 2 (overlap)
      (2L, "b a b"),        // "a b" at 1 -> 1
      (3L, "a a b"),        // "a b" at 1 -> 1
      (4L, "b b b"),        // no "a b"
      (5L, "a")))           // too short
    val dir = "/tmp/phrasespec_fixture"
    val ab = Search.phraseIndexed(spark, dir, d, Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ab == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    val aba = Search.phraseIndexed(spark, dir, d, Seq("a", "b", "a")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aba == Map(1L -> 2L)) // overlapping starts 0 and 2 both count
  }

  test("snippetsIndexed: window slicing at both clamp edges") {
    val d = docs(Seq(
      (1L, "a b x y z"),            // hit at 0: left clamp -> "a b x y z"
      (2L, "p q r s a b t u v w"),  // hit at 4: full window p+1..s+b+3
      (3L, "x a b"),                // right clamp -> "x a b"
      (4L, "a b c a b")))           // two hits -> first one snips
    val dir = "/tmp/snippetspec_fixture"
    val out = Search.snippetsIndexed(spark, dir, d, Seq("a", "b"), context = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq(
      (1L, 1L, "a b x y z"),
      (2L, 1L, "q r s a b t u v"),
      (3L, 1L, "x a b"),
      (4L, 2L, "a b c a b")))
  }

  test("proximityIndexed: hand-checked pair counts, symmetric window") {
    val d = docs(Seq(
      (1L, "a x x b"),       // |3-0|=3 <= 3 -> 1 pair
      (2L, "a x x x b"),     // |4-0|=4 >  3 -> 0 pairs
      (3L, "b a b"),          // a@1: b@0 (1), b@2 (1) -> 2 pairs
      (4L, "a a b"),          // a@0,a@1 vs b@2 -> 2 pairs
      (5L, "a only here")))
    val dir = "/tmp/proximityspec_fixture"
    val out = Search.proximityIndexed(spark, dir, d, "a", "b", window = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("phraseIndexed: matches the direct consecutive-token scan on the fixture") {
    val dir = graft.SparkTestBase.sfDir
    val d = graft.Tables.documents(spark, dir)
    val toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
    val direct = d
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n_occ", size(filter(
        expr("sequence(1, greatest(size(t) - 1, 0))"),
        i => expr("t")(i - 1) === "query" && expr("t")(i) === "key"))
        .cast("long"))
      .filter(col("n_occ") > 0)
      .select(col("doc_id"), col("n_occ"))
      .orderBy(col("doc_id"))
      .collect().toSeq
    val indexed = Search.phraseIndexed(spark, dir, d, Seq("query", "key"))
      .collect().toSeq
    assert(indexed == direct && direct.nonEmpty)
  }

  test("hybridRrfTopK: fusion equals driver recomputation from the two legs") {
    val dir = graft.SparkTestBase.sfDir
    val d = graft.Tables.documents(spark, dir)
    val e = graft.Tables.embeddings(spark, dir)
    val terms = Seq("spark", "vector", "merge")
    // independent legs, ranked the same way the fusion ranks them
    val text = Search.bm25TopK(d, terms, k = 100)
      .select("doc_id").collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val vec = Similarity.bruteForceTopK(e, Seq(7L), 100)
      .select("vec_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (text.keySet ++ vec.keySet).toSeq.map { id =>
      val s = text.get(id).map(r => 1000000000L / (60L + r)).getOrElse(0L) +
        vec.get(id).map(r => 1000000000L / (60L + r)).getOrElse(0L)
      (id, s)
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    val out = Search.hybridRrfTopK(d, e, terms, probeId = 7L,
      nCand = 100, k = 20).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(out == expected)
  }

  test("hybridRrfTopK: a doc missing from one leg carries a null rank there") {
    val dir = graft.SparkTestBase.sfDir
    val d = graft.Tables.documents(spark, dir)
    val e = graft.Tables.embeddings(spark, dir)
    val rows = Search.hybridRrfTopK(d, e, Seq("spark", "vector", "merge"),
      probeId = 7L, nCand = 100, k = 20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val contrib =
        (if (r.isNullAt(1)) 0L else 1000000000L / (60L + r.getLong(1))) +
          (if (r.isNullAt(2)) 0L else 1000000000L / (60L + r.getLong(2)))
      assert(r.getLong(3) == contrib, s"row $r")
    }
  }

  test("bm25TopKIndexed: term matching no document scores like the scan path") {
    val dir = graft.SparkTestBase.sfDir
    val d = graft.Tables.documents(spark, dir)
    val terms = Seq("spark", "zzz_no_such_token_zzz")
    val scan = Search.bm25TopK(d, terms, k = 10).collect().toSeq
    val indexed =
      Search.bm25TopKIndexed(spark, dir, d, terms, k = 10).collect().toSeq
    assert(indexed == scan && scan.nonEmpty)
  }
  test("prefixTermsIndexed: df and corpus tf per matching vocabulary term") {
    val d = docs(Seq(
      (1L, "spark spark sort noise"),
      (2L, "sort stream noise"),
      (3L, "noise only")))
    val dir = "/tmp/prefixspec_fixture"
    val out = Search.prefixTermsIndexed(spark, dir, d, "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("sort", 2L, 2L), ("spark", 1L, 2L), ("stream", 1L, 1L)))
  }

  test("prefixTermsIndexed: matches a direct tokenize scan on the fixture") {
    val dir = graft.SparkTestBase.sfDir
    val d = graft.Tables.documents(spark, dir)
    val toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
    val direct = d
      .select(col("doc_id"), explode(toks).as("tok"))
      .filter(col("tok").startsWith("s"))
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("total_tf"))
      .orderBy(col("tok"))
      .collect().toSeq
    val indexed = Search.prefixTermsIndexed(spark, dir, d, "s").collect().toSeq
    assert(indexed == direct && direct.nonEmpty)
  }

  test("moreLikeThisIndexed: rarity-weighted shared-term scores, probe excluded") {
    val d = docs(Seq(
      (1L, "rare common x"),
      (2L, "rare common y"),
      (3L, "common z w"),
      (4L, "q r s")))
    val dir = "/tmp/mltspec_fixture"
    val out = Search.moreLikeThisIndexed(spark, dir, d, probeId = 1L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // df(rare)=2, df(common)=3, df(x)=1 (counts include the probe)
    assert(out == Seq(
      (2L, 2L, 500000000L + 333333333L),
      (3L, 1L, 333333333L)))
  }

}
