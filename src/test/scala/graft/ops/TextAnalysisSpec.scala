package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import TextAnalysis._

  test("tokenCount: whitespace runs, blanks, empties") {
    import spark.implicits._
    val df = Seq("a b  c", "  ", "", "one", "tabs\tand\nnewlines here").toDF("text")
    val got = df.select(tokenCount(col("text"))).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(3L, 0L, 0L, 1L, 4L))
  }

  test("bpeish token count splits words, digits, punctuation runs") {
    import spark.implicits._
    val df = Seq("hello, world42!!").toDF("text")
    // [hello][,][world][42][!!]
    assert(df.select(bpeishTokenCount(col("text"))).collect().head.getLong(0) == 5L)
  }

  test("qualityMetrics: ratios on a known document") {
    import spark.implicits._
    val df = Seq((1L, "the cat sat.")).toDF("doc_id", "text")
    val r = qualityMetrics(df).collect().head
    assert(r.getAs[Long]("n_chars_actual") == 12L)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(math.abs(r.getAs[Double]("punct_ratio") - 1.0 / 12) < 1e-12)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 1.0 / 3) < 1e-12)
    // 10 non-space chars / 3 tokens
    assert(math.abs(r.getAs[Double]("mean_token_len") - 10.0 / 3) < 1e-12)
  }

  test("langId picks the language whose stopwords dominate") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat is on the mat and the dog", "en"),
      (2L, "el gato y la casa de los perros", "es"),
      (3L, "le chat et les maisons pour des chiens", "fr"),
      (4L, "der hund und die katze ist mit von", "de"))
      .toDF("doc_id", "text", "lang")
    val got = langId(df).collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de"))
  }

  test("fingerprint: order-sensitive, deterministic") {
    import spark.implicits._
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
    val fps = df.select(fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(1))
  }

  test("repetitionMetrics: diversity and repeated-phrase ratios") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam"),        // 1 distinct / 4; top token 4/4; top bigram "spam spam" 3/3
      (2L, "all words here are distinct"), // 5 distinct / 5; every count 1
      (3L, ""),                            // empty: zeros
      (4L, "one"))                         // single token: no bigrams
      .toDF("doc_id", "text")
    val got = repetitionMetrics(df).collect().map(r =>
      r.getLong(0) -> ((r.getAs[Long]("n_tokens"), r.getAs[Double]("distinct_ratio"),
        r.getAs[Double]("top_token_ratio"), r.getAs[Double]("top_bigram_ratio")))).toMap
    assert(got(1L) == ((4L, 0.25, 1.0, 1.0)))
    assert(got(2L) == ((5L, 1.0, 0.2, 0.25)))
    assert(got(3L) == ((0L, 0.0, 0.0, 0.0)))
    assert(got(4L) == ((1L, 1.0, 1.0, 0.0)))
  }

  test("spanDedup: duplicate document loses every span; unique doc keeps all") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),          // 2 spans of 5
      (2L, "a b c d e f g h i j"),          // exact duplicate → 0 kept
      (3L, "k l m n o"),                    // unique → kept
      (4L, "a b c d e zz yy xx ww vv"),     // shares span 0 with doc 1 only
      (5L, "   "))                          // blank → zero spans
      .toDF("doc_id", "text")
    val out = spanDedup(docs, width = 5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))).toMap
    assert(out(1L) == ((2L, 2L, 0L)))
    assert(out(2L) == ((2L, 0L, 2L)))
    assert(out(3L) == ((1L, 1L, 0L)))
    assert(out(4L) == ((2L, 1L, 1L)))
    assert(out(5L) == ((0L, 0L, 0L)))
  }

  test("spanDedup: first occurrence wins by (doc_id, span_idx) order") {
    import spark.implicits._
    // the same span appears twice INSIDE doc 1 (spans 0 and 1): only the
    // first position survives; doc 2's copy also drops
    val docs = Seq(
      (1L, "p q r s t p q r s t"),
      (2L, "p q r s t")).toDF("doc_id", "text")
    val out = spanDedup(docs, width = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_kept")).toMap
    assert(out(1L) == 1L && out(2L) == 0L)
  }

  test("gopherQualityFlags: each rule fires on its designed violator") {
    import spark.implicits._
    val longOk = (("the and of " * 20) + ("alpha beta gamma delta " * 10)).trim
    val docs = Seq(
      (1L, longOk),                                  // passes all rules
      (2L, "the of it"),                             // too short
      (3L, ("x " * 60).trim),                        // mean word len 1 < 3
      (4L, (("12345 " * 60) + "the of").trim))       // alpha frac ~0
      .toDF("doc_id", "text")
    val out = gopherQualityFlags(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("words_in_range") && !out(2L).getAs[Boolean]("keep"))
    assert(!out(3L).getAs[Boolean]("mean_len_ok") && !out(3L).getAs[Boolean]("keep"))
    assert(!out(4L).getAs[Boolean]("alpha_ok") && !out(4L).getAs[Boolean]("keep"))
  }

  test("sequencePacks: offsets stay under capacity, stream is gap-free") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),            // 3 tokens
      (2L, ("w " * 10).trim),   // 10 tokens → straddles the 8-cap boundary
      (3L, "x y"),              // 2
      (4L, "")).toDF("doc_id", "text")
    val out = Packing.sequencePacks(docs, capacity = 8L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // cum: 3, 13, 15, 15 ; starts: 0, 3, 13, 15 → packs 0, 0, 1, 1
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, 0L, 0L),
      (2L, 10L, 13L, 0L, 3L),
      (3L, 2L, 15L, 1L, 5L),
      (4L, 0L, 15L, 1L, 7L)))
    out.foreach { case (_, _, _, _, off) => assert(off >= 0 && off < 8) }
  }

  test("repetitionMetrics: case-insensitive token identity") {
    import spark.implicits._
    val df = Seq((1L, "Spam SPAM spam")).toDF("doc_id", "text")
    val r = repetitionMetrics(df).collect().head
    assert(r.getAs[Double]("distinct_ratio") == 1.0 / 3.0)
    assert(r.getAs[Double]("top_token_ratio") == 1.0)
  }

  test("chunkPlan: full coverage with overlap, short tail, empty docs dropped") {
    import spark.implicits._
    // 10 tokens, maxTokens=4, stride=3 → starts 1,4,7,10; lengths 4,4,4,1
    val text10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text10), (2L, "a b"), (3L, "  ")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkPlan(df, maxTokens = 4, stride = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("n_toks")))
    assert(out.filter(_._1 == 1L).toSeq ==
      Seq((1L, 0, 1L, 4L), (1L, 1, 4L, 4L), (1L, 2, 7L, 4L), (1L, 3, 10L, 1L)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 1L, 2L)))
    assert(!out.exists(_._1 == 3L)) // empty doc → no chunks
    // coverage law: every token index 1..10 falls inside ≥1 chunk
    val covered = out.filter(_._1 == 1L)
      .flatMap { case (_, _, s, n) => s until (s + n) }.toSet
    assert((1L to 10L).forall(covered))
  }

  test("charTrigramProfile: boundary trigrams counted, per-lang top-k") {
    import spark.implicits._
    val df = Seq((1L, "en", "aaab"), (2L, "en", "aaa"), (3L, "de", "xy"))
      .toDF("doc_id", "lang", "text")
    val r = TextAnalysis.charTrigramProfile(df, k = 2).collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[String]("trigram"), x.getAs[Long]("cnt")))
    // "aaab": aaa, aab; "aaa": aaa → aaa×2, aab×1; "xy" too short → dropped
    assert(r.toSeq == Seq(("en", "aaa", 2L), ("en", "aab", 1L)))
  }

  test("bpeMergePairs counts adjacent pairs, top-k ties lexicographic") {
    import spark.implicits._
    // "a b" appears 3× (across docs), "b a" 1×, "b c" 1×; the single-token
    // and empty docs contribute nothing.
    val df = Seq((1L, "a b c"), (2L, "a b a b"), (3L, "x"), (4L, "  "))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bpeMergePairs(df, k = 2).collect()
      .map(x => (x.getAs[String]("pair"), x.getAs[Long]("cnt")))
    assert(r.head == ("a b", 3L))
    assert(r(1)._2 == 1L && Set("b a", "b c")(r(1)._1))
    assert(r(1)._1 == "b a") // cnt tie 1==1 → lexicographic
  }
  test("repeatedNgramStats: duplicated windows counted, short docs dropped") {
    import spark.implicits._
    val d = Seq(
      (1L, "x y z"),   // bigrams: "x y" (dup with doc 2), "y z"
      (2L, "x y q"),   // bigrams: "x y" (dup), "y q"
      (3L, "a"),        // < n tokens -> no windows -> dropped
      (4L, "m m m"))   // "m m" twice WITHIN the doc -> both dup
      .map { case (id, t) => (id, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.repeatedNgramStats(d, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 500000000L),
      (2L, 2L, 1L, 500000000L),
      (4L, 2L, 2L, 1000000000L)))
  }

  test("repeatedNgramStats is deterministic under repartition") {
    import spark.implicits._
    val d = (0L until 80L).map(i => (i, s"w${i % 9} w${(i + 1) % 9} w${(i + 2) % 9} tail$i", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    assert(TextAnalysis.repeatedNgramStats(d, 2).collect().toSeq ==
      TextAnalysis.repeatedNgramStats(d.repartition(13), 2).collect().toSeq)
  }

}
