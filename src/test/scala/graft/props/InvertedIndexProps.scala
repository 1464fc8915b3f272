package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase
import graft.ops.Search

/** Property invariants for the positional inverted index: on RANDOM
  * corpora, every index-path query must equal the direct text-scan
  * semantics computed independently on the driver — phrase counts,
  * conjunctive retrieval, and proximity pair counts. Each case builds a
  * fresh persisted index (unique memo key), so the build→read round trip
  * is exercised every time, not just the first.
  *
  * minSuccessful is lowered to 12: each case pays a real two-table
  * parquet write; a dozen random corpora over a 4-token vocabulary cover
  * the collision-heavy regime (every term in every shard's neighborhood,
  * repeated tokens, empty docs) that the fixture specs cannot.
  */
object InvertedIndexProps extends Properties("InvertedIndex") {
  lazy val spark = SparkTestBase.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val caseId = new java.util.concurrent.atomic.AtomicLong()

  private val vocab = Seq("a", "b", "c", "d")
  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 8)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def toks(s: String): Vector[String] =
    s.trim.split("\\s+").filter(_.nonEmpty).toVector

  private def mkDocs(texts: List[String]) = {
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i + 1L, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
  }

  property("phraseIndexed == direct consecutive scan") =
    forAll(Gen.listOfN(12, genDoc)) { texts =>
      val dir = s"/tmp/iiprop_${caseId.incrementAndGet()}"
      val phrase = Seq("a", "b")
      val got = Search.phraseIndexed(spark, dir, mkDocs(texts), phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = texts.zipWithIndex.flatMap { case (s, i) =>
        val t = toks(s)
        val n = (0 to t.size - phrase.size)
          .count(k => phrase.indices.forall(j => t(k + j) == phrase(j)))
        if (n > 0) Some((i + 1L) -> n.toLong) else None
      }.toMap
      got == want
    }

  property("booleanAndIndexed == direct conjunctive scan") =
    forAll(Gen.listOfN(12, genDoc)) { texts =>
      val dir = s"/tmp/iiprop_${caseId.incrementAndGet()}"
      val terms = Seq("a", "b", "c")
      val got = Search.booleanAndIndexed(spark, dir, mkDocs(texts), terms)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = texts.zipWithIndex.flatMap { case (s, i) =>
        val t = toks(s)
        if (terms.forall(t.contains)) Some((i + 1L) -> t.size.toLong) else None
      }.toMap
      got == want
    }

  property("proximityIndexed == direct windowed pair count") =
    forAll(Gen.listOfN(12, genDoc)) { texts =>
      val dir = s"/tmp/iiprop_${caseId.incrementAndGet()}"
      val w = 2
      val got = Search.proximityIndexed(spark, dir, mkDocs(texts), "a", "b", w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = texts.zipWithIndex.flatMap { case (s, i) =>
        val t = toks(s)
        val pa = t.indices.filter(t(_) == "a")
        val pb = t.indices.filter(t(_) == "b")
        val n = pa.map(x => pb.count(y => math.abs(y - x) <= w)).sum
        if (n > 0) Some((i + 1L) -> n.toLong) else None
      }.toMap
      got == want
    }
  property("prefixTermsIndexed == direct tokenize scan") =
    forAll(Gen.listOfN(12, genDoc)) { texts =>
      val dir = s"/tmp/iiprop_${caseId.incrementAndGet()}"
      // vocab is a..d; prefix "a" matches exactly the term "a"
      val got = Search.prefixTermsIndexed(spark, dir, mkDocs(texts), "a")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
      val perDoc = texts.map(toks)
      val df = perDoc.count(_.contains("a")).toLong
      val ctf = perDoc.map(_.count(_ == "a").toLong).sum
      val want = if (df > 0) List(("a", df, ctf)) else Nil
      got == want
    }

  property("moreLikeThisIndexed == brute-force rarity-weighted overlap") =
    forAll(Gen.listOfN(10, genDoc)) { texts =>
      val dir = s"/tmp/iiprop_${caseId.incrementAndGet()}"
      val probe = 1L
      val got = Search.moreLikeThisIndexed(spark, dir, mkDocs(texts), probe, k = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      val sets = texts.zipWithIndex.map { case (s, i) => (i + 1L, toks(s).toSet) }.toMap
      val probeSet = sets(probe)
      val df = probeSet.map(t => t -> sets.values.count(_.contains(t)).toLong).toMap
      val want = sets.toList
        .filter { case (id, s) => id != probe && (s & probeSet).nonEmpty }
        .map { case (id, s) =>
          val shared = (s & probeSet).toList
          (id, shared.size.toLong, shared.map(t => 1000000000L / df(t)).sum)
        }
        .sortBy { case (id, _, score) => (-score, id) }
      got == want
    }

}
