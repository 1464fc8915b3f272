package graft

/** DuckDB oracle SQL for the hash-sketch operators — exact replicas of the
  * native expressions ([[graft.functions.SimHash64]],
  * [[graft.functions.MinHashSig]], [[graft.functions.TokenFingerprint64]])
  * in portable SQL, so the approximate-dedup tier is hash-compared against
  * an independent engine rather than trusted on faith.
  *
  * Everything is built on three pieces of modular arithmetic DuckDB can do
  * exactly with HUGEINT (signed 128-bit) intermediates:
  *   - FNV-1a 64 over UTF-8 bytes: the byte expansion is derived from code
  *     points arithmetically (UTF-8 is a pure function of the code point),
  *     and the ×prime step fits HUGEINT because the prime is 40 bits.
  *   - wrapping 64×64 multiply via 32-bit limb split (each partial product
  *     is ≤ 2⁹⁶ < 2¹²⁷).
  *   - unsigned→signed reinterpretation to mirror JVM Long comparisons.
  *
  * The SQL is emitted fully inlined (no CREATE MACRO), one statement per
  * oracle, so it runs under any single-statement executor.
  */
object OracleSql {

  // ── splitmix64-derived affine-permutation constants (MinHashSig.params) ──

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def ulit(v: Long): String =
    s"CAST(${java.lang.Long.toUnsignedString(v)} AS UBIGINT)"

  /** `[a_0..a_{k-1}]` / `[b_0..b_{k-1}]` literals of the affine family. */
  private def paLiteral(k: Int): String =
    (0 until k).map(i => ulit(splitmix64(2L * i) | 1L)).mkString("[", ",", "]")
  private def pbLiteral(k: Int): String =
    (0 until k).map(i => ulit(splitmix64(2L * i + 1))).mkString("[", ",", "]")

  private val pow2Literal: String =
    (0 until 64).map(b => s"CAST(${BigInt(2).pow(b)} AS HUGEINT)").mkString("[", ",", "]")

  // ── inlined arithmetic building blocks ──

  private val M64 = "18446744073709551616" // 2^64

  /** UTF-8 bytes of a string, from code points (empty chars filtered so the
    * empty string yields an empty list, matching zero FNV iterations). */
  private def utf8bytes(s: String): String =
    s"""flatten(list_transform(list_filter(string_split($s, ''), c -> c <> ''), c -> (
       |    CASE WHEN unicode(c) < 128 THEN [unicode(c)]
       |         WHEN unicode(c) < 2048 THEN [192 + unicode(c) // 64, 128 + unicode(c) % 64]
       |         WHEN unicode(c) < 65536 THEN [224 + unicode(c) // 4096, 128 + (unicode(c) // 64) % 64, 128 + unicode(c) % 64]
       |         ELSE [240 + unicode(c) // 262144, 128 + (unicode(c) // 4096) % 64, 128 + (unicode(c) // 64) % 64, 128 + unicode(c) % 64]
       |    END)))""".stripMargin

  /** FNV-1a 64 of a string (graft.functions.SimHash64.fnv1a64). */
  private def fnv1a64(s: String): String =
    s"""list_reduce(list_prepend(${ulit(-3750763034362895579L)}, list_transform(${utf8bytes(s)}, x -> CAST(x AS UBIGINT))),
       |      (h, x) -> CAST(CAST((CAST(xor(h, x) AS HUGEINT) * 1099511628211) % $M64 AS HUGEINT) AS UBIGINT))""".stripMargin

  /** Wrapping 64×64 multiply `a*h mod 2^64` via 32-bit limb split. */
  private def mulmod64(a: String, h: String): String =
    s"""CAST(CAST((
       |      CAST(($a) % 4294967296 AS HUGEINT) * CAST($h AS HUGEINT)
       |      + (CAST(($a) // 4294967296 AS HUGEINT) * CAST($h AS HUGEINT) % 4294967296) * 4294967296
       |    ) % $M64 AS HUGEINT) AS UBIGINT)""".stripMargin

  private def addmod64(a: String, b: String): String =
    s"CAST(CAST((CAST($a AS HUGEINT) + CAST($b AS HUGEINT)) % $M64 AS HUGEINT) AS UBIGINT)"

  /** Reinterpret UBIGINT as the JVM's signed long. */
  private def u2s(v: String): String =
    s"CASE WHEN ($v) >= 9223372036854775808 THEN CAST(CAST($v AS HUGEINT) - $M64 AS BIGINT) ELSE CAST($v AS BIGINT) END"

  /** Reinterpret a signed BIGINT as UBIGINT (two's-complement). */
  private def s2u(v: String): String =
    s"CAST(CAST(CASE WHEN ($v) < 0 THEN CAST($v AS HUGEINT) + $M64 ELSE CAST($v AS HUGEINT) END AS HUGEINT) AS UBIGINT)"

  /** 64-bit rotate-left by a constant, via HUGEINT split (DuckDB's `<<`
    * would overflow rather than wrap). */
  private def rotl64(x: String, r: Int): String =
    s"""CAST(CAST((CAST(($x) % ${BigInt(2).pow(64 - r)} AS HUGEINT) * ${BigInt(2).pow(r)}
       | + CAST(($x) >> ${64 - r} AS HUGEINT)) AS HUGEINT) AS UBIGINT)""".stripMargin

  /** Whitespace tokens (Spark `split(trim(text), "\\s+")`). */
  private def wstoks(s: String): String = s"string_split_regex(trim($s), '\\s+')"

  // ── CTE chains ──

  /** MinHash+banding candidate/jaccard chain over relation `rel`
    * (doc_id, text): CTEs `toks, shingled, hrows, perms, mins, sigs,
    * banded, cand` replicating shingles(n=3) → MinHashSig(k=64) → band
    * slices → collision candidates. Band collision is checked as direct
    * signature-slice equality, which the Spark side's xxhash64(slice) join
    * key implies (hash collisions across different slices would only ever
    * ADD a candidate, and candidates are exact-jaccard-verified anyway). */
  private def minhashChain(rel: String, bands: Int): String = {
    val r = 64 / bands
    s"""toks AS (
       |  SELECT doc_id, ${wstoks("text")} AS tk FROM $rel),
       |shingled AS (
       |  SELECT doc_id,
       |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
       |         ELSE list_distinct(list_transform(range(1, len(tk) - 1),
       |                i -> array_to_string(tk[i:i+2], ' ')))
       |    END AS sh
       |  FROM toks),
       |hrows AS (
       |  SELECT doc_id, unnest(list_transform(sh, s -> ${fnv1a64("s")})) AS h FROM shingled),
       |perms AS (
       |  SELECT i, (${paLiteral(64)})[i + 1] AS pa, (${pbLiteral(64)})[i + 1] AS pb
       |  FROM unnest(range(0, 64)) AS t(i)),
       |mins AS (
       |  SELECT doc_id, i, MIN(${u2s(addmod64(mulmod64("pa", "h"), "pb"))}) AS m
       |  FROM hrows CROSS JOIN perms GROUP BY doc_id, i),
       |sigs AS (
       |  SELECT doc_id, list(m ORDER BY i) AS sig FROM mins GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, b2, sig[b2 * $r + 1 : b2 * $r + $r] AS slice
       |  FROM sigs, unnest(range(0, $bands)) AS t(b2)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b ON a.b2 = b.b2 AND a.slice = b.slice AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** Full pair query for [[graft.ops.Dedup.minHashPairs]]/ngramJaccardPairs.
    * `rel` points the chain at a substituted corpus CTE when a caller
    * rewrites documents first (the live-pipeline parity gate). */
  def minhashPairsSql(bands: Int, threshold: Double,
      rel: String = "documents"): String =
    s"""WITH ${minhashChain(rel, bands)},
       |jac AS (
       |  SELECT id_a, id_b,
       |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
       |  FROM cand JOIN shingled sa ON cand.id_a = sa.doc_id
       |            JOIN shingled sb ON cand.id_b = sb.doc_id)
       |SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= $threshold ORDER BY id_a, id_b""".stripMargin

  /** Replica of [[graft.ops.Dedup.minHashPairsCapped]] under the
    * template-flood scenario (q_dedup_minhash_capped): every
    * `floodMod`-th document's text is rewritten to a fixed template —
    * all its band buckets run hot — and the capped chain EXCLUDES
    * over-occupied buckets before candidate generation, so the flood
    * contributes no pairs while organic near-dups (whose buckets sit
    * under the cap) keep theirs. Bucket occupancy groups by the slice
    * itself where Spark groups by (band, xxhash64(slice)) — equal
    * counts barring a 2⁻⁶⁴ collision, the [[bandHealthSql]] argument. */
  def minhashPairsCappedSql(bands: Int = 16, threshold: Double = 0.5,
      cap: Int = 16, floodMod: Long = 11L,
      template: String = CappedFloodTemplate): String =
    s"""WITH docs2 AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % $floodMod = 0 THEN '$template'
       |         ELSE text END AS text
       |  FROM documents),
       |${minhashChain("docs2", bands)},
       |hot AS (
       |  SELECT b2, slice FROM banded GROUP BY b2, slice
       |  HAVING COUNT(*) > $cap),
       |cool AS (
       |  SELECT b.doc_id, b.b2, b.slice FROM banded b
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h
       |                    WHERE h.b2 = b.b2 AND h.slice = b.slice)),
       |cand2 AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM cool a JOIN cool b
       |    ON a.b2 = b.b2 AND a.slice = b.slice AND a.doc_id < b.doc_id),
       |jac AS (
       |  SELECT id_a, id_b,
       |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
       |  FROM cand2 JOIN shingled sa ON cand2.id_a = sa.doc_id
       |             JOIN shingled sb ON cand2.id_b = sb.doc_id)
       |SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** The capped row's flood text — shared with the Spark side so the
    * two corpora rewrite identically. */
  val CappedFloodTemplate: String =
    "please click here to unsubscribe from this mailing list and " +
    "update your notification preferences today"

  /** Replica of [[graft.ops.Dedup.bandIndexHealthGauge]]: the banding
    * chain runs over all documents, the ref/new arrival batches and the
    * standing index restrict it by the %-split predicates, and the two
    * signals (hottest-bucket share of batch docs; collision legs against
    * the index per batch doc) are integer-ppb — Spark groups buckets by
    * the slice's xxhash64 where this groups by the slice itself, equal
    * counts barring a 2⁻⁶⁴ hash collision. */
  def bandHealthSql(bands: Int = 16, deltaMod: Long = 7L,
      alertSharePpb: Long = 200000000L,
      alertCandPpb: Long = 16000000000L): String =
    s"""WITH ${minhashChain("documents", bands)},
       |refb AS (SELECT doc_id, b2, slice FROM banded
       |         WHERE doc_id % $deltaMod = 0 AND doc_id % 2 = 0),
       |newb AS (SELECT doc_id, b2, slice FROM banded
       |         WHERE doc_id % $deltaMod = 0 AND doc_id % 2 <> 0),
       |idx AS (SELECT doc_id, b2, slice FROM banded
       |        WHERE doc_id % $deltaMod <> 0),
       |nr AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM refb),
       |nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM newb),
       |tr AS (SELECT COALESCE(MAX(c), 0) AS mx FROM
       |         (SELECT COUNT(*) AS c FROM refb GROUP BY b2, slice)),
       |tn AS (SELECT COALESCE(MAX(c), 0) AS mx FROM
       |         (SELECT COUNT(*) AS c FROM newb GROUP BY b2, slice)),
       |cr AS (SELECT COUNT(*) AS hits FROM refb a
       |       JOIN idx b ON a.b2 = b.b2 AND a.slice = b.slice),
       |cn AS (SELECT COUNT(*) AS hits FROM newb a
       |       JOIN idx b ON a.b2 = b.b2 AND a.slice = b.slice)
       |SELECT nr.n AS n_ref, nn.n AS n_new,
       |  CAST(CASE WHEN nr.n = 0 THEN NULL
       |       ELSE tr.mx * 1000000000 // nr.n END AS BIGINT)
       |    AS ref_top_share_ppb,
       |  CAST(CASE WHEN nn.n = 0 THEN NULL
       |       ELSE tn.mx * 1000000000 // nn.n END AS BIGINT)
       |    AS new_top_share_ppb,
       |  CAST(CASE WHEN nr.n = 0 THEN NULL
       |       ELSE cr.hits * 1000000000 // nr.n END AS BIGINT)
       |    AS ref_cand_ppb,
       |  CAST(CASE WHEN nn.n = 0 THEN NULL
       |       ELSE cn.hits * 1000000000 // nn.n END AS BIGINT)
       |    AS new_cand_ppb,
       |  COALESCE(CASE WHEN nn.n = 0 THEN NULL
       |    ELSE (tn.mx * 1000000000 // nn.n > $alertSharePpb
       |      OR cn.hits * 1000000000 // nn.n > $alertCandPpb) END, FALSE)
       |    AS alert
       |FROM nr, nn, tr, tn, cr, cn""".stripMargin

  /** Full pair query for [[graft.ops.Dedup.simHashPairs]]: bit-vote SimHash
    * (votes strictly positive ⇔ set-bit count × 2 > token count), 4×16-bit
    * band candidates, hamming verify. */
  def simhashPairsSql(maxHamming: Int): String =
    s"""WITH hs AS (
       |  SELECT doc_id, list_transform(${wstoks("text")}, t -> ${fnv1a64("t")}) AS hl FROM documents),
       |sh AS (
       |  SELECT doc_id, ${voteSql("hl")} AS sh
       |  FROM hs)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  AND ((a.sh >> 0) & 65535 = (b.sh >> 0) & 65535
       |    OR (a.sh >> 16) & 65535 = (b.sh >> 16) & 65535
       |    OR (a.sh >> 32) & 65535 = (b.sh >> 32) & 65535
       |    OR (a.sh >> 48) & 65535 = (b.sh >> 48) & 65535)
       |WHERE bit_count(xor(a.sh, b.sh)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin

  /** splitmix64 finalizer of a UBIGINT expression `h`, fully inlined
    * (graft.functions.SimHash64.mix64) — the same modular-arithmetic
    * chain knnLshSql stages through CTEs, textually nested here because
    * it runs inside a list_transform lambda. */
  private def mix64sql(h: String): String = {
    val c1 = ulit(-7046029254386353131L) // 0x9e3779b97f4a7c15
    val c2 = ulit(-4658895280553007687L) // 0xbf58476d1ce4e5b9
    val c3 = ulit(-7723592293110705685L) // 0x94d049bb133111eb
    val z1 = addmod64(h, c1)
    val z2 = mulmod64(s"xor($z1, ($z1) >> 30)", c2)
    val z3 = mulmod64(s"xor($z2, ($z2) >> 27)", c3)
    s"xor($z3, ($z3) >> 31)"
  }

  /** The 64-bit bit-vote over a UBIGINT-list column `hl` (votes strictly
    * positive ⇔ set-bit count × 2 > token count) — shared by the 64- and
    * 128-bit simhash replicas. */
  private def voteSql(hl: String): String =
    s"""CAST(CAST(list_sum(list_transform(range(0, 64), b ->
       |      CASE WHEN 2 * len(list_filter($hl, h -> (h >> b) & 1 = 1)) > len($hl)
       |           THEN ($pow2Literal)[b + 1] ELSE CAST(0 AS HUGEINT) END)) AS HUGEINT) AS UBIGINT)""".stripMargin

  /** Full pair query for [[graft.ops.Dedup.simHash128Pairs]]: word 1 =
    * the FNV bit-vote, word 2 = the same vote over splitmix64-mixed token
    * hashes, candidates = agreement on ≥ 1 of the 4 32-bit bands of
    * (sh0, sh1) (hammingPairs128's banding, complete for hamming ≤ 3 and
    * a recall stage beyond — replicated band-for-band so both engines
    * draw the same candidate set), verify = summed popcount ≤ max. */
  def simhash128PairsSql(maxHamming: Int): String =
    s"""WITH hs AS (
       |  SELECT doc_id, list_transform(${wstoks("text")}, t -> ${fnv1a64("t")}) AS hl FROM documents),
       |hm AS (
       |  SELECT doc_id, hl, list_transform(hl, h -> ${mix64sql("h")}) AS ml FROM hs),
       |sh AS (
       |  SELECT doc_id, ${voteSql("hl")} AS sh0, ${voteSql("ml")} AS sh1 FROM hm)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  AND (a.sh0 & 4294967295 = b.sh0 & 4294967295
       |    OR (a.sh0 >> 32) = (b.sh0 >> 32)
       |    OR a.sh1 & 4294967295 = b.sh1 & 4294967295
       |    OR (a.sh1 >> 32) = (b.sh1 >> 32))
       |WHERE bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin

  /** The shared chain of the importance-weighting replicas
    * ([[graft.ops.Sampling.importanceWeights]] / `importanceMix`):
    * hashed unigram+bigram features (fnv1a64 bucketed mod B — a power of
    * two, so DuckDB's unsigned `%` and Spark's signed `& (B−1)` agree
    * bit-for-bit), Laplace-(+1) bucket probabilities in floor-divided
    * ppb, per-RAW-doc Σ(ppb_t − ppb_r). Ends at CTE `w`
    * (doc_id, n_feats, score_ppb). */
  private def importanceBase(targetSources: Seq[String], buckets: Int): String = {
    val ts = targetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, source, list_filter(${wstoks("text")}, x -> x <> '') AS tk
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, source, u.f AS f
       |  FROM t, unnest(list_concat(tk,
       |    CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
       |         ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1]) END)) AS u(f)),
       |o AS (SELECT doc_id, source, CAST((${fnv1a64("f")}) % $buckets AS BIGINT) AS b FROM f),
       |c AS (SELECT b,
       |        SUM(CASE WHEN source IN ($ts) THEN 1 ELSE 0 END) AS c_t,
       |        SUM(CASE WHEN source IN ($ts) THEN 0 ELSE 1 END) AS c_r
       |      FROM o GROUP BY b),
       |tot AS (SELECT SUM(c_t) AS n_t, SUM(c_r) AS n_r FROM c)""".stripMargin
  }

  private def importanceChain(targetSources: Seq[String], buckets: Int): String = {
    val ts = targetSources.map(s => s"'$s'").mkString(", ")
    importanceBase(targetSources, buckets) +
      s""",
       |p AS (SELECT b,
       |        (c_t + 1) * 1000000000 // (n_t + $buckets) AS ppb_t,
       |        (c_r + 1) * 1000000000 // (n_r + $buckets) AS ppb_r
       |      FROM c CROSS JOIN tot),
       |w AS (SELECT o.doc_id, COUNT(*) AS n_feats,
       |        CAST(SUM(ppb_t - ppb_r) AS BIGINT) AS score_ppb
       |      FROM o JOIN p USING (b)
       |      WHERE o.source NOT IN ($ts)
       |      GROUP BY o.doc_id)""".stripMargin
  }

  /** Fixed-point floor-log2 of a positive integer SQL expression `x`,
    * replicating [[graft.ops.Sampling.log2Fp]] bit for bit: exponent =
    * binary digit count − 1 (to_base — integer, never a float log),
    * mantissa top-8-bits index the SAME literal table the Spark plan
    * embeds (one copy lives in the `ltab` CTE the caller provides). */
  private def log2FpSql(x: String): String = {
    val bx = s"CAST($x AS BIGINT)"
    val e = s"(length(to_base($bx, 2)) - 1)"
    s"""($e * 1000000000 + (SELECT l FROM ltab)[CAST(
       |   (CASE WHEN $e >= 8 THEN $bx >> ($e - 8) ELSE $bx << (8 - $e) END)
       |   - 255 AS INT)])""".stripMargin
  }

  /** [[graft.ops.Sampling.importanceWeightsLlr]] — the exact-LLR score
    * Σ[L(c_t+1) − L(c_r+1)] − n_feats·[L(C_t+B) − L(C_r+B)] over the raw
    * counts (nothing floored before the log, no ×10⁹ multiply). */
  def importanceWeightsLlrSql(targetSources: Seq[String], buckets: Int): String = {
    val ts = targetSources.map(s => s"'$s'").mkString(", ")
    val table = graft.ops.Sampling.Log2Table.mkString("[", ", ", "]")
    importanceBase(targetSources, buckets) +
      s""",
       |ltab AS (SELECT $table AS l),
       |pb AS (SELECT b,
       |         ${log2FpSql("c_t + 1")} - ${log2FpSql("c_r + 1")} AS l_diff
       |       FROM c),
       |l0 AS (SELECT ${log2FpSql(s"n_t + $buckets")}
       |         - ${log2FpSql(s"n_r + $buckets")} AS l0 FROM tot),
       |w AS (SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       |        CAST(SUM(l_diff) AS BIGINT)
       |          - CAST(COUNT(*) AS BIGINT) * (SELECT l0 FROM l0) AS score_llr
       |      FROM o JOIN pb USING (b)
       |      WHERE o.source NOT IN ($ts)
       |      GROUP BY o.doc_id)
       |SELECT doc_id, n_feats, score_llr FROM w ORDER BY doc_id""".stripMargin
  }

  /** [[graft.ops.Sampling.importanceWeights]] — both engines truncate
    * integer division toward zero (Spark `div`, DuckDB `//`), so the
    * possibly-negative mean matches exactly. */
  def importanceWeightsSql(targetSources: Seq[String], buckets: Int): String =
    importanceChain(targetSources, buckets) +
      """
        |SELECT doc_id, n_feats, score_ppb,
        |  CAST(score_ppb // n_feats AS BIGINT) AS mean_ppb
        |FROM w ORDER BY doc_id""".stripMargin

  /** [[graft.ops.Sampling.importanceWeightsIncremental]] — the model
    * counts cover the FULL corpus (base ∪ delta merge exactly), the
    * emitted scores restrict to the delta's raw documents: the same
    * chain as [[importanceWeightsSql]] with the delta slice selected. */
  def importanceWeightsIncrSql(targetSources: Seq[String], buckets: Int,
      deltaMod: Long = 7L): String =
    importanceChain(targetSources, buckets) +
      s"""
        |SELECT doc_id, n_feats, score_ppb,
        |  CAST(score_ppb // n_feats AS BIGINT) AS mean_ppb
        |FROM w WHERE doc_id % $deltaMod = 0 ORDER BY doc_id""".stripMargin

  /** [[graft.ops.Sampling.importanceResample]] — ROW_NUMBER over the
    * identical (score_ppb DESC, doc_id) total order per source, quota =
    * ceil(n_src · keepPerMille / 1000) in integer arithmetic. */
  def importanceResampleSql(targetSources: Seq[String], buckets: Int,
      keepPerMille: Int): String =
    importanceChain(targetSources, buckets) +
      s"""
         |SELECT doc_id, source, score_ppb, rk FROM (
         |  SELECT w.doc_id, d.source, w.score_ppb,
         |    ROW_NUMBER() OVER (PARTITION BY d.source
         |      ORDER BY w.score_ppb DESC, w.doc_id) AS rk,
         |    COUNT(*) OVER (PARTITION BY d.source) AS n_src
         |  FROM w JOIN documents d USING (doc_id))
         |WHERE rk <= (n_src * $keepPerMille + 999) // 1000
         |ORDER BY source, rk""".stripMargin

  /** [[graft.ops.Sampling.importanceMix]]. */
  def importanceMixSql(targetSources: Seq[String], buckets: Int): String =
    importanceChain(targetSources, buckets) +
      """
        |SELECT d.source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN score_ppb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
        |FROM w JOIN documents d USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** The signed token-fingerprint expression over a `text` column —
    * h ← h·31 + fnv1a64(token), as a JVM Long. */
  private def fpExpr: String =
    u2s(s"""list_reduce(list_prepend(CAST(0 AS UBIGINT),
       |        list_transform(${wstoks("text")}, t -> ${fnv1a64("t")})),
       |      (h, f) -> ${addmod64(mulmod64("h", "31"), "f")})""".stripMargin)

  /** [[graft.ops.TextAnalysis.fingerprints]]: h ← h·31 + fnv1a64(token). */
  /** Full replica of [[graft.ops.Similarity.lshTopK]] — the previously
    * dark (rows-only) q_knn_lsh becomes hash-comparable: the splitmix64
    * hyperplane components of [[graft.functions.HyperplaneSig]] are
    * recomputed with exact HUGEINT modular arithmetic (seed
    * `t<<40 ^ b<<20 ^ i` has disjoint bit ranges, so the xor is a sum);
    * `(h >>> 11) / 2^53 * 2 - 1` is dyadic-rational-exact in IEEE doubles
    * on both engines, and `list_dot_product` folds sequentially exactly
    * like the native projection loop, so every sign bit — and therefore
    * every bucket, candidate, cosine and rank — matches bit-for-bit. */
  def knnLshSql(tables: Int = 12, bits: Int = 6, dim: Int = 64,
      nProbes: Int = 10, k: Int = 5): String = {
    val c1 = ulit(-7046029254386353131L) // 0x9e3779b97f4a7c15
    val c2 = ulit(-4658895280553007687L) // 0xbf58476d1ce4e5b9
    val c3 = ulit(-7723592293110705685L) // 0x94d049bb133111eb
    s"""WITH seeds AS (
       |  SELECT t, b, i,
       |    CAST(t AS UBIGINT) * 1099511627776 + CAST(b AS UBIGINT) * 1048576
       |      + CAST(i AS UBIGINT) AS seed
       |  FROM range(0, $tables) r1(t), range(0, $bits) r2(b), range(0, $dim) r3(i)),
       |s1 AS (SELECT t, b, i, ${addmod64("seed", c1)} AS z FROM seeds),
       |s2 AS (SELECT t, b, i, ${mulmod64("xor(z, z >> 30)", c2)} AS z FROM s1),
       |s3 AS (SELECT t, b, i, ${mulmod64("xor(z, z >> 27)", c3)} AS z FROM s2),
       |s4 AS (SELECT t, b, i, xor(z, z >> 31) AS z FROM s3),
       |comp AS (
       |  SELECT t, b,
       |    list(CAST(z >> 11 AS DOUBLE) / 9007199254740992.0 * 2.0 - 1.0 ORDER BY i) AS cvec
       |  FROM s4 GROUP BY t, b),
       |base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |sigs AS (
       |  SELECT vec_id, t,
       |    CAST(SUM(CASE WHEN list_dot_product(e, cvec) >= 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS sig
       |  FROM base CROSS JOIN comp GROUP BY vec_id, t),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS probe_id, a.vec_id AS vec_id
       |  FROM sigs p JOIN sigs a ON p.t = a.t AND p.sig = a.sig
       |  WHERE p.vec_id < $nProbes AND a.vec_id <> p.vec_id),
       |scored AS (
       |  SELECT c.probe_id, c.vec_id,
       |    list_dot_product(ea.e, ep.e) /
       |      (sqrt(list_dot_product(ea.e, ea.e)) * sqrt(list_dot_product(ep.e, ep.e))) AS cosine
       |  FROM cand c JOIN base ea ON c.vec_id = ea.vec_id JOIN base ep ON c.probe_id = ep.vec_id),
       |ranked AS (
       |  SELECT probe_id, vec_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT probe_id, vec_id, cosine, rank FROM ranked
       |WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin
  }

  /** Full replica of [[graft.ops.Similarity.ivfTopK]] — the last dark
    * (rows-only) query becomes hash-comparable end to end:
    *
    *  - centroid seeding: Spark's `xxhash64(vec_id)` (XXH64 of one 8-byte
    *    long, seed 42) replicated with the HUGEINT wrapping-multiply /
    *    rotate machinery, then the same (hash, vec_id) rank-and-limit;
    *  - Lloyd refinement: nearest-centroid assignment as a windowed argmax
    *    with identical tie semantics (cosine DESC, c_id — NaN-largest on
    *    both engines), and cluster means over 2⁻²⁰-quantized components
    *    summed as exact integers — every arithmetic step is exact or
    *    correctly-rounded IEEE, so refined centroids match bit-for-bit;
    *  - probe bucket selection and final exact-cosine top-k, with
    *    `list_dot_product`'s sequential fold matching the native kernels.
    */
  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** The shared IVF CTE chain (everything through the final per-vector
    * cluster assignment `a_f`, plus the refined centroid relation it
    * returns the name of) — used by both [[knnIvfSql]] and
    * [[semDedupPairsSql]], mirroring [[graft.ops.Similarity.ivfIndex]]. */
  /** `base` (vec_id, e DOUBLE[]) + the XXH64-of-one-long chain ending in
    * `xxh` (vec_id, xxh BIGINT) — Spark's `xxhash64(vec_id)` seed ranking
    * replicated in HUGEINT arithmetic. Shared by the IVF and PQ replicas.
    * `embExpr` substitutes the raw embedding column (the epoch-serve
    * replica shifts a slice of the corpus bit-exactly before the chain
    * sees it). */
  private def xxhCtes(embExpr: String = "embedding",
      baseRel: String = "embeddings"): String = {
    val xxP1 = ulit(-7046029288634856825L) // 0x9E3779B185EBCA87
    val xxP2 = ulit(-4417276706812531889L) // 0xC2B2AE3D27D4EB4F
    val xxP3 = ulit(1609587929392839161L)  // 0x165667B19E3779F9
    val xxP4 = ulit(-8796714831421723037L) // 0x85EBCA77C2B2AE63
    val xxInit = ulit(42L + 2870177450012600261L + 8L) // seed + PRIME5 + len
    s"""base AS (SELECT vec_id, ($embExpr)::DOUBLE[] AS e FROM $baseRel),
       |xu AS (SELECT vec_id, ${s2u("vec_id")} AS lu FROM base),
       |x1 AS (SELECT vec_id, ${mulmod64("lu", xxP2)} AS h FROM xu),
       |x2 AS (SELECT vec_id, ${rotl64("h", 31)} AS h FROM x1),
       |x3 AS (SELECT vec_id, ${mulmod64("h", xxP1)} AS h FROM x2),
       |x4 AS (SELECT vec_id, xor($xxInit, h) AS h FROM x3),
       |x5 AS (SELECT vec_id, ${addmod64(mulmod64(rotl64("h", 27), xxP1), xxP4)} AS h FROM x4),
       |x6 AS (SELECT vec_id, ${mulmod64("xor(h, h >> 33)", xxP2)} AS h FROM x5),
       |x7 AS (SELECT vec_id, ${mulmod64("xor(h, h >> 29)", xxP3)} AS h FROM x6),
       |xxh AS (SELECT vec_id, ${u2s("xor(h, h >> 32)")} AS xxh FROM x7)""".stripMargin
  }

  private def ivfChainCtes(nCentroids: Int, lloydIters: Int,
      trainWhere: String = "TRUE",
      embExpr: String = "embedding",
      baseRel: String = "embeddings"): (String, String) = {
    val q = "1048576.0" // 2^20 quantization of the cluster means
    /** One Lloyd round: assign `train` to `prev`'s centroids, emit `out`.
      * Seeding and refinement run over the TRAIN set only (`trainWhere` —
      * "TRUE" for the standard full-corpus chain; the incremental replica
      * restricts it to the base corpus, mirroring the FAISS
      * add-after-train contract) while the final assignment `a_f` covers
      * every vector. */
    def lloyd(prev: String, out: String): String =
      s"""asg_$out AS (
         |  SELECT vec_id, e, c_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ${cosSql("e", "c")} DESC, c_id) AS rn
         |  FROM train CROSS JOIN $prev),
         |a_$out AS (SELECT vec_id, e, c_id AS cluster FROM asg_$out WHERE rn = 1),
         |m_$out AS (
         |  SELECT cluster, i, CAST(SUM(CAST(floor(v * $q) AS HUGEINT)) AS DOUBLE) / (COUNT(*) * $q) AS m
         |  FROM (SELECT cluster, unnest(range(1, len(e) + 1)) AS i, unnest(e) AS v FROM a_$out)
         |  GROUP BY cluster, i),
         |$out AS (SELECT cluster AS c_id, list(m ORDER BY i) AS c FROM m_$out GROUP BY cluster)""".stripMargin
    val rounds = (1 to lloydIters)
      .map(i => lloyd(if (i == 1) "cents0" else s"cents${i - 1}", s"cents$i"))
      .mkString(",\n")
    val last = s"cents$lloydIters"
    val ctes =
      s"""${xxhCtes(embExpr, baseRel)},
         |train AS (SELECT vec_id, e FROM base WHERE $trainWhere),
         |cents0 AS (
         |  SELECT b.vec_id AS c_id, b.e AS c
         |  FROM train b JOIN xxh x ON b.vec_id = x.vec_id
         |  ORDER BY x.xxh, b.vec_id LIMIT $nCentroids),
         |$rounds,
         |asg_f AS (
         |  SELECT vec_id, e, c_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ${cosSql("e", "c")} DESC, c_id) AS rn
         |  FROM base CROSS JOIN $last),
         |a_f AS (SELECT vec_id, e, c_id AS cluster FROM asg_f WHERE rn = 1)""".stripMargin
    (ctes, last)
  }

  def knnIvfSql(nCentroids: Int = 32, nProbe: Int = 6, lloydIters: Int = 2,
      nProbes: Int = 10, k: Int = 5): String = {
    val (ctes, last) = ivfChainCtes(nCentroids, lloydIters)
    def cos(a: String, b: String): String = cosSql(a, b)
    s"""WITH $ctes,
       |probes AS (
       |  SELECT b.vec_id AS probe_id, b.e AS pe, cc.c_id AS cluster,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY ${cos("b.e", "cc.c")} DESC, cc.c_id) AS r
       |  FROM base b CROSS JOIN $last cc WHERE b.vec_id < $nProbes),
       |pl AS (SELECT probe_id, pe, cluster FROM probes WHERE r <= $nProbe),
       |scored AS (
       |  SELECT p.probe_id, a.vec_id, ${cos("a.e", "p.pe")} AS cosine
       |  FROM a_f a JOIN pl p ON a.cluster = p.cluster
       |  WHERE a.vec_id <> p.probe_id),
       |ranked AS (
       |  SELECT probe_id, vec_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT probe_id, vec_id, cosine, rank FROM ranked
       |WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin
  }

  /** Full replica of [[graft.ops.Similarity.semanticDedupPairs]]: the
    * bit-exact IVF chain above assigns every vector, then all same-cluster
    * pairs over the cosine threshold are emitted — `list_dot_product`'s
    * sequential fold matches the native kernel, so the pair set, cluster
    * ids and cosines hash-match exactly (no recall bound needed). */
  def semDedupPairsSql(nCentroids: Int = 32, lloydIters: Int = 2,
      threshold: Double = 0.4): String = {
    val (ctes, _) = ivfChainCtes(nCentroids, lloydIters)
    s"""WITH $ctes
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
       |  ${cosSql("a.e", "b.e")} AS cosine
       |FROM a_f a JOIN a_f b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |WHERE ${cosSql("a.e", "b.e")} >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Replica of [[graft.ops.Similarity.semanticDedupPairsCapped]] under
    * the embedding-flood scenario (q_semdedup_capped): every
    * `floodMod`-th vector's embedding is rewritten to the corpus-minimum
    * vector's — the collapsed-cluster shape a mode-collapsed upstream
    * encoder produces — the IVF chain trains and assigns over the
    * REWRITTEN corpus (the flood shapes the centroids on both engines
    * identically), and clusters whose occupancy exceeds `cap` are
    * excluded from pair generation. Hash-exact like
    * [[semDedupPairsSql]]: the policy itself is the tested contract. */
  def semDedupPairsCappedSql(nCentroids: Int = 32, lloydIters: Int = 2,
      threshold: Double = 0.4, cap: Int = 64, floodMod: Long = 5L): String = {
    val (ctes, _) = ivfChainCtes(nCentroids, lloydIters,
      embExpr = s"CASE WHEN vec_id % $floodMod = 0 THEN " +
        "(SELECT embedding FROM embeddings WHERE vec_id = " +
        "(SELECT MIN(vec_id) FROM embeddings)) ELSE embedding END")
    s"""WITH $ctes,
       |occ AS (SELECT cluster, COUNT(*) AS c FROM a_f GROUP BY cluster),
       |hot AS (SELECT cluster FROM occ WHERE c > $cap)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
       |  ${cosSql("a.e", "b.e")} AS cosine
       |FROM a_f a JOIN a_f b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |WHERE ${cosSql("a.e", "b.e")} >= $threshold
       |  AND a.cluster NOT IN (SELECT cluster FROM hot)
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Replica of [[graft.ops.Similarity.semanticDedupPairsIncremental]]:
    * the IVF chain TRAINS on the base corpus only (`vec_id % deltaMod
    * <> 0` — the add-after-train contract), assigns EVERY vector against
    * those centroids, and emits the same-cluster over-threshold pairs
    * that TOUCH a delta vector — exactly the rows the incremental path's
    * between-join ∪ delta self-join produces. Hash-exact like
    * [[semDedupPairsSql]]. */
  def semDedupPairsIncrSql(nCentroids: Int = 32, lloydIters: Int = 2,
      threshold: Double = 0.4, deltaMod: Long = 7L): String = {
    val (ctes, _) = ivfChainCtes(nCentroids, lloydIters,
      trainWhere = s"vec_id % $deltaMod <> 0")
    s"""WITH $ctes
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
       |  ${cosSql("a.e", "b.e")} AS cosine
       |FROM a_f a JOIN a_f b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |WHERE ${cosSql("a.e", "b.e")} >= $threshold
       |  AND (a.vec_id % $deltaMod = 0 OR b.vec_id % $deltaMod = 0)
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Replica of [[graft.ops.Similarity.semanticDedupPairsIncremental]]
    * with `expiredIds` set: the chain still TRAINS on the full base
    * corpus (centroids survive retention — the train-once contract), but
    * pairs may only touch surviving base vectors or arrivals. */
  def semDedupPairsRetireSql(nCentroids: Int = 32, lloydIters: Int = 2,
      threshold: Double = 0.4, deltaMod: Long = 7L,
      expireMod: Long = 11L): String = {
    val (ctes, _) = ivfChainCtes(nCentroids, lloydIters,
      trainWhere = s"vec_id % $deltaMod <> 0")
    val live = (v: String) =>
      s"($v % $deltaMod = 0 OR $v % $expireMod <> 0)"
    s"""WITH $ctes
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
       |  ${cosSql("a.e", "b.e")} AS cosine
       |FROM a_f a JOIN a_f b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |WHERE ${cosSql("a.e", "b.e")} >= $threshold
       |  AND (a.vec_id % $deltaMod = 0 OR b.vec_id % $deltaMod = 0)
       |  AND ${live("a.vec_id")} AND ${live("b.vec_id")}
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Replica of [[graft.streaming.ParityCheck.embDecontamParity]] — the
    * VECTOR decontamination gate: every `floodMod`-th ARRIVAL's
    * embedding is rewritten to the corpus-minimum vector with ONE
    * coordinate (`vec_id % dim`) sign-flipped — distinct bytes (the
    * exact tier keeps them; coordinate collisions beyond dim floods
    * byte-dup and dedup, modeled), near-identical cosine (the family
    * pairs), all exactly representable so both engines hold identical
    * float values. The chain trains on the BASE corpus (the pipeline's
    * epoch-0 init) and assigns the rewritten corpus; kept = base ∪
    * min-id-per-distinct-embedding arrivals not byte-equal to a base
    * vector (the vhash tier, restated on list equality); the repair cap
    * is the max occupancy over clusters with NO flood member (derived,
    * not assumed — a stray flood assignment shrinks the basis on both
    * engines identically); clusters over the cap quarantine and the
    * post-repair pair set is the cool-cluster cosine pairs, labels the
    * recursive closure over them. */
  def embDecontamParitySql(nCentroids: Int = 32, lloydIters: Int = 2,
      threshold: Double = 0.4, floodMod: Long = 3L): String = {
    val (ctes, _) = ivfChainCtes(nCentroids, lloydIters,
      trainWhere =
        "vec_id < (SELECT (MAX(vec_id) + 1) * 3 // 5 FROM embeddings)",
      baseRel = "docs_e")
    s"""WITH RECURSIVE
       |hh AS (SELECT (MAX(vec_id) + 1) * 3 // 5 AS h FROM embeddings),
       |mn AS (SELECT embedding AS m FROM embeddings
       |       WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)),
       |docs_e AS (
       |  SELECT e.vec_id,
       |    CASE WHEN e.vec_id >= hh.h AND e.vec_id % $floodMod = 0
       |         THEN list_transform(range(1, len(mn.m) + 1),
       |                j -> CASE WHEN j - 1 = e.vec_id % len(mn.m)
       |                          THEN -mn.m[j] ELSE mn.m[j] END)
       |         ELSE e.embedding END AS embedding
       |  FROM embeddings e, hh, mn),
       |$ctes,
       |karr AS (
       |  SELECT MIN(a.vec_id) AS vec_id
       |  FROM a_f a, hh WHERE a.vec_id >= hh.h
       |    AND NOT EXISTS (SELECT 1 FROM base b, hh h2
       |                    WHERE b.vec_id < h2.h AND b.e = a.e)
       |  GROUP BY a.e),
       |kept AS (SELECT b.vec_id FROM base b, hh WHERE b.vec_id < hh.h
       |         UNION ALL SELECT vec_id FROM karr),
       |ka AS (SELECT f.vec_id, f.e, f.cluster
       |       FROM a_f f JOIN kept k USING (vec_id)),
       |occ AS (SELECT cluster, COUNT(*) AS c FROM ka GROUP BY cluster),
       |fcl AS (SELECT DISTINCT cluster FROM ka, hh
       |        WHERE vec_id >= hh.h AND vec_id % $floodMod = 0),
       |capn AS (SELECT MAX(c) AS cap FROM occ
       |         WHERE cluster NOT IN (SELECT cluster FROM fcl)),
       |hot AS (SELECT occ.cluster FROM occ, capn WHERE occ.c > capn.cap),
       |liveu AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster
       |  FROM ka a JOIN ka b ON a.cluster = b.cluster
       |    AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.e", "b.e")} >= $threshold),
       |livep AS (SELECT id_a, id_b FROM liveu
       |          WHERE cluster NOT IN (SELECT cluster FROM hot)),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM livep
       |          UNION ALL SELECT id_b, id_a FROM livep),
       |reach(a, b) AS (
       |  SELECT vec_id, vec_id FROM kept
       |  UNION
       |  SELECT r.a, e2.dst FROM reach r JOIN edges e2 ON r.b = e2.src),
       |labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id
       |           FROM reach GROUP BY a)
       |SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM livep) AS n_pairs_after,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM liveu)
       |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM livep) AS n_dropped,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hot) AS hot_clusters,
       |  (SELECT CAST(COUNT(DISTINCT cluster_id) AS BIGINT) FROM labels)
       |    AS n_clusters,
       |  CAST(0 AS BIGINT) AS n_only_live,
       |  CAST(0 AS BIGINT) AS n_only_batch,
       |  true AS parity_ok""".stripMargin
  }

  /** The runnable vector pipeline's committed gauge-ledger row for the
    * SHIFTED batch (q_embstream_gauge): [[ivfDriftSql]]'s construction
    * under the epoch-handoff scenario's splits — centroids trained on
    * the BASE corpus only (the pipeline's epoch-0 init), reference leg =
    * the first arrival third raw (the init `refDelta`), new leg = the
    * second third under the bit-exact one-orthant shift. Hash-equality
    * pins the in-pipeline per-batch gauge's NUMBERS (not just its
    * boolean) to the independent replica. */
  def embStreamGaugeSql(nCentroids: Int = 32, lloydIters: Int = 2,
      retrainPpb: Long = 50000000L,
      collapsePpb: Long = 400000000L): String = {
    val (ctes, last) = ivfChainCtes(nCentroids, lloydIters,
      trainWhere = "vec_id % 7 <> 0",
      embExpr = epochShiftExpr)
    val refP = "vec_id % 7 = 0 AND vec_id % 3 = 0"
    val newP = "vec_id % 7 = 0 AND vec_id % 3 = 1"
    s"""WITH $ctes,
       |fit AS (
       |  SELECT a.vec_id, a.cluster,
       |    CAST(floor(${cosSql("a.e", "cc.c")} * 1000000000.0) AS BIGINT)
       |      AS csim_ppb
       |  FROM a_f a JOIN $last cc ON a.cluster = cc.c_id
       |  WHERE a.vec_id % 7 = 0 AND a.vec_id % 3 <> 2),
       |fr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(csim_ppb) AS s
       |       FROM fit WHERE $refP),
       |fn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(csim_ppb) AS s
       |       FROM fit WHERE $newP),
       |tr AS (SELECT MAX(c) AS mx FROM (
       |         SELECT COUNT(*) AS c FROM fit WHERE $refP GROUP BY cluster)),
       |tn AS (SELECT MAX(c) AS mx FROM (
       |         SELECT COUNT(*) AS c FROM fit WHERE $newP GROUP BY cluster))
       |SELECT fr.n AS n_ref, fn.n AS n_new,
       |  CAST(CASE WHEN fr.n = 0 THEN NULL ELSE fr.s // fr.n END AS BIGINT)
       |    AS ref_fit_ppb,
       |  CAST(CASE WHEN fn.n = 0 THEN NULL ELSE fn.s // fn.n END AS BIGINT)
       |    AS new_fit_ppb,
       |  CAST(CASE WHEN fr.n = 0 OR fn.n = 0 THEN NULL
       |       ELSE fr.s // fr.n - fn.s // fn.n END AS BIGINT) AS drift_ppb,
       |  CAST(CASE WHEN fr.n = 0 THEN NULL
       |       ELSE tr.mx * 1000000000 // fr.n END AS BIGINT)
       |    AS ref_top_share_ppb,
       |  CAST(CASE WHEN fn.n = 0 THEN NULL
       |       ELSE tn.mx * 1000000000 // fn.n END AS BIGINT)
       |    AS new_top_share_ppb,
       |  (COALESCE(CASE WHEN fr.n = 0 OR fn.n = 0 THEN NULL
       |      ELSE (fr.s // fr.n - fn.s // fn.n) > $retrainPpb END, FALSE)
       |    OR COALESCE(CASE WHEN fn.n = 0 THEN NULL
       |      ELSE tn.mx * 1000000000 // fn.n > $collapsePpb END, FALSE))
       |    AS retrain,
       |  CAST(0 AS BIGINT) AS hot_clusters
       |FROM fr, fn, tr, tn""".stripMargin
  }

  /** Replica of the POST-RETRAIN serving path — the closed drift →
    * retrain → serve loop ([[graft.ops.Similarity.ivfDriftGauge]] fires
    * → [[graft.ops.Similarity.ivfRetrainEpoch]] rebuilds under a fresh
    * epoch suffix → [[graft.ops.Similarity.semanticDedupPairsIncremental]]
    * resumes against the NEW epoch's centroids). Arrivals (vec_id % 7 =
    * 0) past the first third come from a SHIFTED distribution — each
    * dimension becomes float(abs(x) + 0.5), the same IEEE double-add and
    * float-round on both engines, so the shift is bit-exact. The first
    * two arrival thirds accumulate into the retrain corpus; the last
    * third is served incrementally against the retrained quantizer. The
    * replica simply TRAINS FROM SCRATCH on (base ∪ accumulated
    * arrivals): hash-equality therefore proves
    * incremental-serve-after-retrain ≡ full rebuild on the accumulated
    * corpus — the epoch handoff loses nothing. */
  /** The epoch-serve scenario's bit-exact arrival shift (float(abs(x) +
    * 0.5) per dimension — IEEE double add + float round on both engines)
    * applied to every arrival past the first third, and the predicate
    * naming the served third. Shared by the SemDeDup and kNN epoch
    * replicas. */
  private val epochShiftExpr: String =
    "CASE WHEN vec_id % 7 = 0 AND vec_id % 3 <> 0 THEN " +
      "list_transform(embedding, x -> " +
      "CAST(abs(CAST(x AS DOUBLE)) + 0.5 AS FLOAT)) " +
      "ELSE embedding END"
  private def epochServePred(v: String): String =
    s"($v % 7 = 0 AND $v % 3 = 2)"

  def semDedupEpochServeSql(nCentroids: Int = 32, lloydIters: Int = 2,
      threshold: Double = 0.4): String = {
    val (ctes, _) = ivfChainCtes(nCentroids, lloydIters,
      trainWhere = s"NOT ${epochServePred("vec_id")}",
      embExpr = epochShiftExpr)
    s"""WITH $ctes
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
       |  ${cosSql("a.e", "b.e")} AS cosine
       |FROM a_f a JOIN a_f b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |WHERE ${cosSql("a.e", "b.e")} >= $threshold
       |  AND (${epochServePred("a.vec_id")} OR ${epochServePred("b.vec_id")})
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** The kNN leg of the post-retrain serving path:
    * [[graft.ops.Similarity.ivfTopKPersisted]] pointed at the retrained
    * epoch index — probes and candidates both live in the accumulated
    * corpus (the served third is NOT in the index; it is the next batch
    * still in flight), trained from scratch here like
    * [[semDedupEpochServeSql]], so hash-equality proves kNN serving
    * resumed against the new epoch's centroids loses nothing vs a full
    * rebuild. */
  def knnIvfEpochServeSql(nCentroids: Int = 32, nProbe: Int = 6,
      lloydIters: Int = 2, nProbes: Int = 10, k: Int = 5): String = {
    val (ctes, last) = ivfChainCtes(nCentroids, lloydIters,
      trainWhere = s"NOT ${epochServePred("vec_id")}",
      embExpr = epochShiftExpr)
    s"""WITH $ctes,
       |probes AS (
       |  SELECT b.vec_id AS probe_id, b.e AS pe, cc.c_id AS cluster,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY ${cosSql("b.e", "cc.c")} DESC, cc.c_id) AS r
       |  FROM base b CROSS JOIN $last cc
       |  WHERE b.vec_id < $nProbes AND NOT ${epochServePred("b.vec_id")}),
       |pl AS (SELECT probe_id, pe, cluster FROM probes WHERE r <= $nProbe),
       |scored AS (
       |  SELECT p.probe_id, a.vec_id, ${cosSql("a.e", "p.pe")} AS cosine
       |  FROM a_f a JOIN pl p ON a.cluster = p.cluster
       |  WHERE a.vec_id <> p.probe_id AND NOT ${epochServePred("a.vec_id")}),
       |ranked AS (
       |  SELECT probe_id, vec_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT probe_id, vec_id, cosine, rank FROM ranked
       |WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin
  }

  /** Replica of [[graft.ops.Similarity.ivfDriftGauge]]: the IVF chain
    * trains on the base corpus only, assigns EVERY vector (a_f), and
    * each held-out batch's fit is the ppb-floored mean cosine of its
    * vectors to their ASSIGNED centroid — floor/sum/`//` all
    * integer-exact, the cosines bit-identical by the chain's standing
    * proof. Reference batch = even delta ids, new batch = odd. */
  def ivfDriftSql(nCentroids: Int = 32, lloydIters: Int = 2,
      deltaMod: Long = 7L, retrainPpb: Long = 50000000L,
      collapsePpb: Long = 400000000L): String = {
    val (ctes, last) = ivfChainCtes(nCentroids, lloydIters,
      trainWhere = s"vec_id % $deltaMod <> 0")
    s"""WITH $ctes,
       |fit AS (
       |  SELECT a.vec_id, a.cluster,
       |    CAST(floor(${cosSql("a.e", "cc.c")} * 1000000000.0) AS BIGINT)
       |      AS csim_ppb
       |  FROM a_f a JOIN $last cc ON a.cluster = cc.c_id
       |  WHERE a.vec_id % $deltaMod = 0),
       |fr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(csim_ppb) AS s
       |       FROM fit WHERE vec_id % 2 = 0),
       |fn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(csim_ppb) AS s
       |       FROM fit WHERE vec_id % 2 <> 0),
       |tr AS (SELECT MAX(c) AS mx FROM (
       |         SELECT COUNT(*) AS c FROM fit
       |         WHERE vec_id % 2 = 0 GROUP BY cluster)),
       |tn AS (SELECT MAX(c) AS mx FROM (
       |         SELECT COUNT(*) AS c FROM fit
       |         WHERE vec_id % 2 <> 0 GROUP BY cluster))
       |SELECT fr.n AS n_ref, fn.n AS n_new,
       |  CAST(CASE WHEN fr.n = 0 THEN NULL ELSE fr.s // fr.n END AS BIGINT)
       |    AS ref_fit_ppb,
       |  CAST(CASE WHEN fn.n = 0 THEN NULL ELSE fn.s // fn.n END AS BIGINT)
       |    AS new_fit_ppb,
       |  CAST(CASE WHEN fr.n = 0 OR fn.n = 0 THEN NULL
       |       ELSE fr.s // fr.n - fn.s // fn.n END AS BIGINT) AS drift_ppb,
       |  CAST(CASE WHEN fr.n = 0 THEN NULL
       |       ELSE tr.mx * 1000000000 // fr.n END AS BIGINT)
       |    AS ref_top_share_ppb,
       |  CAST(CASE WHEN fn.n = 0 THEN NULL
       |       ELSE tn.mx * 1000000000 // fn.n END AS BIGINT)
       |    AS new_top_share_ppb,
       |  (COALESCE(CASE WHEN fr.n = 0 OR fn.n = 0 THEN NULL
       |      ELSE (fr.s // fr.n - fn.s // fn.n) > $retrainPpb END, FALSE)
       |    OR COALESCE(CASE WHEN fn.n = 0 THEN NULL
       |      ELSE tn.mx * 1000000000 // fn.n > $collapsePpb END, FALSE))
       |    AS retrain
       |FROM fr, fn, tr, tn""".stripMargin
  }

  /** The WITH-body tail every live-parity replica shares: recursive
    * closure over `prs` (id_a, id_b) seeded from every `$idCol` of
    * `$rel`, min-labeling, then the single counts row (n_pairs_live
    * counts `prs` rows with id_b past the `hh.h` split — arrivals hold
    * the high ids, so with id_a < id_b that is exactly "touches an
    * arrival"). Callers define `prs` and `hh`. */
  private def closureCountsSql(rel: String, idCol: String,
      nAllName: String): String =
    s"""edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM prs
       |  UNION ALL SELECT id_b, id_a FROM prs),
       |reach(a, b) AS (
       |  SELECT $idCol, $idCol FROM $rel
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
       |labels AS (SELECT a AS id, MIN(b) AS cluster_id
       |           FROM reach GROUP BY a)
       |SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM labels) AS $nAllName,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM prs, hh
       |     WHERE prs.id_b >= hh.h) AS n_pairs_live,
       |  (SELECT CAST(COUNT(DISTINCT cluster_id) AS BIGINT) FROM labels)
       |    AS n_clusters,
       |  CAST(0 AS BIGINT) AS n_only_live,
       |  CAST(0 AS BIGINT) AS n_only_batch,
       |  true AS parity_ok""".stripMargin

  /** Replica of [[graft.streaming.ParityCheck.embeddingLiveParity]]'s
    * batch twin: the IVF chain trains on the standing corpus (vec_id
    * below the 3/5 split), assigns everything, emits all same-cluster
    * over-threshold pairs, and labels components by recursive closure —
    * the counts the wave replay must land on, with the parity booleans
    * stated as the expected literals (a Spark-side parity failure
    * mismatches them). */
  def semDedupLiveParitySql(nCentroids: Int = 32, lloydIters: Int = 2,
      threshold: Double = 0.4): String = {
    val (ctes, _) = ivfChainCtes(nCentroids, lloydIters,
      trainWhere =
        "vec_id < (SELECT (MAX(vec_id) + 1) * 3 // 5 FROM embeddings)")
    s"""WITH RECURSIVE $ctes,
       |hh AS (SELECT (MAX(vec_id) + 1) * 3 // 5 AS h FROM embeddings),
       |prs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM a_f a JOIN a_f b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.e", "b.e")} >= $threshold),
       |${closureCountsSql("base", "vec_id", "n_vectors")}""".stripMargin
  }

  /** Replica of [[graft.ops.Dedup.minHashPairsIncremental]]: the full
    * MinHash pair chain restricted to pairs touching the delta
    * (doc_id % deltaMod == 0) — signature corpus-independence makes the
    * incremental path exactly this slice. */
  def minhashPairsIncrSql(bands: Int = 16, threshold: Double = 0.5,
      deltaMod: Long = 7L): String =
    s"""WITH pairs AS (
       |${minhashPairsSql(bands, threshold)}
       |)
       |SELECT id_a, id_b, jaccard FROM pairs
       |WHERE id_a % $deltaMod = 0 OR id_b % $deltaMod = 0
       |ORDER BY id_a, id_b""".stripMargin

  /** Replica of [[graft.ops.Dedup.minHashPairsIncremental]] with
    * `expiredIds` set: the corpus is (base − expired) ∪ delta — expiry
    * of the per-document band/lookup rows is exact, so the incremental
    * path over the retired index equals the full chain over that corpus,
    * sliced to delta-touching pairs. */
  def minhashPairsRetireSql(bands: Int = 16, threshold: Double = 0.5,
      deltaMod: Long = 7L, expireMod: Long = 11L): String =
    s"""WITH pairs AS (
       |${minhashPairsSql(bands, threshold, rel =
        s"(SELECT * FROM documents WHERE doc_id % $deltaMod = 0 OR doc_id % $expireMod <> 0)")}
       |)
       |SELECT id_a, id_b, jaccard FROM pairs
       |WHERE id_a % $deltaMod = 0 OR id_b % $deltaMod = 0
       |ORDER BY id_a, id_b""".stripMargin

  /** Shared CTE prefix of the CAPPED runnable-pipeline rows
    * (q_docstream_capped_parity / q_docstream_gauge): the flood rewrite
    * (every `floodMod`-th ARRIVAL re-sends the corpus-minimum document —
    * byte-identical duplicate traffic), the full MinHash chain over the
    * rewritten corpus, and the history/arrival slices. */
  private def cappedPipelineBase(bands: Int, floodMod: Long): String =
    s"""hh AS (
       |  SELECT (MAX(doc_id) + 1) * 3 // 5 AS h FROM documents),
       |docs_sub AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id >= (SELECT h FROM hh) AND doc_id % $floodMod = 0
       |         THEN (SELECT text FROM documents
       |               WHERE doc_id = (SELECT MIN(doc_id) FROM documents))
       |         ELSE text END AS text
       |  FROM documents),
       |${minhashChain("docs_sub", bands)},
       |hist AS (SELECT doc_id, text FROM docs_sub
       |         WHERE doc_id < (SELECT h FROM hh)),
       |arr AS (SELECT doc_id, text FROM docs_sub
       |        WHERE doc_id >= (SELECT h FROM hh)),
       |arrb AS (SELECT doc_id, b2, slice FROM banded
       |         WHERE doc_id >= (SELECT h FROM hh)),
       |kept_arr AS (
       |  SELECT MIN(doc_id) AS doc_id FROM arr
       |  WHERE text NOT IN (SELECT text FROM hist)
       |  GROUP BY text)""".stripMargin

  private def jaccardExpr: String =
    "CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) " +
      "/ (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))"

  /** Replica of [[graft.streaming.ParityCheck.cappedRestartParity]]:
    * the GLOBAL-occupancy capped arrival pair set (bucket count over all
    * arrival band rows > cap → excluded — equal to the per-wave capped
    * stream under the fixture margins documented at
    * [[graft.streaming.ParityCheck.CappedFloodMod]]) composed with the
    * live tiers' horizon / kept-endpoint / exact-verify restrictions,
    * plus the recursive label closure. `n_hot_batches` restates the
    * ledger's cap-intervention count as the wave count — the flood is in
    * every wave by construction. */
  def cappedPipelineParitySql(bands: Int = 16, threshold: Double = 0.5,
      cap: Int = 12, floodMod: Long = 3L, horizonIdDist: Long = 60L,
      nBatches: Long = 4L): String =
    s"""WITH RECURSIVE ${cappedPipelineBase(bands, floodMod)},
       |hot AS (SELECT b2, slice FROM arrb GROUP BY b2, slice
       |        HAVING COUNT(*) > $cap),
       |cool AS (SELECT b.doc_id, b.b2, b.slice FROM arrb b
       |         WHERE NOT EXISTS (SELECT 1 FROM hot h
       |                           WHERE h.b2 = b.b2 AND h.slice = b.slice)),
       |kept AS (SELECT doc_id FROM hist
       |         UNION ALL SELECT doc_id FROM kept_arr),
       |candc AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM cool a JOIN cool b
       |    ON a.b2 = b.b2 AND a.slice = b.slice AND a.doc_id < b.doc_id
       |  WHERE abs(a.doc_id - b.doc_id) <= $horizonIdDist
       |    AND a.doc_id IN (SELECT doc_id FROM kept_arr)
       |    AND b.doc_id IN (SELECT doc_id FROM kept_arr)),
       |livep AS (
       |  SELECT c.id_a, c.id_b FROM candc c
       |  JOIN shingled sa ON c.id_a = sa.doc_id
       |  JOIN shingled sb ON c.id_b = sb.doc_id
       |  WHERE $jaccardExpr >= $threshold),
       |histp AS (
       |  SELECT cand.id_a, cand.id_b FROM cand, hh
       |  JOIN shingled sa ON cand.id_a = sa.doc_id
       |  JOIN shingled sb ON cand.id_b = sb.doc_id
       |  WHERE cand.id_a < hh.h AND cand.id_b < hh.h
       |    AND $jaccardExpr >= $threshold),
       |edges0 AS (
       |  SELECT id_a, id_b FROM histp
       |  UNION ALL SELECT id_a, id_b FROM livep),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM edges0
       |  UNION ALL SELECT id_b, id_a FROM edges0),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM kept
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
       |labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id
       |           FROM reach GROUP BY a),
       |nw AS (SELECT (na + GREATEST(1, na // $nBatches) - 1)
       |         // GREATEST(1, na // $nBatches) AS w
       |       FROM (SELECT COUNT(*) AS na FROM arr))
       |SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_kept,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM arr)
       |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM kept_arr) AS n_dropped,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM livep) AS n_pairs_live,
       |  (SELECT CAST(COUNT(DISTINCT cluster_id) AS BIGINT) FROM labels)
       |    AS n_clusters,
       |  (SELECT CAST(w AS BIGINT) FROM nw) AS n_hot_batches,
       |  CAST(0 AS BIGINT) AS n_only_live,
       |  CAST(0 AS BIGINT) AS n_only_batch,
       |  true AS parity_ok""".stripMargin

  /** Replica of [[graft.streaming.ParityCheck.docDecontamParity]]: the
    * NEAR-dup flood rewrite (every `floodMod`-th arrival = the fixed
    * template + a per-document suffix token — kept by the exact tier,
    * near-dup-verified within the family), the standing-band
    * GLOBAL-occupancy rule at the scaled corpus cap
    * (GREATEST(4, arrivals // 16) —
    * [[graft.streaming.ParityCheck.decontamHotBucketCap]]), and the
    * post-repair contract: pairs = cool-bucket in-horizon verified
    * arrival pairs, dropped = the uncapped pair set minus them, labels
    * = the closure over history pairs ∪ surviving arrival pairs. */
  /** The decontamination fixture's planted organic pair text — shared
    * with the Spark side ([[graft.streaming.ParityCheck]]) so the two
    * corpora rewrite identically. */
  val DecontamOrganicBase: String =
    "completely different subject matter about parquet shuffle " +
    "partitions and broadcast joins in the engine"

  def decontamPipelineParitySql(bands: Int = 16, threshold: Double = 0.5,
      floodMod: Long = 3L, horizonIdDist: Long = 60L): String =
    s"""WITH RECURSIVE
       |hh AS (
       |  SELECT (MAX(doc_id) + 1) * 3 // 5 AS h FROM documents),
       |orgp AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
       |  FROM documents, hh
       |  WHERE doc_id >= hh.h AND doc_id % $floodMod <> 0),
       |docs_sub AS (
       |  SELECT d.doc_id,
       |    CASE WHEN d.doc_id >= hh.h AND d.doc_id % $floodMod = 0
       |         THEN ('$CappedFloodTemplate v' || CAST(d.doc_id AS VARCHAR))
       |         WHEN d.doc_id = (SELECT doc_id FROM orgp WHERE rn = 1)
       |         THEN '$DecontamOrganicBase version one'
       |         WHEN d.doc_id = (SELECT doc_id FROM orgp WHERE rn = 2)
       |         THEN '$DecontamOrganicBase version two'
       |         ELSE d.text END AS text
       |  FROM documents d, hh),
       |${minhashChain("docs_sub", bands)},
       |hist AS (SELECT doc_id, text FROM docs_sub
       |         WHERE doc_id < (SELECT h FROM hh)),
       |arr AS (SELECT doc_id, text FROM docs_sub
       |        WHERE doc_id >= (SELECT h FROM hh)),
       |arrb AS (SELECT doc_id, b2, slice FROM banded
       |         WHERE doc_id >= (SELECT h FROM hh)),
       |kept_arr AS (
       |  SELECT MIN(doc_id) AS doc_id FROM arr
       |  WHERE text NOT IN (SELECT text FROM hist)
       |  GROUP BY text),
       |capn AS (SELECT GREATEST(4, COUNT(*) // 16) AS cap FROM arr),
       |hot AS (SELECT b2, slice FROM arrb GROUP BY b2, slice
       |        HAVING COUNT(*) > (SELECT cap FROM capn)),
       |cool AS (SELECT b.doc_id, b.b2, b.slice FROM arrb b
       |         WHERE NOT EXISTS (SELECT 1 FROM hot h
       |                           WHERE h.b2 = b.b2 AND h.slice = b.slice)),
       |kept AS (SELECT doc_id FROM hist
       |         UNION ALL SELECT doc_id FROM kept_arr),
       |candc AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM cool a JOIN cool b
       |    ON a.b2 = b.b2 AND a.slice = b.slice AND a.doc_id < b.doc_id
       |  WHERE abs(a.doc_id - b.doc_id) <= $horizonIdDist
       |    AND a.doc_id IN (SELECT doc_id FROM kept_arr)
       |    AND b.doc_id IN (SELECT doc_id FROM kept_arr)),
       |candu AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM arrb a JOIN arrb b
       |    ON a.b2 = b.b2 AND a.slice = b.slice AND a.doc_id < b.doc_id
       |  WHERE abs(a.doc_id - b.doc_id) <= $horizonIdDist
       |    AND a.doc_id IN (SELECT doc_id FROM kept_arr)
       |    AND b.doc_id IN (SELECT doc_id FROM kept_arr)),
       |livep AS (
       |  SELECT c.id_a, c.id_b FROM candc c
       |  JOIN shingled sa ON c.id_a = sa.doc_id
       |  JOIN shingled sb ON c.id_b = sb.doc_id
       |  WHERE $jaccardExpr >= $threshold),
       |liveu AS (
       |  SELECT c.id_a, c.id_b FROM candu c
       |  JOIN shingled sa ON c.id_a = sa.doc_id
       |  JOIN shingled sb ON c.id_b = sb.doc_id
       |  WHERE $jaccardExpr >= $threshold),
       |histp AS (
       |  SELECT cand.id_a, cand.id_b FROM cand, hh
       |  JOIN shingled sa ON cand.id_a = sa.doc_id
       |  JOIN shingled sb ON cand.id_b = sb.doc_id
       |  WHERE cand.id_a < hh.h AND cand.id_b < hh.h
       |    AND $jaccardExpr >= $threshold),
       |edges0 AS (
       |  SELECT id_a, id_b FROM histp
       |  UNION ALL SELECT id_a, id_b FROM livep),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM edges0
       |  UNION ALL SELECT id_b, id_a FROM edges0),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM kept
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
       |labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id
       |           FROM reach GROUP BY a)
       |SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM livep) AS n_pairs_after,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM liveu)
       |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM livep) AS n_dropped,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hot) AS hot_buckets,
       |  (SELECT CAST(COUNT(DISTINCT cluster_id) AS BIGINT) FROM labels)
       |    AS n_clusters,
       |  CAST(0 AS BIGINT) AS n_only_live,
       |  CAST(0 AS BIGINT) AS n_only_batch,
       |  true AS parity_ok""".stripMargin

  /** Replica of the capped pipeline's LAST-batch health-ledger row
    * (q_docstream_gauge): the last wave's banded rows, the per-batch
    * occupancy cut (wave rows ∪ earlier rows within id-distance
    * `cutIdDist` = (horizon + lateness)/60 s of the committed
    * high-water id — physical retention only ever removes rows below
    * that cut, so the replica needs no janitor model), the capped
    * candidate set the wave actually generated, and the verified pairs
    * it committed — all integer ppb like the Spark side. */
  def docStreamGaugeSql(bands: Int = 16, threshold: Double = 0.5,
      cap: Int = 12, floodMod: Long = 3L, horizonIdDist: Long = 60L,
      cutIdDist: Long = 70L, nBatches: Long = 4L,
      alertSharePpb: Long = 200000000L,
      alertCandPpb: Long = 16000000000L): String =
    s"""WITH ${cappedPipelineBase(bands, floodMod)},
       |arrix AS (SELECT doc_id,
       |            row_number() OVER (ORDER BY doc_id) - 1 AS rn FROM arr),
       |prm AS (SELECT COUNT(*) AS na,
       |          GREATEST(1, COUNT(*) // $nBatches) AS chunk FROM arr),
       |wv AS (SELECT a.doc_id, a.rn // p.chunk AS wave FROM arrix a, prm p),
       |lastw AS (SELECT MAX(wave) AS w FROM wv),
       |wdocs AS (SELECT wv.doc_id FROM wv, lastw WHERE wv.wave = lastw.w),
       |pdocs AS (SELECT wv.doc_id FROM wv, lastw WHERE wv.wave < lastw.w),
       |pm AS (SELECT MAX(doc_id) AS m FROM pdocs),
       |occ AS (
       |  SELECT b.b2, b.slice, COUNT(*) AS c
       |  FROM arrb b JOIN wv ON b.doc_id = wv.doc_id
       |  CROSS JOIN lastw CROSS JOIN pm
       |  WHERE wv.wave = lastw.w
       |     OR (wv.wave < lastw.w AND b.doc_id >= pm.m - $cutIdDist)
       |  GROUP BY b.b2, b.slice),
       |hotw AS (SELECT b2, slice FROM occ WHERE c > $cap),
       |wb AS (SELECT b.doc_id, b.b2, b.slice FROM arrb b
       |       JOIN wdocs w ON b.doc_id = w.doc_id),
       |coolw AS (SELECT wb.doc_id, wb.b2, wb.slice FROM wb
       |          WHERE NOT EXISTS (SELECT 1 FROM hotw h
       |                            WHERE h.b2 = wb.b2 AND h.slice = wb.slice)),
       |pb AS (SELECT b.doc_id, b.b2, b.slice FROM arrb b
       |       JOIN pdocs p ON b.doc_id = p.doc_id),
       |cands AS (
       |  SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS id_a,
       |         GREATEST(a.doc_id, b.doc_id) AS id_b
       |  FROM coolw a JOIN pb b ON a.b2 = b.b2 AND a.slice = b.slice
       |  WHERE abs(a.doc_id - b.doc_id) <= $horizonIdDist
       |  UNION
       |  SELECT a.doc_id, b.doc_id
       |  FROM coolw a JOIN coolw b
       |    ON a.b2 = b.b2 AND a.slice = b.slice AND a.doc_id < b.doc_id
       |  WHERE abs(a.doc_id - b.doc_id) <= $horizonIdDist),
       |pairsw AS (
       |  SELECT c.id_a, c.id_b FROM cands c
       |  JOIN shingled sa ON c.id_a = sa.doc_id
       |  JOIN shingled sb ON c.id_b = sb.doc_id
       |  WHERE c.id_a IN (SELECT doc_id FROM kept_arr)
       |    AND c.id_b IN (SELECT doc_id FROM kept_arr)
       |    AND $jaccardExpr >= $threshold),
       |topx AS (SELECT COALESCE(MAX(c), 0) AS mx FROM
       |          (SELECT COUNT(*) AS c FROM wb GROUP BY b2, slice)),
       |nn AS (SELECT COUNT(*) AS n FROM wdocs),
       |nc AS (SELECT COUNT(*) AS c FROM cands)
       |SELECT
       |  (SELECT CAST(n AS BIGINT) FROM nn) AS n_arrived,
       |  (SELECT CAST(n AS BIGINT) FROM nn) AS n_admitted,
       |  (SELECT CAST(mx * 1000000000 // n AS BIGINT) FROM topx, nn)
       |    AS top_share_ppb,
       |  (SELECT CAST(c * 1000000000 // n AS BIGINT) FROM nc, nn)
       |    AS cand_ppb,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hotw) AS hot_buckets,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM pairsw) AS n_pairs,
       |  ((SELECT mx * 1000000000 // n FROM topx, nn) > $alertSharePpb
       |    OR (SELECT c * 1000000000 // n FROM nc, nn) > $alertCandPpb)
       |    AS alert""".stripMargin

  /** Replica of [[graft.streaming.ParityCheck.minhashDeepLiveParity]]'s
    * batch twin: the full MinHash pair set plus the shared recursive
    * component closure. */
  def minhashDeepLiveParitySql(bands: Int = 16,
      threshold: Double = 0.5): String =
    s"""WITH RECURSIVE prs AS (
       |${minhashPairsSql(bands, threshold)}
       |),
       |hh AS (SELECT (MAX(doc_id) + 1) * 3 // 5 AS h FROM documents),
       |${closureCountsSql("documents", "doc_id", "n_docs")}""".stripMargin

  def fingerprintSql: String =
    s"""SELECT doc_id,
       |  $fpExpr AS fp
       |FROM documents ORDER BY doc_id""".stripMargin

  /** [[graft.ops.Sampling.splitCounts]]: fingerprint bucket (Spark `pmod`
    * = ((x % m) + m) % m on the signed value) → train/val/test counts. */
  /** [[graft.ops.Sampling.crossSplitLeakage]]: MinHash near-dup pairs
    * labeled with both members' content-hash split assignments, counted
    * per (split, split) cell. */
  def crossSplitLeakageSql(trainPct: Int, valPct: Int): String =
    s"""WITH pairs AS (
       |${minhashPairsSql(bands = 16, threshold = 0.5)}
       |),
       |sp AS (SELECT doc_id,
       |        CASE WHEN b < $trainPct THEN 'train'
       |             WHEN b < ${trainPct + valPct} THEN 'val'
       |             ELSE 'test' END AS split
       |       FROM (SELECT doc_id, ((($fpExpr) % 100) + 100) % 100 AS b
       |             FROM documents) q),
       |lab AS (SELECT LEAST(a.split, b.split) AS split_a,
       |          GREATEST(a.split, b.split) AS split_b
       |        FROM pairs JOIN sp a ON pairs.id_a = a.doc_id
       |                   JOIN sp b ON pairs.id_b = b.doc_id)
       |SELECT split_a, split_b, COUNT(*) AS n_pairs
       |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** [[graft.ops.Sampling.evalSample]]: per-lang first-k by
    * (fingerprint, doc_id). */
  def evalSampleSql(k: Int): String =
    s"""WITH f AS (SELECT lang, doc_id, $fpExpr AS fp FROM documents),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
       |        ORDER BY fp, doc_id) AS INTEGER) AS rnk FROM f)
       |SELECT lang, doc_id, fp, rnk FROM r WHERE rnk <= $k
       |ORDER BY lang, rnk""".stripMargin

  /** [[graft.ops.Sampling.trainOrder]]: global 1-based position ordered by
    * (content fingerprint, doc_id). */
  def trainOrderSql: String =
    s"""WITH f AS (SELECT doc_id, $fpExpr AS fp FROM documents)
       |SELECT doc_id, fp, row_number() OVER (ORDER BY fp, doc_id) AS pos
       |FROM f ORDER BY pos""".stripMargin

  def splitCountsSql(trainPct: Int, valPct: Int): String =
    s"""WITH f AS (
       |  SELECT lang, ((($fpExpr) % 100) + 100) % 100 AS b FROM documents)
       |SELECT lang,
       |  CASE WHEN b < $trainPct THEN 'train'
       |       WHEN b < ${trainPct + valPct} THEN 'val'
       |       ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs
       |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** [[graft.ops.Sampling.mixCounts]]: per-source keep counts under
    * fingerprint-bucket sampling at the given ppm rates. */
  def mixCountsSql(ratesPpm: Seq[(String, Long)]): String = {
    val rateCase = ratesPpm.map { case (s, p) => s"WHEN '$s' THEN $p" }
      .mkString("CASE source ", " ", " ELSE 0 END")
    s"""WITH f AS (
       |  SELECT source, ((($fpExpr) % 1000000) + 1000000) % 1000000 AS b FROM documents)
       |SELECT source, COUNT(*) AS n_kept
       |FROM f WHERE b < $rateCase
       |GROUP BY source ORDER BY source""".stripMargin
  }

  /** [[graft.ops.TextAnalysis.langId]]: stopword-hit argmax, ties toward
    * the lexicographically larger language (Spark greatest-struct order). */
  def langIdSql: String =
    s"""WITH vocab(vlang, words) AS (VALUES
       |  ('de', ['der','die','das','und','ist','mit','von']),
       |  ('en', ['the','and','of','to','is','with','for']),
       |  ('es', ['el','la','de','que','y','los','con']),
       |  ('fr', ['le','la','les','des','et','que','pour']),
       |  ('zh', ['的','是','在','了','和','有','不'])),
       |scored AS (
       |  SELECT d.doc_id, d.lang AS label_lang, v.vlang,
       |    CAST(len(list_intersect(list_transform(${wstoks("d.text")}, t -> lower(t)), v.words)) AS BIGINT) AS score,
       |    ROW_NUMBER() OVER (PARTITION BY d.doc_id
       |      ORDER BY len(list_intersect(list_transform(${wstoks("d.text")}, t -> lower(t)), v.words)) DESC,
       |               v.vlang DESC) AS rn
       |  FROM documents d CROSS JOIN vocab v)
       |SELECT doc_id, label_lang, vlang AS pred_lang, score
       |FROM scored WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Quality-gate CTEs shared by the CleanPipeline oracles: `m` (metrics,
    * same expressions as the green q_text_stats oracle), `q` (with qfail),
    * `qk` (quality survivors), `canon`/`exdrops` (exact dedup), `ae`
    * (survivors entering the near-dup tier). */
  private def cleanBase: String =
    s"""m AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE)
       |      / greatest(length(text), 1) AS punct_ratio,
       |    CAST(len(list_intersect(list_transform(string_split_regex(trim(text), '\\s+'), t -> lower(t)),
       |         ['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','from','that','this'])) AS DOUBLE)
       |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS stopword_ratio
       |  FROM documents),
       |q AS (
       |  SELECT d.doc_id, d.text, d.lang, d.source,
       |    (m.n_tokens < 5 OR m.n_tokens > 100000 OR m.punct_ratio > 0.3 OR m.stopword_ratio < 0.0) AS qfail
       |  FROM documents d JOIN m USING (doc_id)),
       |qk AS (SELECT doc_id, text, source FROM q WHERE NOT qfail),
       |canon AS (SELECT md5(text) AS th, MIN(doc_id) AS keep FROM qk GROUP BY 1),
       |exdrops AS (
       |  SELECT qk.doc_id FROM qk JOIN canon ON md5(qk.text) = canon.th
       |  WHERE qk.doc_id <> canon.keep),
       |ae AS (SELECT doc_id, text, source FROM qk
       |       WHERE doc_id NOT IN (SELECT doc_id FROM exdrops))""".stripMargin

  private def cleanFinal(nearDropsRel: String, attrition: Boolean): String = {
    val perDoc =
      s"""cleaned AS (
         |  SELECT d.doc_id, d.lang, d.source, r.drop_reason
         |  FROM documents d LEFT JOIN reasons r USING (doc_id))""".stripMargin
    val tail =
      if (attrition)
        """SELECT COALESCE(drop_reason, 'kept') AS stage, COUNT(*) AS n_docs
          |FROM cleaned GROUP BY 1 ORDER BY 1""".stripMargin
      else "SELECT doc_id, lang, source, drop_reason FROM cleaned ORDER BY doc_id"
    s"""reasons AS (
       |  SELECT doc_id, 'quality' AS drop_reason FROM q WHERE qfail
       |  UNION ALL SELECT doc_id, 'exact_dup' FROM exdrops
       |  UNION ALL SELECT doc_id, 'near_dup' FROM $nearDropsRel),
       |$perDoc
       |$tail""".stripMargin
  }

  /** [[graft.ops.CleanPipeline.clean]] (MinHash near-dup tier) → attrition
    * ledger, the registered q_pipeline_clean shape. */
  def pipelineCleanSql(bands: Int, threshold: Double): String =
    s"""WITH $cleanBase,
       |${minhashChain("ae", bands)},
       |neardrops AS (
       |  SELECT DISTINCT id_b AS doc_id
       |  FROM cand JOIN shingled sa ON cand.id_a = sa.doc_id
       |            JOIN shingled sb ON cand.id_b = sb.doc_id
       |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= $threshold),
       |${cleanFinal("neardrops", attrition = true)}""".stripMargin

  /** [[graft.ops.Multimodal.imageFeatures]] over the documents-derived
    * media table: the decode STUB derives (width, height) from the payload
    * FNV hash, so the whole mapPartitions path is oracle-checkable — the
    * oracle recomputes the same FNV over the same UTF-8 payload bytes. */
  /** [[graft.ops.Multimodal.imageFeatures]] over the documents-derived
    * fixture: the decode is REAL (javax.imageio), and text payloads are
    * not images, so every fixture row takes the quarantine branch —
    * (-1, -1, decoded=false) with the byte-exact FNV content hash. The
    * successful-decode branch is exercised with real generated PNGs in
    * MultimodalSpec (actual pixel dimensions are not SQL-expressible). */
  /** FNV-1a 64 over a LIST of raw byte values (0-255 BIGINTs) — the
    * 3-byte fold the image fixture seeds its textures with
    * (graft.ops.Multimodal.patternImage: no UTF-8 expansion, no
    * finalizer). */
  private def fnv1a64bytes(listExpr: String): String =
    s"""list_reduce(list_prepend(${ulit(-3750763034362895579L)}, list_transform($listExpr, x -> CAST(x AS UBIGINT))),
       |      (h, x) -> CAST(CAST((CAST(xor(h, x) AS HUGEINT) * 1099511628211) % $M64 AS HUGEINT) AS UBIGINT))""".stripMargin

  /** Full PIXEL-LEVEL replica of [[graft.ops.Multimodal.resizeImages]]
    * over the [[graft.ops.Multimodal.imagePngMedia]] fixture: the
    * fixture raster is closed-form (gray(x,y) = 78 +
    * fnv1a64([cls+1, x, y]) mod 101 + jitter, cls = doc_id mod 5,
    * jitter = ((doc_id div 5) mod 5 − 2)·5), so the oracle recomputes
    * every source pixel, every 4×4 block's floor-averaged output pixel,
    * the pixel sum, and the h·31+px rolling digest independently — a
    * single wrong pixel on the Spark side breaks the hash compare.
    * Assumes the fixture's 32×32 geometry (the registered query's
    * input). */
  def imageResizeSql(outW: Int = 8, outH: Int = 8): String = {
    val (bw, bh) = (32 / outW, 32 / outH)
    val area = bw * bh
    s"""WITH imgs AS (
       |  SELECT doc_id, doc_id % 5 + 1 AS clsb,
       |    ((doc_id // 5) % 5 - 2) * 5 AS jitter
       |  FROM documents WHERE doc_id % 3 = 1),
       |px AS (
       |  SELECT i.doc_id, x // $bw AS xo, y // $bh AS yo,
       |    78 + CAST(${fnv1a64bytes("[i.clsb, x, y]")} % 101 AS BIGINT) + i.jitter AS g
       |  FROM imgs i, range(0, 32) rx(x), range(0, 32) ry(y)),
       |blocks AS (
       |  SELECT doc_id, yo, xo, SUM(g) // $area AS px
       |  FROM px GROUP BY doc_id, yo, xo),
       |digest AS (
       |  SELECT doc_id, CAST(SUM(px) AS BIGINT) AS out_sum,
       |    ${u2s(s"""list_reduce(list_prepend(CAST(0 AS UBIGINT),
       |        list_transform(list(px ORDER BY yo, xo), p -> CAST(p AS UBIGINT))),
       |      (h, p) -> ${addmod64(mulmod64("h", "31"), "p")})""")} AS out_fp
       |  FROM blocks GROUP BY doc_id)
       |SELECT doc_id AS media_id,
       |  CAST(32 AS INTEGER) AS in_w, CAST(32 AS INTEGER) AS in_h,
       |  CAST($outW AS INTEGER) AS out_w, CAST($outH AS INTEGER) AS out_h,
       |  out_sum, out_fp
       |FROM digest ORDER BY media_id""".stripMargin
  }

  /** Full SAMPLE-LEVEL replica of [[graft.ops.Multimodal.resampleAudio]]
    * over the [[graft.ops.Multimodal.audioWavMedia]] fixture — the audio
    * twin of [[imageResizeSql]]: the fixture waveform is closed-form
    * (sample i = (fnv1a64([cls+1, i div 256, i mod 256]) mod 12001 −
    * 6000) · gain, cls = doc_id mod 5, gain = 1 + (doc_id div 5) mod 5,
    * 2048 samples at 8 kHz), so every source sample, every
    * `factor`-block floor-averaged output sample, the sum, and the
    * wrapping h·31+s digest are recomputed independently. */
  def audioResampleSql(factor: Int = 4): String =
    s"""WITH auds AS (
       |  SELECT doc_id, doc_id % 5 + 1 AS clsb, 1 + (doc_id // 5) % 5 AS gain
       |  FROM documents WHERE doc_id % 3 = 0),
       |sm AS (
       |  SELECT a.doc_id, i // $factor AS j,
       |    (CAST(${fnv1a64bytes("[a.clsb, i // 256, i % 256]")} % 12001 AS BIGINT) - 6000) * a.gain AS s
       |  FROM auds a, range(0, 2048) r(i)),
       |blocks AS (
       |  SELECT doc_id, j, SUM(s) // $factor AS px FROM sm GROUP BY doc_id, j),
       |digest AS (
       |  SELECT doc_id, CAST(SUM(px) AS BIGINT) AS out_sum,
       |    ${u2s(s"""list_reduce(list_prepend(CAST(0 AS UBIGINT),
       |        list_transform(list(px ORDER BY j), p -> ${s2u("p")})),
       |      (h, p) -> ${addmod64(mulmod64("h", "31"), "p")})""")} AS out_fp
       |  FROM blocks GROUP BY doc_id)
       |SELECT doc_id AS media_id,
       |  CAST(8000 AS INTEGER) AS in_rate, CAST(${8000 / factor} AS INTEGER) AS out_rate,
       |  CAST(2048 AS INTEGER) AS in_frames, CAST(${2048 / factor} AS INTEGER) AS out_frames,
       |  out_sum, out_fp
       |FROM digest ORDER BY media_id""".stripMargin

  def multimodalImageSql: String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, ${fnv1a64("text")} AS h,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents WHERE doc_id % 3 = 0)
       |SELECT media_id,
       |  CAST(-1 AS INTEGER) AS width,
       |  CAST(-1 AS INTEGER) AS height,
       |  n_bytes,
       |  ${u2s("h")} AS content_hash,
       |  false AS decoded
       |FROM media ORDER BY media_id""".stripMargin

  /** [[graft.ops.Multimodal.sampleFrames]] over the
    * [[graft.ops.Multimodal.videoGifMedia]] fixture: the decode is REAL
    * (javax.imageio reader iteration over an actual animated GIF), and the
    * fixture encodes `1 + doc_id % 7` frames per video doc — a pure
    * function of doc_id, so the oracle predicts exactly what the container
    * walk must find. Frame pixel hashes are deterministic but not
    * SQL-expressible (DuckDB cannot decode GIF rasters); they are asserted
    * stable/distinct in MultimodalSpec instead. */
  def multimodalFramesSql(stride: Int, maxFrames: Int): String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, 1 + doc_id % 7 AS n_frames
       |  FROM documents WHERE doc_id % 3 = 2),
       |frames AS (
       |  SELECT media_id, unnest(range(0, n_frames, $stride)) AS fi
       |  FROM media)
       |SELECT media_id, CAST(fi AS INTEGER) AS frame_idx, true AS decoded
       |FROM frames
       |WHERE fi / $stride < $maxFrames
       |ORDER BY media_id, frame_idx""".stripMargin

  /** [[graft.ops.Multimodal.sampleFrames]] quarantine branch over the
    * text-payload fixture: no installed ImageIO reader recognizes UTF-8
    * text, so every row must yield exactly one (-1, payload-FNV, false)
    * row — byte-exact hash check of the undecodable path. */
  def multimodalFramesQuarantineSql: String =
    s"""SELECT doc_id AS media_id, CAST(-1 AS INTEGER) AS frame_idx,
       |  ${u2s(fnv1a64("text"))} AS frame_hash, false AS decoded
       |FROM documents WHERE doc_id % 3 = 2
       |ORDER BY media_id""".stripMargin

  /** [[graft.ops.Multimodal.audioFeatures]]: the decode is REAL
    * (javax.sound.sampled header parse), and text payloads are not audio
    * containers, so every fixture row takes the quarantine branch —
    * (-1, -1, -1.0, decoded=false) with the byte-exact FNV content hash.
    * The successful-decode branch is exercised with real generated WAVs in
    * MultimodalSpec (header fields are not SQL-expressible). */
  def multimodalAudioSql: String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, ${fnv1a64("text")} AS h,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents WHERE doc_id % 3 = 1)
       |SELECT media_id,
       |  CAST(-1 AS INTEGER) AS sample_rate,
       |  CAST(-1 AS BIGINT) AS n_samples,
       |  CAST(-1.0 AS DOUBLE) AS duration_s,
       |  n_bytes,
       |  ${u2s("h")} AS content_hash,
       |  false AS decoded
       |FROM media ORDER BY media_id""".stripMargin

  /** [[graft.ops.CleanPipeline.cleanCharJaccard]] per-document frame — the
    * near-dup tier runs on DuckDB's native `jaccard()`, fully independent
    * of our hash implementations. */
  def pipelineCleanCjSql(threshold: Double): String =
    s"""WITH $cleanBase,
       |neardrops AS (
       |  SELECT DISTINCT b.doc_id
       |  FROM ae a JOIN ae b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE jaccard(a.text, b.text) >= $threshold),
       |${cleanFinal("neardrops", attrition = false)}""".stripMargin

  /** Full replica of [[graft.ops.Similarity.pqTopK]] — product
    * quantization end to end: hash-ranked codebook seeds (the shared
    * XXH64 chain), per-subspace L2-nearest codes via the dot identity
    * argmin‖x−c‖² = argmax(x·c − ‖c‖²/2) with `list_dot_product`'s
    * sequential fold, the per-probe LUT, the ADC sum as an s-ORDERED
    * list_reduce (matching the Spark fold association), pool trim, and
    * the exact-cosine re-rank. */
  /** The shared PQ CTE chain (codebook subvectors, per-vector codes,
    * per-probe LUTs) — everything through `codes` and `lut`, used by
    * both [[knnPqSql]] and [[knnIvfPqSql]]. Assumes `base` and `xxh`
    * are already in scope (from [[xxhCtes]] or [[ivfChainCtes]]). */
  private def pqCtes(m: Int, nCodes: Int, nProbes: Int): String = {
    val sub = 64 / m
    s"""seeds AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY x.xxh, b.vec_id) AS INTEGER) - 1 AS cidx,
       |    b.e AS c_emb
       |  FROM base b JOIN xxh x ON b.vec_id = x.vec_id
       |  ORDER BY x.xxh, b.vec_id LIMIT $nCodes),
       |csub AS (
       |  SELECT t.s, seeds.cidx,
       |    c_emb[t.s * $sub + 1 : t.s * $sub + $sub] AS c_sub,
       |    list_dot_product(c_emb[t.s * $sub + 1 : t.s * $sub + $sub],
       |      c_emb[t.s * $sub + 1 : t.s * $sub + $sub]) * 0.5 AS half
       |  FROM seeds, range(0, $m) t(s)),
       |vsub AS (
       |  SELECT vec_id, t.s, e[t.s * $sub + 1 : t.s * $sub + $sub] AS v
       |  FROM base, range(0, $m) t(s)),
       |enc AS (
       |  SELECT vec_id, s, cidx,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, s
       |      ORDER BY list_dot_product(v, c_sub) - half DESC, cidx) AS rn
       |  FROM vsub JOIN csub USING (s)),
       |codes AS (SELECT vec_id, s, cidx AS code FROM enc WHERE rn = 1),
       |lut AS (
       |  SELECT vec_id AS probe_id, s, cidx, list_dot_product(v, c_sub) AS d
       |  FROM vsub JOIN csub USING (s) WHERE vec_id < $nProbes)""".stripMargin
  }

  def knnPqSql(m: Int = 8, nCodes: Int = 16, nProbes: Int = 10, k: Int = 5,
      poolFactor: Int = 4): String = {
    s"""WITH ${xxhCtes()},
       |${pqCtes(m, nCodes, nProbes)},
       |adc AS (
       |  SELECT l.probe_id, c.vec_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.d ORDER BY l.s)),
       |      (acc, x) -> acc + x) AS approx
       |  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.cidx
       |  WHERE c.vec_id <> l.probe_id
       |  GROUP BY l.probe_id, c.vec_id),
       |pool AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT probe_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY approx DESC, vec_id) AS qr
       |    FROM adc) z WHERE qr <= ${k * poolFactor}),
       |scored AS (
       |  SELECT p.probe_id, b.vec_id, ${cosSql("b.e", "pb.e")} AS cosine
       |  FROM pool p JOIN base b ON p.vec_id = b.vec_id
       |              JOIN base pb ON p.probe_id = pb.vec_id),
       |ranked AS (
       |  SELECT probe_id, vec_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT probe_id, vec_id, cosine, rank FROM ranked
       |WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin
  }

  /** Full replica of [[graft.ops.Similarity.ivfPqTopKPersisted]] — the
    * IVF-PQ composite: the bit-exact IVF chain assigns every vector and
    * ranks each probe's nProbe clusters; the PQ chain (corpus-global
    * codebook) encodes every vector; the ADC scan is RESTRICTED to
    * candidates whose cluster one of the probe's probed clusters —
    * the bucket cut — then pool-trimmed and exact-cosine re-ranked.
    * Same arithmetic as the two parent replicas, so the composite
    * hash-matches end to end. */
  def knnIvfPqSql(nCentroids: Int = 32, nProbe: Int = 6,
      lloydIters: Int = 2, m: Int = 8, nCodes: Int = 16, nProbes: Int = 10,
      k: Int = 5, poolFactor: Int = 4): String = {
    val (ctes, last) = ivfChainCtes(nCentroids, lloydIters)
    s"""WITH $ctes,
       |probes AS (
       |  SELECT b.vec_id AS probe_id, cc.c_id AS cluster,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY ${cosSql("b.e", "cc.c")} DESC, cc.c_id) AS r
       |  FROM base b CROSS JOIN $last cc WHERE b.vec_id < $nProbes),
       |pl AS (SELECT probe_id, cluster FROM probes WHERE r <= $nProbe),
       |${pqCtes(m, nCodes, nProbes)},
       |cand AS (
       |  SELECT p.probe_id, af.vec_id
       |  FROM pl p JOIN a_f af ON af.cluster = p.cluster
       |  WHERE af.vec_id <> p.probe_id),
       |adc AS (
       |  SELECT l.probe_id, c.vec_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.d ORDER BY l.s)),
       |      (acc, x) -> acc + x) AS approx
       |  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.cidx
       |  JOIN cand cd ON cd.probe_id = l.probe_id AND cd.vec_id = c.vec_id
       |  GROUP BY l.probe_id, c.vec_id),
       |pool AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT probe_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY approx DESC, vec_id) AS qr
       |    FROM adc) z WHERE qr <= ${k * poolFactor}),
       |scored AS (
       |  SELECT p.probe_id, b.vec_id, ${cosSql("b.e", "pb.e")} AS cosine
       |  FROM pool p JOIN base b ON p.vec_id = b.vec_id
       |              JOIN base pb ON p.probe_id = pb.vec_id),
       |ranked AS (
       |  SELECT probe_id, vec_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT probe_id, vec_id, cosine, rank FROM ranked
       |WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin
  }

  /** Full replica of [[graft.ops.Sketches.kmvIntersections]]: the KMV
    * theta-sketch intersection estimate, recomputed end to end — the same
    * splitmix64 user hash (signed-long order; c1..c3 below are the
    * splitmix constants — FNV-1a is documented unfit for KMV because its
    * high bits are not uniform on short decimal strings), per-type
    * k-minimums, pairwise
    * union rank, θ selection, and the IEEE θ-fraction arithmetic (2^63 and
    * 2^64 are exact double literals; +,/ are correctly rounded, so both
    * engines produce the identical double). */
  def kmvIntersectionsSql(ev: String, k: Int): String = {
    val c1 = ulit(-7046029254386353131L) // 0x9e3779b97f4a7c15
    val c2 = ulit(-4658895280553007687L) // 0xbf58476d1ce4e5b9
    val c3 = ulit(-7723592293110705685L) // 0x94d049bb133111eb
    s"""WITH ev AS ($ev),
       |z1 AS (SELECT event_type, ${addmod64(s2u("user_id"), c1)} AS z FROM ev),
       |z2 AS (SELECT event_type, ${mulmod64("xor(z, z >> 30)", c2)} AS z FROM z1),
       |z3 AS (SELECT event_type, ${mulmod64("xor(z, z >> 27)", c3)} AS z FROM z2),
       |uh AS (SELECT DISTINCT event_type AS t, ${u2s("xor(z, z >> 31)")} AS h FROM z3),
       |sk AS (SELECT t, h FROM (
       |         SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rnk
       |         FROM uh) z WHERE rnk <= $k),
       |ty AS (SELECT DISTINCT t FROM uh),
       |pairs AS (SELECT a.t AS ta, b.t AS tb FROM ty a, ty b WHERE a.t < b.t),
       |tg AS (SELECT ta, tb, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
       |         SELECT p.ta, p.tb, s.h, 1 AS in_a, 0 AS in_b
       |         FROM pairs p JOIN sk s ON s.t = p.ta
       |         UNION ALL
       |         SELECT p.ta, p.tb, s.h, 0 AS in_a, 1 AS in_b
       |         FROM pairs p JOIN sk s ON s.t = p.tb) z
       |       GROUP BY ta, tb, h),
       |ur AS (SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rnk
       |       FROM tg),
       |th AS (SELECT ta, tb, CAST(MAX(rnk) AS INTEGER) AS n_union,
       |         MAX(CASE WHEN rnk <= $k THEN h END) AS theta
       |       FROM ur GROUP BY ta, tb),
       |cm AS (SELECT ur.ta, ur.tb, th.n_union, th.theta,
       |         CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1
       |             AND (th.n_union < $k OR ur.h < th.theta)
       |           THEN 1 ELSE 0 END) AS BIGINT) AS cnt
       |       FROM ur JOIN th USING (ta, tb) GROUP BY ur.ta, ur.tb, th.n_union, th.theta),
       |ex AS (SELECT a.t AS ta, b.t AS tb, COUNT(*) AS n_exact
       |       FROM uh a JOIN uh b ON a.h = b.h AND a.t < b.t GROUP BY 1, 2),
       |fin AS (SELECT cm.ta AS type_a, cm.tb AS type_b,
       |         COALESCE(ex.n_exact, 0) AS n_exact, cm.n_union,
       |         CASE WHEN cm.n_union < $k THEN CAST(cm.cnt AS DOUBLE)
       |              ELSE CAST(cm.cnt AS DOUBLE) /
       |                ((CAST(cm.theta AS DOUBLE) + 9223372036854775808.0)
       |                  / 18446744073709551616.0) END AS est
       |       FROM cm LEFT JOIN ex ON cm.ta = ex.ta AND cm.tb = ex.tb)
       |SELECT type_a, type_b, n_exact, n_union, est,
       |  (n_union < $k OR (est >= CAST(n_exact AS DOUBLE) * 0.5
       |    AND est <= CAST(n_exact AS DOUBLE) * 1.5)) AS ok
       |FROM fin ORDER BY type_a, type_b""".stripMargin
  }
}
