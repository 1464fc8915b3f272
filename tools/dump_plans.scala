// Plan-quality artifact generator: spark-shell -i tools/dump_plans.scala
// (with --driver-class-path target/scala-2.13/classes) -> writes PLANS.md.
import java.nio.file.{Files, Paths}

val sfDir = "/root/testdata/sf0.01"
val headline = Seq(
  "q_logs_flagship" -> "reference flagship: pushed filters (incl. ts bounds rewritten onto the raw scan column, whichever physical shape the fixture ships) + TakeOrderedAndProject top-K",
  "q_logs_flagship_partitioned" -> "flagship over the month-partitioned LogTable layout (PARTITION BY toYYYYMM(ts), db.go:51): the derived month bounds land as PartitionFilters -- unmatched month directories are never listed or opened; row-level filters still push to parquet inside the surviving months",
  "q1_pricing" -> "grouped agg: partial (map-side) aggregation before one low-cardinality exchange",
  "q3_shipping" -> "3-way join: dimension broadcasts, fact shuffle on join key only, top-10 via TakeOrderedAndProject",
  "q_asof_join_exec" -> "custom AsOfJoin physical operator: engine-supplied Exchange+Sort, merge-walk exec",
  "q_knn_bruteforce" -> "similarity top-k: broadcast probes, WindowGroupLimit partial/final instead of full sort",
  "q_dedup_minhash" -> "MinHash LSH: band-key equi-join carrying (band,hash,id) rows; shingles re-attached to candidates",
  "q_knn_ivf" -> "IVF with Lloyd refinement: centroid subplans (seeds + 2 refinement rounds) fold to broadcast rows consumed by the native argmax_cosine kernel -- no job at plan time, no corpus exchange in assignment; refinement aggregates carry (cluster, pos) group rows only",
  "q_contamination" -> "train-vs-eval overlap: eval shingle set reduces then BROADCASTS; train side explodes and joins without shuffling its rows",
  "q_dedup_embedding_lsh" -> "bucketed embedding near-dup: (table,signature) equi-joins only -- no NestedLoop/cartesian anywhere; embeddings re-attached to the few candidates",
  "q_ntile_spend" -> "global NTILE: ONE range exchange + partition-local ordinals from monotonically_increasing_id; the only windows run over O(numPartitions) offset rows",
  "q_spend_ranks" -> "rank family (dense_rank/percent_rank/cume_dist): range-partitioned row numbers + keyed peer aggregation -- no data-sized single-partition window",
  "q5_local_supplier_bkt" -> "bucketed fact layout: lineitem/orders scans read co-located sorted buckets; the fact-fact join needs no exchange on either side (broadcast at this SF; SMJ-no-exchange at scale, BucketingSpec)",
  "q8_market_share" -> "two-level share ratio: level 1 reduces lineitems to years x nations with all dims broadcast; level 2 runs over that tiny frame",
  "q2_min_cost_supplier" -> "correlated MIN subquery decorrelated by construction: candidate frame built once, per-part min is a grouped agg on its own key, equality join back -- no rescan, no nested loop",
  "q16_part_supplier_cnt" -> "NOT IN as LeftAnti on the broadcast negative-balance supplier set; distinct part-supplier relation aggregated with partial combine",
  "q21_waiting_suppliers" -> "EXISTS/NOT-EXISTS pair reformulated as per-(order,supplier) flags + per-order counts: two grouped aggregates on one orderkey shuffle instead of two correlated rescans",
  "q_semdedup" -> "SemDeDup off the PERSISTED IVF assignment (round 8 default): cluster labels read from the index table, within-cluster pairs from a cluster equi-join -- pairwise work is sum(|cluster|^2), never n^2; the k-means chain is absent from the plan",
  "q_dedup_clusters_idx" -> "near-dup components off the PERSISTED label table (round 8): the read path is ONE scan of the labeling -- the large-star/small-star convergence and the candidate pair generation are both absent from the plan (they are the one-time ingest-side build)",
  "q_rollup_revenue" -> "ROLLUP via re-aggregated partials (round 8): ONE grouped aggregation reduces the fact scan to the (flag, status) cells; the coarser levels re-aggregate those ~6 decimal partial rows -- no Expand node, the fact table is never tripled",
  "q_phash_pairs" -> "perceptual-hash image dedup (round 10: 128-bit pHash through 4x32-bit band keys -- 2^32 buckets per band, complete for hamming<=3 by pigeonhole): per-row codec work (PNG decode + DCT) rides mapPartitions in the scan -- embarrassingly parallel, repartitioned off the single-file fixture; candidates are a (band, bh) EQUI-join carrying only (id, sh0, sh1) rows, summed-popcount verify on the survivors -- no payload ever shuffles, no cartesian anywhere",
  "q_audio_fp_pairs" -> "audio fingerprint dedup (round 10: 128-bit fingerprint, 4x32-bit band keys): same plan family -- WAV decode + FFT per row in the scan, banded equi-join candidates, summed-popcount verify",
  "q_video_fp_pairs" -> "video near-dup frame vote (round 9/10): GIF container decode + per-frame pHash128 ride mapPartitions in the scan; ONLY (band, bh, id, hash-words, frame_idx) rows reach the banded equi-join -- frames and payloads never shuffle; the vote is one keyed distinct-count over the sparse match rows; no sort between join and vote (the Unordered composition)",
  "q_image_resize" -> "image resize (round 10): decode + integer box-average + PNG re-encode ride ONE mapPartitions in the scan -- zero exchanges before the presentation sort; the digest columns are pixel-level oracle-checked",
  "q_audio_resample" -> "audio downsample (round 10): WAV decode + truncating block average + re-encode, same shuffle-free mapPartitions shape; sample-level oracle",
  "q_dedup_simhash" -> "128-bit text simhash (round 10): two native bit-vote words (FNV + splitmix64-mixed) computed in the scan, the same 4x32-bit banded equi-join -- only (band, bh, id, sh0, sh1) rows shuffle, radius-24 popcount verify on candidates",
  "q_span_dedup" -> "C4 span dedup: first-occurrence owner per distinct span via min(struct) grouped agg (map-side partial, no window sort); exchanges carry span/doc keys only",
  "q_pack" -> "sequence packing: global running token total via range-partitioned prefix sums (partition-local cumsum + O(numPartitions) offset window) -- no data-sized single-partition window",
  "q_retention" -> "day-over-day retention: distinct (user, day) reduction, one user-keyed self join, per-day counts",
  "q_daily_counts_mv" -> "materialized-rollup serving: scans the hourly summary table (group rows), re-aggregates <=24 decimal partials per day; the raw events file never appears in the plan",
  "q_range_join" -> "interval join with NO equi key: time-bucket co-location turns the nested-loop predicate into a hash join on the bucket (broadcast at this SF, shuffled equi-join at scale) with the range residual as join condition -- no BroadcastNestedLoopJoin/CartesianProduct",
  "q_knn_int8" -> "quantized-scan kNN: pass 1 ranks candidates on int8 codes only (integer dots, scales cancel), WindowGroupLimit cuts the pool, pass 2 re-attaches float embeddings to survivors by id and exact cosine decides -- the SQ8 two-pass shape",
  "q_sequence_match" -> "sequenceMatch chain: one keyed min-aggregation per step joined user-keyed to the one-row-per-user previous chain; no per-user sort or data-sized window",
  "q_skew_join" -> "ADAPTIVE salted fact-to-dim join: hot-key stats (count > target) broadcast onto both sides; each key's fan-out g = ceil(count/target), so uniform keys join salt-free and a hot key occupies g shuffle partitions bounded by ~target rows each",
  "q_knn_ivf_idx" -> "persisted IVF index read: centroids broadcast from the index table; the bucket scan reads the cluster-partitioned assignment table through a dynamicpruning partition filter -- nProbe/nCentroids of the corpus, not all of it",
  "q_embedding_quantize" -> "int8 quantization at scan speed: higher-order array ops, per-row, zero exchanges before the final sort",
  "q_gauge_locf" -> "gauge LOCF resampling: generated (key x hour) grid + the AsOfJoin merge-walk operator -- samples shuffle once, grid never stored, no per-grid-point rescan",
  "q_rate_anomaly" -> "z-score alerting: raw events reduce at the FIRST aggregation; per-key moment stats broadcast back onto group-cardinality-sized rows",
  "q_quality_gate" -> "per-source discrete-percentile gate: cumulative windows over DISTINCT token-count values only (value-domain-bounded, never document-count), threshold broadcast into one grouped pass",
  "q_percentiles_big" -> "counting-based exact percentiles: (group, value, cnt) reduction, bracketing rows via conditional aggregation -- per-task state O(distinct values), not O(group rows) like the percentile() buffer",
  "q_lttb" -> "LTTB downsampling: series bounds and bucket-neighbor stats fold to broadcasts; the per-bucket argmax is min(struct) with map-side partials, so only ~|series x buckets| partial rows shuffle -- no per-bucket window over raw points",
  "q_topk_weighted" -> "topKWeighted: keyed weight aggregation, then WindowGroupLimit Partial trims each shuffle partition to its local top-k BEFORE the exchange",
  "q_delta_sum" -> "deltaSum: lag window and final sum ride ONE user-keyed exchange; the positive-delta sum combines map-side",
  "q_interval_union" -> "intervalLengthSum: per-key sweep (running-max window) and the union-length sum on the same single exchange -- no pairwise interval join",
  "q_weighted_median" -> "quantileExactWeighted: cumulative windows over (type, DISTINCT cents) group rows only -- value-domain-bounded, never event-count",
  "q_train_order" -> "reproducible training order: content-fingerprint sort via GlobalRank's range exchange; the only single-partition window is the O(numPartitions) offset frame",
  "q_bpe_merges" -> "BPE merge candidates: per-doc pair explosion, map-side-combined pair counts, global top-k as TakeOrderedAndProject -- no sorted global shuffle",
  "q_counter_increase_mv" -> "mergeable deltaSumTimestamp state: slice statify windows ride the (user,hour) exchange; merge and serve windows run over STATE rows only (group cardinality, never raw events)",
  "q_codec_stats" -> "codec sizing as column math: lag windows + closed-form LEB128 cost on ONE user-keyed exchange, map-side-combinable byte sums, no bytes materialized",
  "q_zorder_slice" -> "z-ordered layout scan: both range predicates reach the parquet scan as PushedFilters over the curve-local files -- min/max skipping works on BOTH dimensions at scale",
  "q_mad_anomaly" -> "median/MAD robust alert: raw events reduce at the first (type,hour) aggregation; both medians run over DISTINCT-value frames and broadcast back",
  "q_value_bands" -> "discrete percentile bands: (type,day,cents) reduction first; cumulative windows over distinct cents only -- value-domain-bounded state",
  "q_top_journeys" -> "path analysis: WindowGroupLimit pre-trims each partition to its local first-k rows per user before the exchange; paths count map-side; top-k as TakeOrderedAndProject",
  "q_source_overlap" -> "source overlap matrix: rare-shingle filter (df<=maxDf) shrinks the self-join input AND removes its hot keys; pair counts combine map-side",
  "q_rolling_dau" -> "trailing-24h distinct users: the DISTINCT (user,hour) frame explodes into its 24 visibility hours (group rows x window, never raw events) then re-counts per target hour",
  "q_split_leakage" -> "leakage audit: LSH-banded pair frame (never all pairs) + two doc-keyed split joins; cell counts combine map-side",
  "q_bm25" -> "BM25 retrieval: ONE tokenize+explode into a conditional-count aggregation (map-side partials); corpus stats fold to a single broadcast row; top-k is TakeOrderedAndProject",
  "q_lm_score" -> "bigram LM scoring: corpus tokenizes once per split; context counts and vocabulary derive from the aggregated bigram-count frame (distinct-bigram-bounded); scoring is two equi-joins",
  "q_bloom_join" -> "runtime-filter join: scalar subquery materializes the bloom ONCE; BloomFilterMightContain guards the fact scan BEFORE the shuffle, so the exchange carries only rows that can join",
  "q_kmv_intersect" -> "KMV theta sketch: the one data-sized op is distinct(type,hash) with map-side dedup; per-type k-minimums via WindowGroupLimit; everything after is O(types^2 x k)",
  "q_gauge_fill" -> "interpolating gap fill: samples+grid union rides ONE key exchange; bracketing samples found by two frame windows -- no per-grid-point rescan, each sample touched once per pass",
  "q_log_templates" -> "log-template mining: per-row mask+prefix (codegen'd), one keyed aggregation whose map-side combine collapses each partition to its distinct templates before the exchange",
  "q_welch_ttest" -> "statistical tests: one map-side-combinable moments aggregation (BIGINT sums); the t/df arithmetic runs on group-count-sized rows after a tiny pair join",
  "q_knn_pq" -> "PQ-ADC: codebook and per-probe LUTs broadcast; encode is m argmax rows/vector through map-side aggregation; ADC scan O(m)/pair with WindowGroupLimit pool trim, exact re-rank on id-lookups only",
  "q_knn_ivfpq" -> "IVF-PQ composite: the codes scan reaches the cluster-partitioned table through a dynamicpruning PartitionFilter (probed buckets only), LUTs broadcast, O(m) ADC inside buckets, exact re-rank over the bounded pool",
  "q_partition_prune" -> "daily hive layout + DPP: the top-days dim broadcasts and becomes a dynamicpruning PartitionFilter on the fact scan -- skipped day directories are never listed or opened",
  "q_trailing_window" -> "event-time RANGE frame: trailing-30-min per-user aggregate on ONE user-keyed exchange; integer cent sums keep SQL peer semantics hash-exact",
  "q_dedup_history" -> "bloom-gated incremental dedup: history hashes fold into a scalar-subquery bloom; bloom-negative rows bypass the anti-join (union branch), only maybe-seen rows re-check exactly",
  "q_bm25_idx" -> "persisted inverted index: the postings scan carries PartitionFilters on the query terms' shard ids (64 -> <=|terms| partitions listed); corpus stats come from the narrow doclen table; the corpus text never appears in the plan",
  "q_boolean_and" -> "posting-list AND: same shard-pruned postings scan, distinct-term count per doc, doclen equi-join -- conjunctive retrieval without tokenizing anything",
  "q_hybrid_rrf" -> "RRF fusion (round 8: sparse leg off the PERSISTED shard-pruned postings -- the corpus text never appears in the plan): the two ranked legs are bounded (<=nCand rows each) and full-outer join on doc_id; integer ppb contributions; top-20 via TakeOrderedAndProject",
  "q_pagerank" -> "5 Pregel rounds off the persisted pair table: per round one hash join of the rank frame onto the checkpointed symmetric edge list + one keyed BIGINT sum; pair GENERATION is absent from the plan (reads neardup_pairs_900)",
  "q_triangles" -> "compact-forward triangles: wedge equi-join on the shared endpoint, closing (a,c) probe as left-semi hash join, per-corner credit via explode + keyed count -- no orientation explosion, nothing corpus-quadratic",
  "q_phrase" -> "positional phrase match: each term's pruned posting row joins on doc_id; occurrences are one higher-order filter over the first term's position list -- no text, no explode, nothing corpus-sized",
  "q_central_survivors" -> "composite keep list: CC labels join PageRank ranks; the per-family argmax is ONE grouped max(struct(rank,-id)) with map-side partials -- no per-cluster window sort",
  "q_snippets" -> "snippet generation: the bounded phrase-match frame (matches only) joins TO the corpus and re-tokenizes just those documents; the corpus-sized side never shuffles",
  "q_prefix_search" -> "term-dictionary prefix scan: StartsWith pushes into the postings parquet scan (PushedFilters); df/ctf are one keyed agg over posting rows -- the corpus text never appears in the plan",
  "q_more_like_this" -> "more-like-this: probe vocabulary and its df counts fold to broadcasts; the postings scan joins them broadcast-hash (no postings shuffle); only matched rows reach the doc-keyed rollup; top-k via TakeOrderedAndProject",
  "q_repeated_ngrams" -> "repeated n-grams: one tokenize+explode, map-side-combined n-gram counts, one n-gram-keyed equi-join back, per-doc rollup -- the same volume class as the inverted-index build, AQE on hot n-grams",
  "q_containment" -> "shingle containment: distinct (doc,source,shingle) reduction, candidates from the (source,shingle) equi-join (banded class, no all-pairs), integer count rollups on both sides",
  "q_degree_dist" -> "degree histogram: two keyed BIGINT aggregations over the persisted pair table; candidate generation absent from the plan (reads neardup_pairs_900)",
  "q_ks_test" -> "KS test: events reduce to the DISTINCT value domain at the first aggregation; cumulative windows run over value-domain rows only; totals attach as a broadcast 1-row aggregate",
  "q_mannwhitney" -> "Mann-Whitney U: same distinct-value fold and bounded cumulative frame as q_ks_test; doubled midranks keep every quantity BIGINT",
  "q_wilson_ci" -> "Wilson bounds: one map-side-combinable integer aggregation to hours; the mirrored double tree runs on hour-count-sized rows",
  "q_cusum" -> "CUSUM shift: (type,hour) reduction first; running prefix-sum/min windows over hour-count-sized per-key partitions; the peak row is a per-key row_number argmax",
  "q_autocorr" -> "lag autocorrelation: events reduce to (key,hour) at the first aggregation; the lag pairing is a self equi-join on the shifted hour over hour-count frames; BIGINT moments combine map-side",
  "q_benford" -> "Benford screen: one map-side-combinable digit aggregation; the 9-row grid and log-table literals are plan constants; totals attach as a broadcast 1-row aggregate",
  "q_hod_seasonality" -> "hour-of-day eta^2: (key,hour) reduction, then group/total aggregates over <=24 rows per key; the 24-cell fold is an ordered array aggregate, no window over raw events")

val sb = new StringBuilder
sb.append("# PLANS -- physical plans of headline queries (sf0.01, auto-generated)\n\n")
sb.append("Generated by `tools/dump_plans.scala`. What to look for is noted per query;\n")
sb.append("regenerate after plan-affecting changes.\n")
for ((name, note) <- headline) {
  val df = graft.SparkEntry.queries(name)(spark, sfDir)
  sb.append(s"\n## $name\n\n$note\n\n```\n")
  sb.append(df.queryExecution.executedPlan.toString.take(6000))
  sb.append("\n```\n")
}
Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE PLANS.md")
sys.exit(0)
