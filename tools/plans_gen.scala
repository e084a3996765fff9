import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions","32")
spark.conf.set("spark.sql.session.timeZone","UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong","true")
val dir = "/root/testdata/sf0.01"
val picks = Seq(
  "q1_agg" -> "partial+final hash aggregate, pushed ship-date filter, pruned scan",
  "q6_forecast" -> "every predicate at the parquet scan; map-only partial agg, 1-row exchange",
  "q5_region_revenue" -> "6-table star: fact shuffles on its own keys only, every dim broadcast",
  "q8_market_share" -> "nation dim in two broadcast roles; one fact pipeline",
  "join_bucketed" -> "bucketed+sorted layout: sort-merge join with ZERO exchanges below the rollup",
  "source_partition_pruned" -> "day filter resolved against directory names at plan time",
  "sort_limit" -> "global top-k as TakeOrderedAndProject (per-partition heaps, no full sort)",
  "sample_per_group" -> "rank<=k under a window engages WindowGroupLimit before the sort",
  "dedup_minhash" -> "banded LSH: the band index is ONE stateless typed pass per document (DeserializeToObject/MapPartitions, no 96-column aggregate, sub-MiB task binary); candidate generation is an equi join on band keys, never all-pairs",
  "tfidf" -> "tf-idf: df is a groupBy(term) table broadcast-joined back onto the memoized tf frame - NO Window in the plan, so a hot term ('the') never lands one partition",
  "dedup_containment_ppjoin" -> "asymmetric PPJoin rung (r9): length + ROW-LEVEL positional filters inside the prefix-bag equi join (pruned rows never shuffle), then the multi-witness count at the pair aggregate - 119x fewer candidates than the plain containment prefix reach the full-set verify",
  "cosine_topk_ivf" -> "IVF: broadcast centroid cross, inverted-list equi join, windowed top-k",
  "global_row_ids" -> "range partition + sortWithinPartitions; ordinals stamped map-side via zipWithIndex",
  "q2_min_cost_supplier" -> "correlated min as ONE per-part window over the derived partsupp: single shuffle, no self-join re-derivation",
  "skyline_parts" -> "Pareto frontier: bucket-partitioned prune window first, global sweep only over the surviving candidates",
  "simhash_pairs" -> "banded simhash near-dup: candidates from a 15-bit band-key equi join, popcount verify on candidates only",
  "pq_codes" -> "PQ encode: codebook as plan literals, map-only argmin — no join, no exchange anywhere",
  "pq_topk_ivf" -> "IVF+PQ: probe-bounded candidates, ADC scoring via broadcast distance tables",
  "embedding_gram" -> "Gram matrix: per-partition cell folds, ONE aggregate over O(cells x partitions) rows — no self-join of the corpus",
  "sparse_cosine_pairs" -> "sparse tf-idf cosine: df is a groupBy(gram) table broadcast-joined back (r10: NO per-gram Window — a hot bigram never lands one sort buffer), cap below the posting self-join bounds candidates; global top-K is TakeOrdered",
  "join_interval" -> "interval-overlap join: both sides explode to time chunks, hash equi join on chunk + exact residual, distinct collapses multi-chunk pairs — no nested loop",
  "join_fuzzy_jaro" -> "blocked fuzzy join: hash equi join on the block key; the codegen'd jaro_winkler expression scores inside the joined projection",
  "asof_join_native" -> "native as-of exec: one shuffle+sort per side, single-pass merge — no union, no WindowExec (compare the asof_join composed form)",
  "asof_nearest_native" -> "nearest mode on the same exec: the forward candidate is the merge head already in hand, so the plan is IDENTICAL to backward — no second frame, no union",
  "dedup_prefix_filter" -> "AllPairs prefix filter: df join ranks shingles by global rarity, the candidate equi join sees only the ~20% rarest per doc, exact verify on candidates via the full-set arrays — complete for J>=0.8 with NO hot-key drop",
  "dedup_ppjoin" -> "PPJoin rung: length filter applied INSIDE the prefix equi join (both sides carry set sizes), first-shared-key positional bound at the pair aggregate — strictly fewer candidates reach the full-set verify join, nothing qualifying lost",
  "cosine_topk_ivf_incr" -> "incremental IVF maintenance: settled inverted lists come from the session cache (InMemoryRelation — the 100 TB state is READ, not rebuilt), batch assignment is the broadcast centroid cross over the batch slice only, the union feeds the unchanged probe-bounded query side",
  "entity_resolution" -> "record linkage (r11): RAREST-TOKEN blocks (df-ranked min_by over the broadcast vocabulary frame, 4096 cap) feed the jaro candidate hash join; the pair set crosses a LogicalRDD lineage cut before the component fixpoint so Catalyst never re-plans the blocking chain per round; golden-record rollup on the label equi join — dictionary-sized frames only",
  "join_fuzzy_jaro" -> "fuzzy similarity join (r11): candidates share their rarest token — one real exchange (the per-name min_by aggregate; df and block-size tables broadcast), candidate pairs from a hash equi join on blk, the codegen'd jaro-winkler scores only within-block pairs (first-token blocks were quadratic in the catalog: e=2.00 measured vs e~1.3)",
  "phrase_match_indexed" -> "indexed phrase search (r11): the persisted postings table is bucketed+sorted by tok, so each term's filter prunes the scan to ITS bucket at planning time (SelectedBucketsCount: 1 out of 32 on both branches) - the probe reads two posting lists, never the corpus; adjacency is the (doc_id, pos+1) hash join",
  "txlog_mor_merge" -> "merge-on-read read-back (r11): the scan carries the DV anti-join - parquet FileScan (+ _metadata coordinates) left-anti joined against the batch-sized deletion-vector sidecars, then the appended upsert files union in; no data file was rewritten at write time (268 KB written where COW rewrote 17.2 MB on the dispersed Zipf batch)",
  "psi_drift" -> "drift monitor: reference deciles ride as literals (map-only binning of both snapshots), totals window over the 10-row bucket spectrum",
  "topic_words" -> "per-source tf-idf rank: WindowGroupLimit keeps only K rows per source below the sort; df side aggregates the Heaps-bounded (source,word) frame",
  "compaction_plan" -> "compaction planner: fact table folds to the per-day file manifest in one partial+final aggregate; the packing window ranges over manifests, never rows",
  "cosine_topk_lsh_mp" -> "multi-probe LSH: the query side explodes x(1+B) probe masks (bitwise-xor on the bucket id), the corpus-side index is the SAME bucket frame as single-probe - recall is bought on the probe side, candidates still flow through one (tbl,bucket) equi join",
  "stream_enrich" -> "stream-static enrichment twin: fact scan joins the broadcast dim then folds into the windowed partial+final aggregate - zero join state, the dim never shuffles the fact side",
  "stream_interval_join" -> "stream-stream interval join twin: equi join on user_id with the time-range bound as join residual - hash join, never a nested loop; in streaming form the same condition makes both buffers watermark-evictable",
  "dedup_minhash_incr" -> "incremental MinHash maintenance: BOTH settled frames read from the session cache (InMemoryRelation - the persisted band index), batch signatures aggregate over the batch slice only, candidates from one (band,bkey) equi join against the settled buckets",
  "stream_neardup" -> "streaming ingest twin: the arriving docs run ONE typed pass (DeserializeToObject/MapPartitions - per-row signatures, no aggregation), then two equi joins against the cached settled index; the only other operator is the pair dedup - in streaming form that is the watermark-bounded state",
  "dedup_minhash_incr_durable" -> "durable-table maintenance (r10): the settled band index is a bucketed+sorted TABLE (FileScan ... Bucketed: true) - the batch keys broadcast onto the table scan, so the corpus side has NO exchange and NO cache-residency dependence; verification sets come from the sets table",
  "token_entropy" -> "per-source entropy (r10): per-source totals are a second groupBy broadcast-joined back (n_sources rows) - NO per-source Window, so a vocab-sized partition sort can never exist",
  "dedup_similarity_histogram" -> "threshold-tuning histogram (r10): candidates from the PPJoin rung at t=1/2 (lossless length+positional filters - 3.3x fewer verification pairs than plain prefix, 9.1x vs the raw shingle self-join's Theta(sum df^2)), exact j on candidates via the full-set arrays, floor-bucket aggregate",
  "source_avro" -> "graft-avro DataSource V2 (r10): BatchScan with the DECODER-level pruned reader schema (ReadSchema lists only the projected columns - dropped fields are skipped bytes, never values) over sync-marker byte-range splits",
  "txlog_skipping" -> "transactional-table stats-pruned scan (r10): the snapshot resolves from the log (no directory listing); footer min/max excluded every file whose id range misses the predicate BEFORE this plan was built, so the FileScan's file list is already the pruned set - the filter still applies row-level",
  "txlog_merge" -> "keyed MERGE read-back (r10): an ordinary pruned parquet scan - the interesting work happened at WRITE time (stats pre-prune, semi-join dirty-file mapping, COW rewrite of 1 file); the read path pays nothing for the table being transactional")
val sb = new StringBuilder
sb ++= "# PLANS — executed physical plans for the headline queries\n\n"
sb ++= "Generated from `.queryExecution.executedPlan` at sf0.01 on `local[4]`,\n"
sb ++= "`spark.sql.shuffle.partitions=32` (regenerate: `tools/plans_gen.scala`\n"
sb ++= "via spark-shell with the packaged jar). These are the shapes\n"
sb ++= "PlanShapeSpec pins; the annotations say what each plan must keep at\n"
sb ++= "100 TB.\n"
for ((name, why) <- picks) {
  val df = graft.SparkEntry.queries(name)(spark, dir)
  df.collect()
  val p = df.queryExecution.executedPlan.toString
  sb ++= s"\n## $name\n\n$why\n\n```\n${p.take(3800)}\n```\n"
}
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE " + sb.length)
System.exit(0)
