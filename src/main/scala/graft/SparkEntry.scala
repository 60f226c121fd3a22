package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a runnable
  * DataFrame plan over the driver's parquet tables; `oracleSql` holds the
  * DuckDB-equivalent SQL for the hash-compare correctness gate.
  */
object SparkEntry {

  /** Root of the driver's deterministic test tables — env-overridable so
    * specs and the Bench warm-up share one knob instead of hard-pinning
    * this host's layout. */
  def testdataRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q03TopRevenueOrders(spark, s"$testdataRoot/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.relational ++ IceQueries.all ++ LlmQueries.all ++ StreamQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * `IceQueries.dynamicOracle` entries are registered by the write-path
    * queries at RUN time (their SQL embeds the just-written table's file
    * paths), so this must be collected after `queries` run — which is the
    * order Verify already uses. */
  def oracleSql: Map[String, String] =
    Queries.relationalOracle ++ LlmQueries.oracle ++ StreamQueries.oracle ++
      IceQueries.oracle ++ IceQueries.dynamicOracle

  /** Bench-only raw-operator bodies (see [[LlmQueries.benchOps]]) — timed by
    * Bench but NOT part of the driver correctness contract. */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] =
    LlmQueries.benchOps ++ IceQueries.benchOps

  /** Per-entry session-conf overrides Bench applies around an entry's
    * timed reps (set before, restored after). The session-wide AQE
    * coalescer floor (16k, set in Bench for the CPU-bound text pipelines —
    * see Bench.scala) costs q09 a reproducible ~0.2 s: its 2.6 MB window
    * shuffle is scheduling-bound, so the floor's extra tiny tasks are pure
    * overhead — the entry runs under Spark's default 1m floor instead
    * (guide §1.3: stop when the fix costs elsewhere). Both values are
    * inert at production shuffle sizes (partitions exceed 1 MB either
    * way), so nothing here is tuned to local mode. tx_doc_rarity,
    * pipe_cluster_mix and tx_classify were A/B-measured twice and are
    * floor-indifferent (within noise) — left on the session default. */
  def benchConf: Map[String, Map[String, String]] = Map(
    "q09_window_orders" -> Map(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1m"))

  /** Untimed per-entry Bench hooks: setup before an entry's reps (e.g. the
    * IVF index build on the measured SF), teardown right after (release
    * pinned executor storage). */
  def benchSetup: Map[String, (SparkSession, String) => Unit] =
    LlmQueries.benchSetup ++ IceQueries.benchSetup
  def benchTeardown: Map[String, (SparkSession, String) => Unit] =
    LlmQueries.benchTeardown ++ IceQueries.benchTeardown

  /** Subset used by Bench as the headline performance set.
    *
    * NAME BREAK (round 8): `dd_simhash` → `dd_simhash_op` and
    * `sim_topk_lsh` → `sim_topk_lsh_op`. The old entries benched the audit
    * harness (dual hash pipelines / brute-force recall sibling) added in
    * round 7, which made r6→r7 totals compare different work; the `_op`
    * entries time the raw operator alone. r7 bench numbers for those two
    * names are NOT comparable to r8's.
    *
    * NAME BREAK (round 10): `sim_topk_sq` → `sim_topk_sq_op` — the r9
    * entry re-trained the k-means coarse quantizer inside the timed body;
    * the `_op` entry probes a prebuilt index (build-once-search-many, the
    * operator's documented contract). r9's `sim_topk_sq` timing is NOT
    * comparable.
    *
    * NAME BREAK (round 11): `sim_topk_sq_op` → `sim_topk_sq_ann` — the r10
    * entry probed every cell of an nlist=8 index (a full int8 scan, no ANN
    * pruning measured); the `_ann` entry probes 8 of 64 cells. Listed LAST
    * so its persisted index never competes with other entries' scan cache
    * (Bench tears it down right after the reps regardless). r10's
    * `sim_topk_sq_op` timing is NOT comparable. */
  def benchQueries: Seq[String] = Seq(
    "q01_pricing_summary", "q03_top_revenue", "q05_nation_revenue",
    "q06_forecast_revenue", "q08_returned_items", "q09_window_orders",
    "q13_rollup", "q20_supplier_scorecard",
    "dd_exact", "dd_minhash_lsh", "dd_simhash_op", "sim_topk_brute",
    "sim_topk_lsh_op", "tx_stats", "tx_langid",
    "mm_features", "pipe_line_dedup",
    // NEW in round 17: pipe_substring_clean — the repeated-span dedup
    // rewrite (window fingerprints + span merge + token cut, the heaviest
    // corpus transform after line dedup) — and tx_doc_rarity — the corpus
    // token-frequency join (vocabulary-keyed shuffle + hot-token skew).
    "pipe_substring_clean", "tx_doc_rarity",
    // NEW in round 18: pipe_cluster_mix (two-pass bucketed census+probe
    // over the embeddings) and pipe_bpe_pairs (codegen'd zip_with pair
    // explosion + Zipf-headed aggregation) get the same regression gate as
    // the rest of the LLM pipeline; pipe_bpe_merge times the full trainer
    // round (count -> winner -> greedy apply, a pure per-doc projection).
    "pipe_cluster_mix", "pipe_bpe_pairs", "pipe_bpe_merge",
    // NEW in round 19: pipe_bpe_train — the 3-round trainer LOOP (per-round
    // persist/unpersist, two corpus jobs per round); mm_decode_jpeg, which
    // now times six codec passes per doc (sequential + progressive +
    // 12-bit, both directions); tx_classify — the hashed-linear model
    // filter as one codegen'd projection; pipe_decontam_fuzzy — the
    // corpus x benchmark LSH join + exact-Jaccard verify; pipe_pack_docs —
    // the per-bucket greedy recurrence + census chaining.
    "pipe_bpe_train", "mm_decode_jpeg", "tx_classify",
    "pipe_decontam_fuzzy", "pipe_pack_docs",
    // NEW in round 20: pipe_bpe_train_batched — 2 rounds x top-3
    // non-interacting merges in one pass each (6 merges for the job count
    // the sequential trainer spends on 2); mm_decode_gif — the LZW
    // codec round-trip, sequential + interlaced per doc; mm_decode_tiff —
    // six baseline-TIFF round-trips per doc (3 compressions + predictor +
    // gray + palette).
    "pipe_bpe_train_batched", "mm_decode_gif", "mm_decode_tiff",
    // NEW in round 12: the v3 DELETION-VECTOR merge-on-read scan (table
    // built + deleted in untimed setup; body is the DV-filtered read).
    // NEW in round 13: ice_cdc_read — full-history CDC changelog over a
    // multi-commit table with position + equality deletes (untimed build) —
    // and ice_stats_build — the NDV-statistics distributed sketch pass +
    // puffin write + registration commit (table built untimed).
    // NEW in round 14: ice_stats_incr — the INCREMENTAL refresh (append
    // ~10% of orders + theta-union into the setup-registered sketches);
    // read next to ice_stats_build, which is the same table's full-rebuild
    // cost.
    // NEW in round 15: ice_agg_meta — the metadata-answered GROUP BY
    // rollup over a prebuilt identity-partitioned multi-file table (the
    // body REQUIREs a LocalTableScan plan, so the number is pure planning
    // cost — the zero-I/O claim as a tracked number). All placed before
    // sim_topk_sq_ann, which stays LAST by design.
    "ice_mor_dv_read", "ice_cdc_read", "ice_stats_build", "ice_stats_incr",
    "ice_agg_meta",
    "sim_topk_sq_ann")
}
