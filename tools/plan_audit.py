"""Regenerates PLANS.md: formatted physical plans of the headline
queries with the scale-relevant facts surfaced (pushdown, pruning,
broadcasts, codegen spans, window-limit pushdown).

    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from lawlm_spark.session import get_spark

AUDITED = [
    "v1_scan_filter_project",
    "v3_anti_join",
    "v6_tpch_q1",
    "v7_topk_window",
    "v8_rrf_fusion",
    "v9_bm25_index",
    "v10_cosine_topk",
    "d5_minhash_dedup",
    "d9_embedding_dups_lsh",
    "v25_tpch_q5",
    "v26_scalar_subquery",
    "o2_sources_projection",
    "v9_bm25_map",
    "d8b_ann_multiprobe",
    "r4_hybrid_ann",
    "d16b_token_packing_sharded",
    "r5_salted_join",
    "r5_ivf_prebuilt",
    "d19_training_mix",
    "d20_incremental_neardup",
    "d21_curate_mix_pack",
    "d23_boilerplate",
    "d25_decontamination",
    "d26_domain_cap",
    "d29_dup_spans",
    "d31_unigram_nll",
    "r6_pq_adc",
    "d33_cluster_balance",
    "v40_scd2",
    "d38_semdedup",
    "d39_zorder",
    "d40_bigram_nll",
    "v45_funnel",
    "v47_gap_fill",
    "d45_weighted_sample",
    "d46_ctfidf_topics",
    "d48_hll_distinct",
    "d50_group_split",
    "d51_triangles",
    "d54_prefix_join",
    "r7_ivfpq",
    "d59_incremental_agg",
    "d61_expectations",
    "d63_association_rules",
    "r8_sq8_topk",
    "v63_temporal_join",
    "d72_winsorize",
    "d69b_equidepth_approx",
    "d68_modularity",
    # r9: the decorrelation stressors — the audit point is that BOTH
    # correlated subqueries rewrite to joins (semi/anti for v67, an
    # aggregate join-back for v68), never a per-row subquery loop
    "v67_q21_shape",
    "v68_q20_shape",
    # r9 session 2: Q22's scalar subqueries must plan as one-time
    # Subquery nodes + an anti join; Q2's correlated min as an
    # aggregate join-back.  (d74_winnowing moved to SPECIAL in r10:
    # the registered entry now ends in an eager lineage cut, so its
    # own plan is a bare checkpoint scan — the meaningful plan is the
    # PRE-cut pipeline the builder reconstructs.)
    "v69_q22_shape",
    "v70_q2_shape",
    # r10: the quantified pattern matcher — the audit point is ONE
    # hash partitioning on user_id reused by the encode window, the
    # per-run aggregate, and the lead-probe window (exactly one
    # Exchange), with no Cartesian/BNLJ from the disjunct coalesce
    "v71_match_recognize",
    # r11: the MEASURES extension — the audit point is that segment
    # measures (sum/max per pattern element) add COLUMNS to the
    # per-run aggregate, not stages: still exactly one Exchange
    "v73_match_measures",
    # r12: the NFA generalization — the audit point is that the key
    # prefilter windows and the applyInPandas boundary all reuse the
    # encode exchange: one hashpartitioning total, and only candidate
    # keys cross into Python
    "v75_nfa_pattern",
    # r13: bounded quantifiers + alternation composition — the audit
    # point is that run-length bounds and the row-level symbol mapping
    # are predicates/projections on the v71 shape: still exactly one
    # Exchange, no new stage
    "v76_bounded_pattern",
    "v77_alternation_pattern",
    # r14 (ADVICE r13): the ARMED hot-key guards — the audit point is
    # the refined-key pair join (cluster+_sub / refined bucket) costing
    # exactly one additional keyed exchange per join side over the
    # coarse window shuffle, with no SinglePartition anywhere
    "d75_semdedup_capped",
    "d76_lsh_refined",
    # r14: PERMUTE — the audit point is the match_nfa shape holds (one
    # hashpartitioning reused by encode, the anchor prefilter windows,
    # and the applyInPandas boundary; only candidate keys enter Python)
    "v78_permute_pattern",
    # r15 (VERDICT r14 item 5): MMR — the audit point is the absence of
    # ANY pair join (sims are computed inside the grouped greedy) and
    # the greedy being one FlatMapGroupsInPandas with every exchange
    # keyed on query_id
    "r10_mmr_diversify",
    # r15 (VERDICT r14 item 3): weighted RRF — the audit point is the
    # fusion staying ONE hash aggregate over the union with the branch
    # weight riding as a literal `_w` column (no extra exchange vs the
    # unweighted v8 shape)
    "r9_weighted_hybrid",
    # r15: late-interaction MaxSim — the audit point is the query-token
    # side riding a BroadcastNestedLoopJoin into the corpus token
    # stream (the corpus never shuffles to meet the queries) and the
    # only keyed exchanges being the two map-side-partial aggregates +
    # the WindowGroupLimit top-k
    "r11_maxsim_topk",
    # r15: two-stage MaxSim re-rank (PLAID shape) — the audit point is
    # BOTH small sides broadcasting (pair list on the doc key, query
    # tokens on the query key): two BroadcastHashJoins, no shuffled
    # join, corpus tokens scored only for shortlisted pairs
    "r12_maxsim_rerank",
    # r15: bounded PERMUTE — the audit point is the match_permute shape
    # holding under the two-sided boundary scan: one hashpartitioning
    # reused by encode, the prefilter windows, and the applyInPandas
    # boundary
    "v79_bounded_permute",
    # r14 session 2: 2-D skyline — the audit point is the corpus-side
    # exchange being the m1 hash aggregate only (map-side partial_max),
    # the SinglePartition window sitting ABOVE that bounded aggregate,
    # and the join back being a broadcast semi join
    "d77_pareto_skyline",
    # r16: RM3 expansion — the audit point is EVERY query-side relation
    # (terms, feedback docs, expansion weights) broadcasting: the
    # corpus posting pipeline meets only BroadcastHashJoins, the keyed
    # exchanges are the map-side-partial aggregates, and both top-k
    # boundaries are WindowGroupLimit; no SortMergeJoin anywhere
    "r13_rm3_expand",
    # r16: pairwise re-rank — the audit point is the maxsim_rerank
    # shape over whole texts: shortlist broadcasts on the doc key,
    # queries on the query key (two BHJs), the overlap score is pure
    # codegen set algebra, one WindowGroupLimit boundary
    "r14_crossenc_rerank",
    # r16: snapshot diff — the audit point is ONE full-outer
    # SortMergeJoin on the key over the two version scans (each side
    # exchanges once on the key hash) with row-local classification;
    # no extra shuffle, no broadcast of a table-sized side
    "v80_snapshot_diff",
    # r16 session 2: change feed read — the audit point is the
    # version-range bound reaching the scan as a PartitionFilter over
    # the batch=<id> dirs (incremental consumers never scan the whole
    # feed); the per-batch write half is v80's diff plan per batch
    "v81_change_feed",
    # r16 session 2: SDM proximity — the audit point is the two
    # contribution streams (posting × broadcast terms, bigram explode
    # × broadcast query bigrams) unioning into ONE keyed aggregate:
    # both corpus branches BroadcastHashJoins, no corpus bigram index
    # materialized, one exchange + WindowGroupLimit
    "r15_sdm_proximity",
    # r17: full three-feature SDM — the audit point is the THIRD
    # (unordered-window) corpus branch joining broadcast-side only:
    # positions prefilter through a broadcast semi-join on pair terms,
    # fold to a per-doc term->positions map, and the partner lookup is
    # element_at on the same row (no positional self-join exchange);
    # three branches union into ONE keyed aggregate + WindowGroupLimit
    "r16_sdm_window",
    # r17: incremental MV fold — the audit point is NO join anywhere
    # (feed rows explode map-side into <= 2 deltas, state ∪ deltas runs
    # one keyed aggregate) and the version-bounded feed reads pruning
    # on the batch partition column
    "v82_incremental_mv",
    # r17: Rocchio dense PRF — the audit point is the corpus never
    # shuffling: the feedback probe is one BroadcastHashJoin on the id
    # key, the centroid algebra lives on (query, dim)-sized smalls
    # (broadcast-hinted), and both scoring passes stream the corpus
    # against a broadcast query side + WindowGroupLimit
    "r17_rocchio_expand",
    # r17: incremental SCD2 — the audit point is history passing
    # through TWO broadcast joins on the batch key set (no window over
    # the dimension); the single window exchange is sized by
    # seed ∪ batch.  (v84_streaming_mv's registered plan is just the
    # final MV scan; its meaningful fold plan is v82's, audited above,
    # and the streaming half is crash/chunking-tested in test_cdc.py.)
    "v83_scd2_incremental",
    # r18: Rocchio over the ANN first pass — the audit point is the
    # r17 corpus-never-shuffles shape PLUS the IVF first stage: cell
    # assignment and probes are broadcast-fed, the feedback join keys
    # on the probed candidate ids, and the re-score streams the corpus
    # against broadcast(q2) exactly as r17_rocchio_expand
    "r18_rocchio_ann",
    # r18: BM25F — the audit point is the bm25 family shape holding
    # with a SECOND field branch: corpus-sized sides never join each
    # other (stats + query terms broadcast), the keyed exchanges are
    # the posting/(query,doc) aggregates + the df window, top-k is a
    # WindowGroupLimit (also statically pinned in test_bm25.py)
    "r19_bm25f_topk",
    # r18: session-windowed streaming proximity — the audit point is
    # the registered plan being the pattern probe over the (memory-
    # sink) session table: patterns broadcast (BroadcastNestedLoopJoin
    # on a 3-row side), the adjacency count a row-local higher-order
    # expression, top-k a WindowGroupLimit; the streaming half is the
    # v34-certified session_window shape (sentinel + watermark),
    # crash/convergence-tested in test_streaming.py
    "v86_session_proximity",
    # r18: incremental enriched-view maintenance — the audit point is
    # the per-batch work being feed x BroadcastHashJoin(dim) + the
    # keyed merge window over the batch; the snapshot never re-joins
    # the dimension after bootstrap
    "v87_enriched_mv",
    # r18: feed retention/compaction — the audit point is the consumer
    # fold reading ONLY the post-watermark feed partitions (the
    # expired ones are gone from disk; the v82 no-join delta shape on
    # what remains) against the MV-sized compacted base scan
    "v85_feed_compaction",
    # (d78_dsir_select moved to SPECIAL in r15: the ADVICE r14 leak fix
    # ends the registered entry in an eager lineage cut, so its own
    # plan is a bare checkpoint scan — the meaningful plan is the
    # PRE-cut pipeline, the d74 precedent.)
]


# Sections whose meaningful plan is NOT the registered query's plan:
# iterative queries lineage-cut per round (the composed plan is a
# checkpoint scan), and streaming queries plan per micro-batch.  Each
# builder returns the DataFrame whose plan IS the claim (VERDICT r6
# item 3); the matching plan asserts live in the tests named in NOTES.


def _build_d37_round(spark, sf):
    from pyspark.sql import functions as F

    from lawlm_spark.operators.pagerank import (
        RANK_SCALE,
        entity_graph_edges,
        pagerank_round,
    )

    e = (
        entity_graph_edges(spark, sf)
        .select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("outdeg"))
    n = nodes.count()
    state = (
        nodes.join(outdeg, "node", "left")
        .withColumn("rank", F.lit(RANK_SCALE // n))
        .localCheckpoint()
    )
    return pagerank_round(state, e, n)


def _build_d66_round(spark, sf):
    from pyspark.sql import functions as F

    from lawlm_spark.operators.labelprop import lpa_round
    from lawlm_spark.operators.pagerank import entity_graph_edges

    pairs = entity_graph_edges(spark, sf)
    e = (
        pairs.select("src", "dst")
        .union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    return lpa_round(e, labels)


def _build_v43_merge(spark, sf):
    from pyspark.sql import functions as F

    from lawlm_spark.operators.relational import merge_changes

    cust = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    changes = cust.limit(200).select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("_v2")).alias("c_name"),
        "c_acctbal",
        F.when(F.col("c_custkey") % 5 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.lit(1).alias("seq"),
    )
    return merge_changes(cust, changes, "c_custkey", ["seq"])


def _build_v41_stream(spark, sf):
    from pyspark.sql import functions as F

    from lawlm_spark.streaming.stateful import stateful_sessions

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 3).cast("string").alias("user_id"),
            (F.col("value") * 1_000_000).alias("ts_us"),
        )
        .withWatermark("ts", "1 minute")
    )
    return stateful_sessions(stream, gap_us=3_600_000_000)


def _build_v72_stream(spark, sf):
    from pyspark.sql import functions as F

    from lawlm_spark.streaming.enrichment import stateful_enrichment

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .select(
            (F.col("value") % 3).alias("user_id"),
            F.col("value").alias("event_id"),
            (F.col("value") * 1_000_000).alias("ts_us"),
            F.when(F.col("value") % 5 == 0, F.lit("U"))
            .otherwise(F.lit("D"))
            .alias("kind"),
            (F.col("value") % 100).alias("val"),
        )
    )
    return stateful_enrichment(stream)


def _build_v74_stream(spark, sf):
    from pyspark.sql import functions as F

    from lawlm_spark.streaming.enrichment import stateful_enrichment_ttl

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .select(
            (F.col("value") % 3).alias("user_id"),
            F.col("value").alias("event_id"),
            (F.col("value") * 1_000_000).alias("ts_us"),
            F.when(F.col("value") % 5 == 0, F.lit("U"))
            .otherwise(F.lit("D"))
            .alias("kind"),
            (F.col("value") % 100).alias("val"),
        )
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("ts", "0 seconds")
    )
    return stateful_enrichment_ttl(stream, 86_400_000_000)


# caches the SPECIAL builders leave persisted so their plans keep the
# InMemoryTableScan evidence through emit; main() unpersists at the end
_CLEANUP: list = []


def _build_d74_precut(spark, sf):
    """The d74 pipeline BEFORE the registered entry's eager lineage cut
    (r10: _d74_winnowing checkpoints its 20-row result to unpersist the
    fingerprint cache, so the registered plan is a bare checkpoint scan
    — auditing THAT was vacuous; this rebuilds the real plan)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lawlm_spark.operators.fingerprint import winnow_pairs
    from lawlm_spark.sources.testdata import load_table

    docs = load_table(spark, sf, "documents")
    pairs = winnow_pairs(
        docs, "doc_id", "text", k=8, w=6, max_doc_freq=50,
        cache_registry=_CLEANUP,
    )
    top = pairs.orderBy(F.desc("shared"), "doc_a", "doc_b").limit(20)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("shared"), "doc_a", "doc_b")),
    )


def _build_d78_precut(spark, sf):
    """The d78 pipeline BEFORE the registered entry's eager lineage cut
    (r15: _d78_dsir_select checkpoints its flagged output to unpersist
    the score cache per ADVICE r14, so the registered plan is a bare
    checkpoint scan — this rebuilds the real plan: bucket ratio
    BROADCASTING into the scoring join, one doc-keyed exchange for the
    per-doc sum, TakeOrderedAndProject for the selection boundary,
    SinglePartition only above the <= num_buckets count table)."""
    from pyspark.sql import functions as F

    from lawlm_spark.operators.dsir import dsir_importance, dsir_select
    from lawlm_spark.sources.testdata import load_table

    docs = load_table(spark, sf, "documents")
    scored = dsir_importance(
        docs, F.col("lang") == "en", num_buckets=512, salt="d78"
    )
    return dsir_select(scored, k=50, keep_all=True, cache_registry=_CLEANUP)


SPECIAL = {
    "d37_pagerank (one round)": _build_d37_round,
    "d66_label_prop (one round)": _build_d66_round,
    "v43_cdc_stream_apply (per-batch merge core)": _build_v43_merge,
    "v41_stateful_timeout (streaming plan)": _build_v41_stream,
    "d74_winnowing (pre-lineage-cut pipeline)": _build_d74_precut,
    "d78_dsir_select (pre-lineage-cut pipeline)": _build_d78_precut,
    "v72_stream_enrichment (streaming plan)": _build_v72_stream,
    "v74_enrichment_ttl (streaming plan)": _build_v74_stream,
}

# prose printed under a section: what the filtered plan must show and why
# it survives a 100x scale-up (VERDICT r5 #7)
NOTES = {
    "d69b_equidepth_approx": (
        "The ungrouped-safe equi-depth scale path (r8: bins now assigned "
        "by the RAW double value, not a truncated integer): one "
        "constant-state hist_bins aggregate over the corpus, boundary "
        "derivation over <=n_bins sketch rows (the only SinglePartition "
        "stage, constant-size by construction), then the k-1 boundary "
        "array rides a BroadcastNestedLoopJoin back to the corpus — bin "
        "assignment is pure codegen (size/filter over the array), the "
        "envelope aggregate is one keyed exchange.  The corpus is never "
        "globally sorted (contrast: the exact ntile form RAISES "
        "ungrouped).  Plan-asserted in tests/test_sketches.py::"
        "test_equidepth_approx_plan_no_corpus_sort."
    ),
    "d68_modularity": (
        "Per-community Newman modularity terms: canonical-edge distinct, "
        "two label joins (broadcast at this SF; hash-keyed at scale), "
        "community-keyed aggregates for e_in/d_tot, and the edge total m "
        "riding back as a broadcast 1-row singleton (the d37 dangling-"
        "mass pattern) — no cartesian, no driver fold (callers sum the "
        "tiny per-community result driver-side; pinned in tests/"
        "test_labelprop.py::test_modularity_driver_side_fold...).  Each "
        "contribution is one exact-integer-input IEEE expression "
        "normalized `round(...)+0.0` so neither engine can emit a "
        "signed zero (the r7 d68 hash miss)."
    ),
    "d20_incremental_neardup": (
        "The O(batch) contract: the NEW-batch side (shingles + bands of the "
        "incoming docs) builds the BroadcastExchange on every join; the "
        "persistent corpus index only ever streams through BroadcastHashJoins "
        "— no shuffle of the index, no SortMergeJoin anywhere.  At 100 TB the "
        "index is billions of rows but the batch stays broadcast-sized, so "
        "per-batch cost is proportional to the batch, not the corpus "
        "(plan-asserted in tests/test_incremental_neardup.py)."
    ),
    "d21_curate_mix_pack": (
        "This IS b_prep_full (bench.py).  The outer Exchange (145) is the "
        "per-split hashpartitioning the packing stage runs its cumsum window "
        "on — bins never mix splits, and the window parallelizes across "
        "splits; the curation subtree appears twice (mix needs per-language "
        "token totals before the budget filter) with its exchanges reused "
        "(ReusedExchange) rather than recomputed."
    ),
    "d23_boilerplate": (
        "Corpus-level line removal: explode to a line table, aggregate "
        "normalized-line doc-frequency (one Exchange on the line hash), "
        "anti-join the boilerplate lines back against the exploded docs, "
        "reassemble ordered.  The corpus doc-count joins in as a BROADCAST "
        "singleton (BroadcastNestedLoopJoin over one row), never a shuffle; "
        "the only wide ops are the line-frequency aggregate and the "
        "reassembly window — both keyed and linear in corpus size."
    ),
    "d25_decontamination": (
        "Eval-set decontamination: the eval shingle set (tiny — benchmark "
        "suites vs a 100 TB corpus) is the BroadcastExchange; the training "
        "shingle explode streams map-side through the BroadcastHashJoin "
        "with no shuffle before the per-doc hit count.  Corpus-side cost "
        "is one scan + one keyed aggregate regardless of eval-set count."
    ),
    "d26_domain_cap": (
        "Per-domain cap: one Exchange on the domain key, then "
        "WindowGroupLimit prunes every partition to k rows BEFORE the "
        "full per-domain sort materializes — the plan never holds more "
        "than k rows per domain per task, so a single mega-domain cannot "
        "straggle the stage."
    ),
    "d29_dup_spans": (
        "Substring-level dedup (this drives b_dup_spans via its d30 "
        "removal twin): the positioned-shingle explode is narrow; ONE "
        "Exchange on md5(shingle) serves both the corpus-wide occurrence "
        "count and the global-first rank (same partitioning, one sort); "
        "the island merge re-keys by doc_id — linear, no self-join, no "
        "broadcast of anything corpus-sized.  A boilerplate wall repeated "
        "millions of times is one hot hash key — the same profile exact "
        "dedup already handles via AQE."
    ),
    "d31_unigram_nll": (
        "Perplexity-floor quality scoring: token counts aggregate once on "
        "the token key; the top-V vocabulary comes from "
        "TakeOrderedAndProject (per-partition partial top-V + driver "
        "merge, NOT a 1-partition global sort); the (N, V) scalars ride "
        "as a broadcast singleton (BroadcastNestedLoopJoin over one row); "
        "the vocab joins the token stream and the per-doc aggregate is "
        "the only other shuffle.  Corpus cost: one explode + two keyed "
        "aggregates regardless of vocabulary size."
    ),
    "r6_pq_adc": (
        "PQ/ADC search: the codebook (m*k rows) is a BroadcastExchange "
        "into both the encode argmin and the per-query lookup table; the "
        "corpus-side work is one narrow sub-vector explode, a broadcast "
        "join, and the per-(query, id) distance sum — the only corpus "
        "shuffles are keyed by (id, sub)/(qid, id).  At scale the encode "
        "switches to encode_pq_expr (literal codebook, map-only, "
        "plan-asserted Exchange-free in test_pq.py) and ADC scans codes "
        "~32x smaller than the raw vectors."
    ),
    "d33_cluster_balance": (
        "Diversity balancing: the 8 seed centroids broadcast into the "
        "whole-vector assignment (m=1 PQ encode); the per-cluster cap is "
        "one window whose WindowGroupLimit prunes each cluster partition "
        "to `cap` rows before the sort materializes.  Corpus cost: one "
        "broadcast join + two keyed windows, nothing quadratic."
    ),
    "v40_scd2": (
        "SCD2 build: the change-detection lag and the validity lead run "
        "over the SAME (key, ts, id) partitioning and sort — one "
        "Exchange, one sort for the whole dimension build (plan-asserted "
        "in test_relational.py); linear in the change log at any scale."
    ),
    "d38_semdedup": (
        "SemDeDup: the seed centroids broadcast into the assignment; the "
        "sweep rank is one window on the cluster key; the duplicate gate "
        "self-joins ON THE CLUSTER KEY ONLY — quadratic work is bounded "
        "by the largest cluster, never the corpus, and cross-cluster "
        "pairs are structurally absent from the plan.  Raising n_clusters "
        "is the knob that trades recall for a smaller quadratic term."
    ),
    "d39_zorder": (
        "Z-order layout: the Morton key is pure codegen (shifts + adds "
        "over two integer ranks — no UDF, no shuffle to compute); the "
        "only wide op in the WRITE path is the one range repartition, "
        "and the certified read-back plan here is a bare parquet scan "
        "plus the key projection.  The payoff is in the file stats: "
        "per-file min/max envelopes are narrow in BOTH z columns "
        "(quantified in test_zorder.py), so predicate scans on either "
        "column row-group-prune."
    ),
    "d40_bigram_nll": (
        "Bigram LM scoring: the lag window and the final per-doc "
        "aggregate both key on doc_id; token/bigram/context count tables "
        "aggregate on their own keys and join the stream back; the "
        "(N, V') scalars ride as a broadcast singleton.  Everything is "
        "linear in token count — the model tables are vocabulary-sized "
        "and broadcast-able at any corpus scale."
    ),
    "v45_funnel": (
        "Ordered funnel: one filter+aggregate per stage, every shuffle "
        "keyed on the user column — the stage joins and groupBys share "
        "the key so AQE collapses them onto one partitioning.  No window "
        "over the whole event history, nothing quadratic, no Python."
    ),
    "v47_gap_fill": (
        "Gap fill: the last-per-bucket window exchanges on (key, bucket) "
        "and WindowGroupLimit prunes each bucket to ONE row before the "
        "sort materializes; the pruned observation table BROADCASTS into "
        "the grid join; the grid side exchanges once on the key and the "
        "forward-fill window reuses that partitioning (partial sort, no "
        "second exchange).  Output is bounded by step x key cardinality, "
        "independent of input skew."
    ),
    "d45_weighted_sample": (
        "Weighted sampling: the priority clock is pure codegen (md5 + "
        "ln — no RNG state, no shuffle to draw); per-stratum selection "
        "is one window whose WindowGroupLimit prunes each stratum to k "
        "rows pre-sort.  The global form (not certified here) plans "
        "TakeOrderedAndProject — plan-asserted in "
        "test_sampling_hash.py."
    ),
    "d46_ctfidf_topics": (
        "c-TF-IDF labels: one explode + one (cluster, term) aggregate; "
        "the corpus term table aggregates on the term key and joins "
        "back; (N, n_clusters) scalars broadcast; per-cluster top-k is "
        "WindowGroupLimit-pruned.  Linear in token count at any corpus "
        "size."
    ),
    "d48_hll_distinct": (
        "HLL count-distinct: ONE aggregate keyed on (group, bucket) with "
        "partial_max map-side — the shuffle carries at most 256 rows per "
        "group no matter the input size (plan-asserted partial "
        "aggregation in test_sketches.py); the estimate is a second "
        "tiny aggregate on the group key.  This is the constant-state "
        "replacement for the exact count-distinct Expand: at 100 TB the "
        "exact form shuffles every distinct user id, this shuffles "
        "kilobytes."
    ),
    "d50_group_split": (
        "Leakage-safe split: the component rounds run over the EDGE set "
        "only (near-dup pairs — tiny vs the corpus, lineage-cut per "
        "round); the corpus sees one left join against the (node, "
        "component) labels and then a pure-codegen hash-threshold CASE — "
        "no corpus shuffle beyond the label join, and the split itself "
        "adds zero exchanges on top of d18's plan."
    ),
    "d51_triangles": (
        "Triangle counting: the degree-ordered orientation caps wedge "
        "work at sum(out-deg^2) with out-degree bounded ~sqrt(|E|) — the "
        "hub's deg^2 term disappears because hubs get in-edges only "
        "(pinned in test_triangles_retention.py: the hub's out-degree is "
        "0).  Three keyed shuffles: degree aggregate, wedge join on the "
        "low vertex, closing join on the (v, w) edge key.  The certified "
        "support-1 co-occurrence graph is deliberately dense (1.9M "
        "triangles at sf0.1); b_triangles benches the support-filtered "
        "graph a production basket analysis would run."
    ),
    "d54_prefix_join": (
        "Exact similarity join: candidates are generated ONLY from "
        "prefix rows — the rarest (1-t) fraction of each set, ordered by "
        "global document frequency — so join bucket sizes stay bounded "
        "where a raw shingle self-join explodes on stopword shingles.  "
        "Two keyed aggregates (df, per-doc rank window) + the candidate "
        "join + the verify join; zero false negatives is certified by "
        "hash-equality against the brute-force oracle."
    ),
    "r7_ivfpq": (
        "IVF-PQ: centroids, probe list, ADC lookup table, and candidate "
        "list ALL broadcast (four BroadcastExchanges); the corpus-sized "
        "work is the cell-restricted code join and one keyed "
        "partial-distance sum.  nprobe/nlist bounds the corpus fraction "
        "scanned, n_candidates bounds the exact re-rank — both constants "
        "chosen at query time, so the same index serves fast-approximate "
        "and exact-certified (this query) without rebuild."
    ),
    "d59_incremental_agg": (
        "Materialized-view delta maintenance: each per-batch state is "
        "one keyed aggregate with map-side partials, and the folds are "
        "further keyed aggregates over state-sized (not corpus-sized) "
        "inputs — the plan's aggregates stack on the SAME group key, so "
        "AQE collapses the fold chain onto one partitioning.  At 100 TB "
        "the nightly increment aggregates one day and folds against a "
        "persisted state table; history is never rescanned."
    ),
    "d61_expectations": (
        "Declarative validation: every rule is a conditional sum inside "
        "ONE HashAggregate over ONE FileScan (plan-asserted single scan "
        "in test_quality.py — a per-rule union would re-scan per rule); "
        "the unpivot runs on the single wide result row.  Adding a rule "
        "adds an expression, not a pass: the gate costs one corpus scan "
        "at any rule count."
    ),
    "d63_association_rules": (
        "Market basket: the per-basket distinct and the pair aggregate "
        "key on the basket id (quadratic bounded by basket size, never "
        "corpus size); item counts and the basket total broadcast into "
        "the scoring join; min-support HAVING prunes pairs BEFORE the "
        "scoring joins see them (Apriori cut); TakeOrderedAndProject "
        "caps the lift ranking."
    ),
    "r8_sq8_topk": (
        "SQ8: the encode is map-only (plan-asserted Exchange-free in "
        "test_sq.py) — pure per-row expressions, so a 100 TB encode job "
        "is one scan-and-write; scoring broadcasts the encoded queries "
        "and the only shuffle is the per-query WindowGroupLimit top-k.  "
        "Codes scan ~4x smaller than float32 vectors — the same plan as "
        "brute force at a quarter of the IO."
    ),
    "v63_temporal_join": (
        "Point-in-time SCD2 lookup: the dimension build is v40's "
        "one-Exchange double window; the lookup itself is an equi-join "
        "on the key with the interval predicate as a join filter — "
        "disjoint validity intervals mean at most one match per fact "
        "(no fanout), and a small dimension broadcasts whole under "
        "AQE.  Facts shuffle once on the key at worst; nothing "
        "interval-quadratic (cf. rangejoin.py for the binned general "
        "case when both sides are large)."
    ),
    "d72_winsorize": (
        "Sketch-driven winsorization: the quantile bounds come from the "
        "constant-size histogram aggregate (one keyed agg + a ≤128-row "
        "window), broadcast back as a per-group pair; the clamp is pure "
        "codegen on the scan.  The exact-percentile alternative is a "
        "full sort per group — this plan touches the corpus twice "
        "(bin pass + clamp pass) with no sort at all."
    ),
    "d37_pagerank (one round)": (
        "One synchronous update round over materialized inputs — the "
        "loop lineage-cuts each round, so the composed plan is always "
        "exactly this (analyzer time stays flat across iterations).  "
        "The dangling mass rides as a BROADCAST SINGLETON "
        "(BroadcastNestedLoopJoin over IdentityBroadcastMode — one row, "
        "never a driver collect inside the loop); the single "
        "SinglePartition exchange is that 1-row aggregate; the "
        "contribution join and the inflow aggregate key on src/node — "
        "every corpus-sized exchange is hashpartitioning.  "
        "Plan-asserted in tests/test_pagerank.py::test_pagerank_round_plan."
    ),
    "d66_label_prop (one round)": (
        "One synchronous LPA round over materialized inputs (same "
        "lineage-cut contract as d37).  The per-node label argmax is "
        "WindowGroupLimit-pruned partial AND final — each node's "
        "candidate set collapses to one row map-side, before the sort "
        "materializes — and the delivery join + count aggregate share "
        "the node key chain.  No single-partition stage anywhere.  "
        "Plan-asserted in tests/test_labelprop.py::test_lpa_round_plan."
    ),
    "v43_cdc_stream_apply (per-batch merge core)": (
        "The foreachBatch body is merge_changes: the latest-change-"
        "per-key window is WindowGroupLimit-pruned (a key's whole "
        "change history collapses to one row before the sort), and the "
        "apply is ONE full-outer equi-join that REUSES the window's "
        "hashpartitioning — exactly two exchanges, both on the merge "
        "key, per micro-batch.  The snapshot swap around it is "
        "filesystem metadata, not a plan.  Plan-asserted in "
        "tests/test_cdc.py::test_merge_changes_plan."
    ),
    "v41_stateful_timeout (streaming plan)": (
        "The custom session operator with event-time state expiry: ONE "
        "exchange (REQUIRED_BY_STATEFUL_OPERATOR, hashpartitioning on "
        "the group key) feeds FlatMapGroupsInPandasWithState under "
        "EventTimeTimeout — per micro-batch the input moves once, "
        "state lives partitioned by key in the state store, and idle "
        "keys are expired by the watermark rather than a full state "
        "scan.  Plan-asserted in "
        "tests/test_stateful.py::test_stateful_timeout_plan."
    ),
    "v69_q22_shape": (
        "Q22's two ungrouped scalar aggregates plan as Subquery nodes "
        "— computed ONCE and broadcast as literals, never per outer "
        "row — and NOT EXISTS as a LeftAnti equi-join on o_custkey.  "
        "Plan-asserted in tests/test_decorrelation_plans.py."
    ),
    "v70_q2_shape": (
        "Q2's correlated scalar min over a multi-table join "
        "decorrelates into a groupBy(l_partkey) aggregate equi-joined "
        "back on the correlation key; nation/region/supplier broadcast "
        "on both the outer and inner pipelines.  No nested loop "
        "anywhere.  Plan-asserted in tests/test_decorrelation_plans.py."
    ),
    "d74_winnowing (pre-lineage-cut pipeline)": (
        "Winnowing's pair join is a fingerprint equi-join AFTER the "
        "doc-frequency cap (<=50) — the all-pairs path is structurally "
        "unreachable; the window-min selection is doc-bounded (ROWS "
        "frame inside a doc partition), so no cross-doc shuffle until "
        "the distinct fingerprint set.  That set feeds three consumers "
        "(cap + both join sides), so it is persisted and eagerly "
        "forced — the corpus-sized explode pipeline runs ONCE (the "
        "InMemoryTableScans below; pre-fix the plan held 4 FileScans "
        "and 4 window evaluations, 0 reuse)."
    ),
    "v73_match_measures": (
        "The MEASURES clause over the v71 pattern: per-element sum/max "
        "measures ride the per-run HashAggregate as extra columns — "
        "the plan is v71's exactly (one hashpartitioning Exchange on "
        "user_id reused by the encode window, the per-run aggregate, "
        "and the lead-probe window), no additional exchange, no "
        "self-join.  Measures for the final '1' element read the "
        "arg-min first-row struct, a projection."
    ),
    "v72_stream_enrichment (streaming plan)": (
        "Broadcast-state stream enrichment (streaming/enrichment.py): "
        "ONE exchange (REQUIRED_BY_STATEFUL_OPERATOR, hashpartitioning "
        "on user_id) feeds FlatMapGroupsInPandasWithState — per "
        "micro-batch the tagged union stream moves once; per-key state "
        "is a constant-size (ts_us, mult) tuple, so state growth is "
        "O(distinct keys) regardless of stream length.  The within-"
        "batch fold is a vectorized ffill (r11), not a row loop.  "
        "Plan-asserted in tests/test_enrichment.py (one stateful "
        "exchange).  Retention: NoTimeout holds state forever — right "
        "for bounded key domains, wrong for open ones (the r11 VERDICT "
        "design note); the TTL variant below is the open-domain form."
    ),
    "v74_enrichment_ttl (streaming plan)": (
        "TTL-bounded enrichment (stateful_enrichment_ttl): identical "
        "one-exchange shape with EventTimeTimeout + watermark.  The "
        "staleness rule is pure event-time (reference older than "
        "ttl_us at the event reads DEFAULT_MULT), so the timeout "
        "eviction is provably result-neutral GC: state holds only "
        "keys whose reference is younger than ttl_us behind the "
        "watermark — O(active keys per horizon), the 100 TB "
        "open-key-domain retention bound.  Eviction + boundary "
        "pinned in tests/test_enrichment.py (numRowsTotal)."
    ),
    "v75_nfa_pattern": (
        "NFA pattern matching (operators/pattern.py::match_nfa): the "
        "single Exchange is the encode hashpartitioning on user_id, "
        "reused by the run aggregate, the prefilter lead/max windows, "
        "and FlatMapGroupsInPandas.  The prefilter drops keys with no "
        "candidate anchor before the Python boundary (sf0.1: 733 of "
        "1500 keys), so the pay-for-generality Python stage sees only "
        "plausible keys, one Arrow row per RUN.  Plan-pinned in "
        "tests/test_pattern.py::test_nfa_single_exchange_plan."
    ),
    "v71_match_recognize": (
        "Quantified pattern matching (operators/pattern.py): the single "
        "Exchange below is the ONE hash partitioning on user_id — the "
        "run-encode window, the per-run aggregate (grouping keys are a "
        "superset of the partition key), and the lead-probe window all "
        "reuse it; the disjunct coalesce is pure projection.  No "
        "Cartesian/BNLJ, no second shuffle.  Plan-asserted in "
        "tests/test_pattern.py::test_single_exchange_plan."
    ),
    "v76_bounded_pattern": (
        "Bounded quantifiers (V{2,} C{1,2} P1): the run-length bounds "
        "are extra predicates on the SAME lead-probe window — n_rows "
        "is already a per-run aggregate column, so the plan is v71's "
        "exactly: one hashpartitioning Exchange on user_id, no new "
        "stage.  Plan-asserted in tests/test_pattern.py::"
        "test_bounded_single_exchange_plan."
    ),
    "v77_alternation_pattern": (
        "Alternation composition ((V|C)+ P1 via map_symbols): the "
        "group mapping is a row-level CASE projection BEFORE the "
        "encode window, so alternating symbols collapse into one run "
        "and the plan is the standard one-Exchange pattern shape — "
        "the set-element semantics cost nothing at the plan level."
    ),
}

KEEP = re.compile(
    r"PushedFilters|ReadSchema|PartitionFilters|BroadcastHashJoin|"
    r"BroadcastNestedLoopJoin|SortMergeJoin|ShuffledHashJoin|Exchange|"
    r"WholeStageCodegen|WindowGroupLimit|HashAggregate\(keys|"
    r"FlatMapGroupsInPandasWithState|EventTimeWatermark|StateStore|"
    r"Subquery|InMemoryTableScan"
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entrymod.queries()
    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Auto-generated by tools/plan_audit.py at {sf}.  Lines filtered to",
        "the scale-relevant operators: scans (pushdown/pruning), joins",
        "(broadcast vs shuffle), exchanges, codegen spans, window-limit",
        "pushdown.  Full plans: `df.explain('formatted')`.",
        "",
    ]
    def emit(name: str, df) -> None:
        # streaming DataFrames cannot produce an executed plan; "simple"
        # mode shows the micro-batch physical plan with state operators
        mode = "simple" if df.isStreaming else "formatted"
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )
        lines = [ln.rstrip()[:160] for ln in plan.splitlines() if KEEP.search(ln)]
        out.extend([f"## {name}", ""])
        if name in NOTES:
            out.extend([NOTES[name], ""])
        out.extend(["```"] + lines + ["```", ""])

    for name in AUDITED:
        emit(name, qs[name](spark, sf))
    for name, build in SPECIAL.items():
        emit(name, build(spark, sf))
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    for c in _CLEANUP:
        c.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
