"""Named-query registry: the implementation of SURVEY.md §2.

Every operator in the survey's inventory is a key here, with

- a Spark callable ``(spark, sf_dir) -> DataFrame`` (DataFrame-API
  first; Catalyst picks the physical plan), and
- a DuckDB oracle SQL string used by the driver's correctness gate
  (row-count + schema + order-insensitive value hash). As of round 4
  EVERY key carries an oracle: deterministic pipelines (incl. PQ and
  fixed-plane LSH) replay fully in SQL; sketch/trained-model keys
  (HLL, GK percentile, k-means IVF) self-verify in-query — exact
  side columns hash-checked, the approximation asserted against its
  error bound as oracle-pinned booleans.

Determinism conventions (SURVEY §5, FIXTURES §4):
- money aggregates go through DECIMAL so sums are order-independent
  and exact, then CAST to DOUBLE in both engines;
- every computed column is aliased identically in Spark and oracle;
- float expressions use the same IEEE operation order in both engines;
- timestamps returned to the driver are us-precision (oracle casts
  ns->TIMESTAMP explicitly).
"""

from __future__ import annotations

from .base import Q, REGISTRY

from . import relational      # noqa: E402,F401
from . import analytic_sql    # noqa: E402,F401
from . import aggregates      # noqa: E402,F401
from . import windows         # noqa: E402,F401
from . import setops          # noqa: E402,F401
from . import scalar_fns      # noqa: E402,F401
from . import tier_a          # noqa: E402,F401
from . import streaming_batch # noqa: E402,F401
from . import text_pipeline   # noqa: E402,F401
from . import vector_pipeline # noqa: E402,F401
from . import multimodal      # noqa: E402,F401
from . import sinks           # noqa: E402,F401
from . import udfs            # noqa: E402,F401
from . import cowtable        # noqa: E402,F401
from . import events_analytics  # noqa: E402,F401
from . import timeseries      # noqa: E402,F401
from . import graph           # noqa: E402,F401

# ------------------------------------------------------------------
# Sweep ordering. The driver's per-round correctness gate evaluates
# the first 50 registry keys in registration order, so official
# coverage accumulates round over round only if the rotation is driven
# by the official CORRECTNESS_r*.json files (tools/sweep_plan.py
# derives it — never hand-count). Round-14 priority, in order
# (VERDICT r13 ask #4: sink_json + the r9 cohort + changed-key
# spares; registry frozen):
#
#   1. sink_json — the single r8-gated key, displaced from the r13
#      fold by that round's changed-key spares; the stalest official
#      entry in the registry and therefore first.
#   2. 42 of the 46-key r9-gated cohort (every key whose newest
#      official gate entry is round 9, minus the 4 live-stream keys
#      that must close the block — see wedge isolation below).
#   3. The 3 spare slots go to changed-key re-confirmation
#      (changed-keys-first rule): vec_neardup_lsh and vec_knn_join —
#      their block-local verify path changed this round (the enriched
#      table now builds from the persisted signature table so the
#      auto block-local shape counts the corpus ONCE, and the knn
#      dedup+window share a single q_id exchange; ADVICE r13) — and
#      tf_cdc_feed, whose commit-timestamp fallback now routes
#      through the manifest-log PathIO backend (ADVICE r13).
#   4. The 4 live-stream r9 keys ({tf_stream_ingest, lifecycle_daemon,
#      stream_custom_state, stream_stream_join}) close the block:
#      wedge isolation — a hung stream must not starve batch results.
#
# After this round's sweep the oldest official entry is >= r10 for
# every key. Growth freeze: round 14 adds ZERO new keys.
_SWEEP_ORDER = [
    # --- 1: the r8 straggler ---
    "sink_json",
    # --- 2: the 42 non-live r9-cohort keys ---
    "agg_approx_distinct", "agg_median", "agg_percentile_approx",
    "cte_recursive", "flagship_regional_revenue", "fn_array_map",
    "fn_bitwise", "fn_cond_null", "fn_explode", "fn_hash", "fn_json",
    "fn_levenshtein", "fn_math", "gen_rows", "join_asof",
    "join_bucketed", "join_interval_bucketed", "join_skew_salted",
    "mm_audio_resample", "mm_frame_sample", "mm_resize",
    "poll_new_files", "retention_delete", "sample_hash_split",
    "schedule_microbatch", "sink_orc", "subq_exists_correlated",
    "subq_in", "subq_scalar", "text_bm25_rank", "text_exact_dedup",
    "text_incremental_dedup", "text_minhash_pairs", "tf_acid_append",
    "tf_schema_evolve", "tf_time_travel", "udf_sql_register",
    "vec_ivf_kmeans_topk", "vec_ivf_pq_topk", "vec_pq_topk",
    "vec_semantic_doc_dedup", "win_rank_pct",
    # --- 3: the 3 changed-key spares ---
    "vec_neardup_lsh", "vec_knn_join", "tf_cdc_feed",
    # --- 4: live-stream keys close the block (wedge isolation) ---
    "tf_stream_ingest", "lifecycle_daemon", "stream_custom_state",
    "stream_stream_join",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # The round-15 queue continues in _NEXT_SWEEP_QUEUE below.
]

# The round-15 fold front, machine-readable: once the r14 fold lands,
# the stalest official cohort is the 48 r10-gated keys — queued here
# completely. tests/test_smoke.py recomputes the cohort from the
# CORRECTNESS_r*.json files and enforces that this list is exactly
# the stalest-not-in-fold set, so the rotation cannot silently drop a
# stale key. Any NEW key must be inserted into the fold itself
# (growth-freeze rule above), not here. The cohort is 48 keys for 50
# slots, so round 15 has 2 spare slots for changed-key
# re-confirmation.
_NEXT_SWEEP_QUEUE = [
    "agg_approx_topk", "agg_distinct", "agg_hash_basic", "agg_having",
    "agg_hist_bins", "agg_rollup", "agg_sketch_rollup",
    "agg_stddev_corr", "call_proc", "case_when", "event_funnel",
    "filter_pred", "fn_try_arith", "join_anti", "join_asof_forward",
    "join_asof_tolerance", "join_bloom_filtered", "join_inner_equi",
    "join_null_safe", "join_outer", "join_self", "join_semi",
    "mixture_sample", "mv_incremental_refresh", "pack_sequences",
    "profile_table", "project_rename_cast", "retention_cohort",
    "scan_parquet", "sessionize_events", "set_except_all",
    "set_intersect_all", "sink_dynamic_overwrite", "stream_static_join",
    "text_chunk_split", "text_decontaminate", "text_unigram_logprob",
    "tf_clone", "tf_history", "tf_restore", "tf_verify",
    "udf_grouped_agg", "udf_grouped_map", "vec_ivf_index_persisted",
    "vec_matryoshka_topk", "win_frame_rows", "win_pattern_detect",
    "win_rank",
]


def _apply_sweep_order() -> None:
    missing = [k for k in _SWEEP_ORDER if k not in REGISTRY]
    if missing:  # a rename must update the order list, loudly
        raise KeyError(f"_SWEEP_ORDER names unknown keys: {missing}")
    ordered = {k: REGISTRY[k] for k in _SWEEP_ORDER}
    ordered.update((k, q) for k, q in REGISTRY.items() if k not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_sweep_order()

__all__ = ["Q", "REGISTRY"]
