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
# derives it — never hand-count). Round-9 priority, in order
# (VERDICT r8 asks #2 and #5: re-green the r4-stale cohort; keep the
# registry frozen):
#
#   1. The entire 47-key r4-stale cohort (round 8's
#      _NEXT_SWEEP_QUEUE, i.e. every key whose newest official gate
#      entry is round 4), reordered only to move the 4 live-stream
#      keys to the fold tail (wedge-isolation rule below). After this
#      round's sweep the oldest official entry is >= r5.
#   2. The 3 spare slots go to the keys whose code or oracle CHANGED
#      in round 9's dirty-text fix and are not already in the cohort:
#      text_exact_dedup + udf_sql_register (the two r8 VALUE_MISMATCH
#      reds — their post-fix state must enter the official record) and
#      text_incremental_dedup (shares the rewritten content-norm; its
#      last gate is r5, the stalest of the remaining changed keys).
#      The other two changed keys are already covered: curate_pipeline
#      gated r8, fn_string's oracle change is value-identical on the
#      gate corpus and it re-gates with the r6 cohort in r10.
#
# Growth freeze (VERDICT r8 ask #5): round 9 adds ZERO new keys; the
# spare slots are spent on changed-key re-confirmation instead.
#
# Wedge isolation: the 4 live-stream keys in the fold
# ({tf_stream_ingest, lifecycle_daemon, stream_custom_state,
# stream_stream_join}) close the block so a hung stream cannot starve
# the batch results.
_SWEEP_ORDER = [
    # --- 1+2: 43 batch r4-cohort keys, then the 3 changed-key spares,
    # then the 4 live-stream cohort keys at the tail ---
    "flagship_regional_revenue", "join_skew_salted", "join_bucketed",
    "join_asof", "join_interval_bucketed", "subq_scalar", "subq_in",
    "subq_exists_correlated", "cte_recursive", "win_rank_pct",
    "fn_bitwise", "agg_median", "fn_levenshtein", "agg_approx_distinct",
    "agg_percentile_approx", "sample_hash_split", "fn_datetime", "fn_math",
    "fn_cond_null", "fn_json", "fn_array_map", "fn_explode", "fn_hash",
    "gen_rows", "retention_delete", "poll_new_files",
    "schedule_microbatch", "text_minhash_pairs", "text_bm25_rank",
    "vec_ivf_kmeans_topk", "vec_neardup_lsh", "vec_pq_topk",
    "vec_ivf_pq_topk", "vec_knn_join", "vec_semantic_doc_dedup",
    "mm_frame_sample", "mm_resize", "mm_audio_resample", "sink_orc",
    "tf_acid_append", "tf_cdc_feed", "tf_schema_evolve", "tf_time_travel",
    "text_exact_dedup", "udf_sql_register", "text_incremental_dedup",
    "lifecycle_daemon", "stream_custom_state", "stream_stream_join",
    "tf_stream_ingest",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # The round-10 queue continues in _NEXT_SWEEP_QUEUE below.
]

# The round-10 fold front, machine-readable: the stalest official
# greens once the r9 fold lands — the 45-key r5-gated cohort that is
# not in the r9 fold, in registration order. tests/test_smoke.py
# recomputes the cohort from the CORRECTNESS_r*.json files and
# enforces that this list is exactly the stalest-not-in-fold set, so
# the rotation cannot silently drop a stale key. Any NEW key must be
# inserted into the fold itself (growth-freeze rule above), not here.
_NEXT_SWEEP_QUEUE = [
    "flagship_pricing_summary", "scan_parquet", "project_rename_cast",
    "filter_pred", "case_when", "join_inner_equi", "join_broadcast",
    "join_outer", "join_semi", "join_anti", "join_self",
    "join_asof_forward", "join_asof_tolerance", "join_null_safe",
    "agg_hash_basic", "agg_distinct", "agg_rollup", "win_rank",
    "set_intersect_all", "set_except_all", "fn_try_arith", "call_proc",
    "stream_static_join", "text_decontaminate", "mixture_sample",
    "pack_sequences", "text_chunk_split", "text_unigram_logprob",
    "vec_ivf_index_persisted", "vec_matryoshka_topk", "profile_table",
    "sink_dynamic_overwrite", "udf_grouped_agg", "tf_restore", "tf_clone",
    "mv_incremental_refresh", "tf_verify", "tf_history",
    "sessionize_events", "event_funnel", "retention_cohort",
    "agg_sketch_rollup", "join_bloom_filtered", "agg_approx_topk",
    "win_pattern_detect",
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
