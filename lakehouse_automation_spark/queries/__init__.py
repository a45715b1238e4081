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

# ------------------------------------------------------------------
# Sweep ordering. The driver's per-round correctness gate evaluates
# the first 50 registry keys in registration order, so official
# coverage accumulates round over round only if the rotation is driven
# by the official CORRECTNESS_r*.json files (tools/sweep_plan.py
# derives it — never hand-count). After round 4 every key has an
# official green; round 5 re-confirms the oldest cohort: all 37 keys
# whose latest green is r2, plus the four round-5-new keys
# (tf_cdc_updates + the curation trio), plus call_proc (limit-guard
# change this round), plus the 8 oldest-r3 Tier-A / SQL-surface keys
# including tf_merge_cow (tableformat.py churn this round).
# vec_neardup_lsh was
# considered (VERDICT r4 watch item) but measurement showed the 2.03 s
# was host noise — min-of-6 re-run: 1.47 s vs 1.49 s baseline, no code
# change, r4 green still covers it. All 50 are pure batch keys — the
# wedge-isolation tail rule (live-stream keys last) is vacuously
# satisfied this round.
_SWEEP_ORDER = [
    # --- 37 r2-cohort re-confirms (oldest official greens) ---
    "flagship_pricing_summary", "scan_parquet", "project_rename_cast",
    "filter_pred", "filter_in_between_like", "case_when",
    "join_inner_equi", "join_broadcast", "join_outer", "join_semi",
    "join_anti", "join_self", "join_theta_range",
    "agg_hash_basic", "agg_distinct", "agg_percentile", "agg_rollup",
    "agg_cube", "agg_grouping_sets", "agg_having", "agg_collect",
    "agg_stddev_corr", "agg_pivot",
    "win_rank", "win_analytic", "win_frame_rows", "win_frame_range",
    "sort_multi", "topk", "sample",
    "set_union", "set_intersect", "dedup", "fn_string",
    # --- new in round 5 (never officially swept — must be in-fold) ---
    "tf_cdc_updates", "text_decontaminate", "mixture_sample",
    "pack_sequences", "vec_ivf_index_persisted",
    # --- key whose implementation changed in round 5 ---
    "call_proc",
    # --- new in round 5, second batch (never officially swept; brand-
    # new keys outrank r3 re-confirms for fold slots — tf_restore /
    # tf_clone also re-exercise the round-5 tableformat churn that had
    # motivated the tf_merge_cow slot they displaced) ---
    "sessionize_events", "event_funnel", "retention_cohort",
    "agg_sketch_rollup", "join_bloom_filtered", "tf_restore", "tf_clone",
    # --- new in round 5, third batch (the three displaced r2 slots
    # were set_union_all / set_except / distinct_proj — the trivial,
    # unchanged-since-r2 set ops with the least re-confirm value) ---
    "text_incremental_dedup", "mv_incremental_refresh", "profile_table",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # Round-6 queue: FIRST the round-5 keys born after the fold filled
    # (tf_zorder, agg_sketch_setops, agg_approx_topk,
    # win_pattern_detect, tf_constraints, tf_verify, tf_history,
    # text_chunk_split, join_asof_forward, join_asof_tolerance,
    # text_unigram_logprob, sink_dynamic_overwrite,
    # stream_static_join — local oracle greens recorded, never
    # officially swept), then the displaced r3
    # Tier-A / SQL-surface re-confirms
    # (incremental_load, sql_to_pandas, ddl_exec, bulk_load,
    # catalog_list, storage_mount, tf_merge_cow), then ledger_insert,
    # ledger_topk, retry_exec, exec_timing, multi_stmt_exec + the
    # remaining r3 cohort (streaming_batch, text/vec pipeline, sinks,
    # udfs); derive the list with tools/sweep_plan.py.
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
