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

# ------------------------------------------------------------------
# Sweep ordering. The driver's per-round correctness gate evaluates
# the first 50 registry keys in registration order, so official
# coverage accumulates round over round only if not-yet-swept keys are
# rotated to the front. Round 4 fronts the 23 keys absent from all of
# CORRECTNESS_r01..r03 (recomputed programmatically: 134 registry keys
# minus 111 swept — the round-3 comment undercounted at 19), which
# brings cumulative official coverage to 134/134. Batch keys run
# first; the 4 keys that spin real Structured Streaming machinery run
# at the tail of the block so a wedge there cannot starve the batch
# results (the round-1 failure mode). The remaining 27 slots
# re-confirm the keys whose latest official green is oldest (r1/r2)
# plus the two historically no-oracle keys (agg_approx_distinct,
# vec_knn_join) so their tightened checks land in an official file.
_SWEEP_ORDER = [
    # --- the 23 never-officially-swept keys (+ the round-4-new
    # tf_cdc_feed and tf_schema_evolve, which take the agg_percentile
    # and scan_parquet re-confirm slots so the fold stays at 50):
    # CowTable ACID family ---
    "tf_acid_append", "tf_time_travel", "tf_delete_vacuum",
    "tf_stats_prune", "tf_cdc_feed", "tf_schema_evolve",
    # vector ANN tiers (PQ / IVF-PQ / k-means IVF / LSH / semantic dedup)
    "vec_pq_topk", "vec_ivf_pq_topk", "vec_ivf_kmeans_topk",
    "vec_neardup_lsh", "vec_semantic_doc_dedup",
    # text pipeline additions
    "text_bm25_rank", "text_minhash_pairs", "curate_pipeline",
    # relational / sampling / sink / agg additions
    "join_interval_bucketed", "sample_hash_split", "sink_orc",
    "agg_percentile_approx",
    # multimodal plumbing
    "mm_frame_sample", "mm_resize", "mm_audio_resample",
    # --- 27 re-confirmation slots: oldest official greens first ---
    "gen_rows", "retention_delete", "schedule_microbatch",
    "poll_new_files", "fn_array_map", "fn_cond_null", "fn_datetime",
    "fn_explode", "fn_hash", "fn_json", "fn_math",
    "agg_median", "cte_recursive", "flagship_regional_revenue",
    "fn_bitwise", "fn_levenshtein", "join_bucketed", "join_skew_salted",
    "subq_exists_correlated", "subq_in", "subq_scalar", "win_rank_pct",
    "agg_approx_distinct", "vec_knn_join", "join_asof",
    # --- live-stream never-swept keys last (wedge isolation) ---
    "tf_stream_ingest", "lifecycle_daemon", "stream_custom_state",
    "stream_stream_join",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # After round 4 every key has at least one official green entry;
    # future rotations should re-confirm whichever keys' latest entry
    # is oldest (derive from the CORRECTNESS_r*.json files, as
    # tools/sweep_plan.py does — don't hand-count).
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
