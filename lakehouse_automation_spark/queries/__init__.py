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
# derives it — never hand-count). Round-13 priority, in order
# (VERDICT r12 ask #3: steady-state rotation, registry frozen):
#
#   1. 48 of the 49-key r8-gated cohort (round 12's
#      _NEXT_SWEEP_QUEUE — every key whose newest official gate entry
#      is round 8). After this round's sweep the oldest official
#      entry is >= r9 for every key except the one displaced below.
#   2. The 2 spare slots go to changed-key re-confirmation
#      (changed-keys-first rule): vec_neardup_lsh and vec_knn_join —
#      both their engine path (lsh_bucket_table now tiers on the
#      null-filtered count, ADVICE r12) and their SQL oracle (the
#      256-plane literals + two-knob tier CTE that make the 16x16
#      scale tier replayable, VERDICT r12 ask #2) changed this round.
#      Displaced to make room: sink_json — its r13 state is
#      code-untouched, its semantics are pytest-pinned, and it passed
#      every full-replica and sweep record since r8; result-changing
#      keys outrank a stale-but-stable sink smoke. It fronts the r14
#      queue below.
#
# Growth freeze: round 13 adds ZERO new keys.
#
# Wedge isolation: no live-stream key ({tf_stream_ingest,
# lifecycle_daemon, stream_custom_state, stream_stream_join}) is in
# this fold (all re-gated r9), so the rule holds vacuously.
_SWEEP_ORDER = [
    # --- 1: 48 of the 49-key r8 cohort ---
    "agg_benford_digits", "agg_entropy", "agg_exact_deciles",
    "agg_freq_histogram", "agg_gini", "agg_hhi", "agg_mad_outliers",
    "agg_pareto_8020", "agg_sample_estimate", "agg_skew_kurt",
    "agg_topk_share", "agg_weighted_median", "curate_pipeline",
    "event_ab_test", "event_active_users", "event_attribution_first",
    "event_attribution_linear", "event_conversion_lag",
    "event_cooccurrence", "event_interarrival_stats",
    "graph_assortativity", "graph_jaccard_neighbors", "graph_pagerank",
    "graph_shortest_paths", "graph_triangles", "join_asof_nearest",
    "join_cross", "mm_exact_dedup", "order_basket_lift",
    "project_unpivot", "rfm_segments",
    "text_collocations", "text_rake_keywords", "text_vocab_coverage",
    "text_vocab_stats", "ts_changepoint", "ts_crosscorr",
    "ts_linreg_trend", "ts_seasonality",
    "vec_centroid_drift", "vec_cluster_quality", "vec_dispersion",
    "vec_ivf_index_refresh", "vec_label_outliers",
    "win_cumulative_distinct",
    "win_intervals_overlap", "win_skyline", "win_streaks",
    # --- 2: the 2 changed-key spares ---
    "vec_neardup_lsh", "vec_knn_join",
    # ---- fold: the driver sweep stops reading here (50 keys) ----
    # The round-14 queue continues in _NEXT_SWEEP_QUEUE below.
]

# The round-14 fold front, machine-readable: the stalest official
# green once the r13 fold lands — sink_json, the single r8-gated key
# displaced from the r13 fold by the two changed-key spares.
# tests/test_smoke.py recomputes the cohort from the
# CORRECTNESS_r*.json files and enforces that this list is exactly
# the stalest-not-in-fold set, so the rotation cannot silently drop a
# stale key. Any NEW key must be inserted into the fold itself
# (growth-freeze rule above), not here. (Round 14 should extend this
# with the r9-gated cohort once CORRECTNESS_r13 lands — the smoke
# invariant will demand it then.)
_NEXT_SWEEP_QUEUE = [
    "sink_json",
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
