"""Retention / TTL sweep (reference A3).

The reference hourly deletes landed CSVs whose mtime is older than N
days (datagen.py:91-105, cutoff at :96). Two native forms:

- file-level (this module): list the landing dir, drop stamped
  subdirs/files older than the cutoff — same semantics, driver-side
  listing only (object-store listing at scale should use inventory
  manifests; noted, out of scope for local FS);
- relational (queries.tier_a.retention_delete): DELETE-equivalent
  filter on an ingest-date partition column — with date-partitioned
  tables this is partition pruning + partition drop, never a scan.
"""

from __future__ import annotations

import os
import shutil
import time


def retention_sweep(landing_dir: str, max_age_days: float,
                    now_s: float | None = None) -> list[str]:
    """Delete entries in ``landing_dir`` older than ``max_age_days``
    (mtime-based, like datagen.py:96). Returns deleted paths."""
    if not os.path.isdir(landing_dir):
        return []
    cutoff = (now_s if now_s is not None else time.time()) - max_age_days * 86400
    deleted = []
    for name in sorted(os.listdir(landing_dir)):
        path = os.path.join(landing_dir, name)
        if os.path.getmtime(path) < cutoff:
            if os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.remove(path)
            deleted.append(path)
    return deleted
