#!/usr/bin/env python
"""Standing plan-lint gate: the round-15 multi-scan audit rule,
mechanized (VERDICT r15 ask #1).

The rule (SCALE.md "Round-15 multi-scan audit"): a repeated scan is a
defect ONLY when the repeated subtree re-runs an expensive
row-expanding derivation (tokenize / explode / shingle) on the same
source with no distinguishing pushed filter. Parallel stages hide the
duplicated CPU completely on an idle local box, so this must be read
from plans, never timed — which also makes it mechanizable.

Mechanization over ``explain("formatted")`` output:

- every physical node prints once in the detail section under a
  stable id; cached-lineage REPRINTS (an ``InMemoryRelation`` subtree
  shown under each of its ``InMemoryTableScan`` consumers) reuse the
  SAME ids, so "distinct Generate node ids" counts real executions,
  not printings;
- each distinct ``Generate`` (the physical explode/posexplode/inline
  operator — every tokenize/shingle/ngram derivation in this engine
  goes through it) is signed by (normalized generator expression,
  the sorted set of file scans in its subtree with their pushed
  filters, the sorted set of post-scan Filter conditions in its
  subtree);
- two or more distinct Generates sharing one signature = the same
  row-expanding derivation re-executed against the same un-sliced
  source: a defect, unless the key is allowlisted below with its
  SCALE.md adjudication class.

Signatures diverge — correctly — for every adjudicated-legitimate
class: disjoint pushed-filter slices differ in PushedFilters
(agg_sketch_setops' event types, the vector tiers' LessThan query
slice), sliced-but-unpushable predicates differ in the subtree Filter
conditions, different derivations differ in the generator expression
(unigram vs bigram), and persisted mid-tables collapse to one node id.
This lint FAILS on the r14 tfidf_keywords / text_bm25_rank plans
(tests/fixtures/r14_plan_*.md — the two real defects the round-15
manual audit caught) and passes on the re-planned versions.

Usage:
  python tools/plan_lint.py                      # lint PLANS.md
  python tools/plan_lint.py --build [--json F]   # build + lint ALL
                                                 # registry keys at
                                                 # $SPARK_GRAFT_SF_DIR
                                                 # (default sf0.001)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: keys allowed to keep a duplicate-signature Generate, with the
#: SCALE.md adjudication that justifies it. Empty today: every
#: legitimate multi-scan class already signs distinctly. Add entries
#: ONLY with a SCALE.md adjudication paragraph to cite.
ALLOWLIST: dict[str, str] = {}

_TREE_RE = re.compile(r"^([\s:+\-]*)(?:\*\s*(?:\(\d+\)\s*)?)?"
                      r"(\S[^()]*?)\s*\((\d+)\)(?:\s*\(columnar\S+.*)?\s*$")
_DETAIL_RE = re.compile(r"^\((\d+)\)\s+(\S.*?)(?:\s+\[codegen id : \d+\])?\s*$")
_ATTR_RE = re.compile(r"^([A-Za-z][\w ]*?)(?: \[\d+\])?: (.*)$")


def _norm(s: str) -> str:
    """Strip per-build identifiers so two prints of the same logical
    expression compare equal: expression ids (#123), plan ids,
    cache-build ordinals, whitespace runs."""
    s = re.sub(r"#\d+", "#", s)
    s = re.sub(r"plan_id=\d+", "plan_id=", s)
    s = re.sub(r"\s+", " ", s)
    return s.strip()


def parse_formatted(plan: str):
    """Parse one explain('formatted') string.

    Returns (details, children): ``details`` maps node id ->
    (name, attrs dict); ``children`` maps node id -> list of child
    ids (first printed occurrence wins — reprints are identical)."""
    details: dict[int, tuple[str, dict[str, str]]] = {}
    children: dict[int, list[int]] = {}
    lines = plan.splitlines()

    # ---- detail blocks: "(3) Scan parquet" + attr lines until blank
    i = 0
    while i < len(lines):
        m = _DETAIL_RE.match(lines[i])
        # a detail heading is column-0 (tree lines are indented or
        # carry +- / :- branch art; depth-0 tree roots have no "(id)"
        # detail attrs but match _DETAIL_RE — only treat it as a
        # detail block if an attr line or blank follows)
        if m and not lines[i].startswith((" ", ":", "+")):
            nid, name = int(m.group(1)), m.group(2).strip()
            attrs: dict[str, str] = {}
            j = i + 1
            while j < len(lines) and lines[j].strip():
                am = _ATTR_RE.match(lines[j])
                if am:
                    attrs[am.group(1)] = am.group(2)
                j += 1
            # tree roots like "AdaptiveSparkPlan (25)" never collide
            # with detail ids here because details overwrite only with
            # richer info
            if nid not in details or attrs:
                details[nid] = (name, attrs)
            i = j
        else:
            i += 1

    # ---- tree runs: contiguous indented node lines; depth = prefix/3
    stack: list[tuple[int, int]] = []  # (depth, id)
    skip_deeper_than: int | None = None  # inside an == Initial Plan ==
    for raw in lines:
        stripped = raw.lstrip(" :+-")
        if stripped.startswith("== "):
            # Nested AQE (inside an InMemoryRelation lineage) prints
            # BOTH "== Final Plan ==" and "== Initial Plan ==" — the
            # Initial section is a REPRINT of the same subtree under
            # FRESH node ids, so counting it would double every
            # Generate. Skip Initial subtrees entirely; Final/Current
            # markers pass through (their children attach to the AQE
            # node above).
            depth = (len(raw) - len(stripped)) // 3
            if skip_deeper_than is not None and depth > skip_deeper_than:
                continue  # marker nested inside a skipped Initial
            if "Initial Plan" in stripped:
                skip_deeper_than = depth
            else:
                skip_deeper_than = None
            continue
        if not raw.strip() or raw.lstrip().startswith(("===== ",
                                                       "Subquery:")):
            stack = []
            skip_deeper_than = None
            continue
        m = _TREE_RE.match(raw)
        if not m:
            stack = []
            continue
        if skip_deeper_than is not None:
            # the section's ROOT prints at the marker's own depth (the
            # marker's "+- " consumed the depth increment), so the
            # Initial subtree is every line at depth >= the marker's
            d = len(m.group(1)) // 3
            if d >= skip_deeper_than:
                continue
            skip_deeper_than = None
        prefix, name, nid = m.group(1), m.group(2).strip(), int(m.group(3))
        # attr lines like "Functions [4]: [...]" can end in "(1)" —
        # require the name to be a known node-ish token (starts upper,
        # no colon) to avoid mis-parsing detail attrs as tree lines
        if ":" in name or not name[:1].isupper():
            continue
        depth = len(prefix) // 3
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if stack:
            children.setdefault(stack[-1][1], [])
            kids = children[stack[-1][1]]
            # first occurrence wins; reprints re-add identical kids
            if nid not in kids:
                kids.append(nid)
        stack.append((depth, nid))
        if nid not in details:
            details[nid] = (name, {})
    return details, children


def _descendants(nid: int, children: dict[int, list[int]],
                 seen: set[int] | None = None) -> list[int]:
    seen = set() if seen is None else seen
    out = []
    for kid in children.get(nid, []):
        if kid in seen:
            continue
        seen.add(kid)
        out.append(kid)
        out.extend(_descendants(kid, children, seen))
    return out


def lint_plan(plan: str) -> list[dict]:
    """Return a list of flags for one formatted plan string."""
    details, children = parse_formatted(plan)
    sigs: dict[tuple, list[int]] = {}
    for nid, (name, attrs) in details.items():
        if not name.startswith("Generate"):
            continue
        gen = _norm(attrs.get("Arguments", ""))
        # only true EXPANSION generators are "expensive row-expanding
        # derivations" in the audit rule's sense; replicaterows is the
        # exceptAll/intersectAll machinery — its two Generates are the
        # two directions of ONE set comparison (the adjudicated
        # "self-join / union-of-two-sides" class), and its output
        # never exceeds its input
        if not gen.startswith(("explode", "posexplode", "inline",
                               "stack", "json_tuple")):
            continue
        scans, filters, has_file_scan = [], [], False
        for d in _descendants(nid, children):
            dname, dattrs = details.get(d, ("", {}))
            if dname.startswith("Scan "):
                loc = dattrs.get("Location", "")
                if loc:
                    has_file_scan = True
                scans.append(_norm(
                    f"{dname}|{loc}|{dattrs.get('PushedFilters', '')}"
                    f"|{dattrs.get('PartitionFilters', '')}"))
            elif dname.startswith("Filter"):
                filters.append(_norm(dattrs.get("Condition",
                                                dattrs.get("Input", ""))))
        if not has_file_scan:
            # derivation re-runs over cached/local inputs re-expand
            # rows but never re-scan or re-derive the source — the
            # "persisted mid-table + cheap re-attach" legitimate class
            continue
        sig = (gen, tuple(sorted(scans)), tuple(sorted(filters)))
        sigs.setdefault(sig, []).append(nid)
    flags = []
    for (gen, scans, filters), nids in sigs.items():
        if len(nids) >= 2:
            flags.append({
                "generator": gen,
                "scans": list(scans),
                "filters": list(filters),
                "node_ids": sorted(nids),
                "n": len(nids),
            })
    return flags


def lint_plans_md(path: str) -> dict[str, list[dict]]:
    """Lint every fenced plan in a PLANS.md-shaped file; returns
    {key: flags} for flagged keys only. Pre-checkpoint '###' plans
    lint under their parent key."""
    txt = open(path).read()
    out: dict[str, list[dict]] = {}
    key = None
    for m in re.finditer(
            r"^##+ (\S+).*?$|^```\n(.*?)^```$", txt, re.M | re.S):
        if m.group(1) is not None:
            key = m.group(1).split(" ")[0]
        elif key:
            flags = lint_plan(m.group(2))
            if flags:
                out.setdefault(key, []).extend(flags)
    return out


def build_and_lint(sf_dir: str) -> dict[str, list[dict]]:
    """Build EVERY registry key's plan at ``sf_dir`` and lint it —
    the all-243-key guard. Uses the final (executed where an action
    ran during build, else initial) formatted plan plus any captured
    pre-checkpoint plans."""
    os.environ["LAS_CAPTURE_PLANS"] = "1"
    from lakehouse_automation_spark.engine import get_spark
    from lakehouse_automation_spark.operators.cache import release_persisted
    from lakehouse_automation_spark.operators.plancapture import (
        captured_plans, clear_captured)
    from lakehouse_automation_spark.queries import REGISTRY

    spark = get_spark("plan_lint")
    out: dict[str, list[dict]] = {}
    for key, q in REGISTRY.items():
        clear_captured()
        try:
            df = q.fn(spark, sf_dir)
            plans = [df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))]
        except Exception as exc:  # surface, don't wedge the sweep
            out[key] = [{"error": repr(exc)[:300]}]
            continue
        plans.extend(captured_plans().values())
        flags = [f for p in plans for f in lint_plan(p)]
        if flags:
            out[key] = flags
        release_persisted()
        print(f"{key}: {'FLAG' if flags else 'ok'}", file=sys.stderr)
    return out


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        json_out = argv[argv.index("--json") + 1]
        del argv[argv.index("--json"):argv.index("--json") + 2]
    if "--build" in argv:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                                "/root/testdata/sf0.001")
        flagged = build_and_lint(sf_dir)
    else:
        path = argv[0] if argv else os.path.join(REPO, "PLANS.md")
        flagged = lint_plans_md(path)
    bad = {k: v for k, v in flagged.items() if k not in ALLOWLIST}
    waived = {k: ALLOWLIST[k] for k in flagged if k in ALLOWLIST}
    record = {"flagged": bad, "allowlisted": waived,
              "n_flagged": len(bad)}
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps({"n_flagged": len(bad),
                      "flagged_keys": sorted(bad),
                      "allowlisted_keys": sorted(waived)}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
