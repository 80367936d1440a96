#!/usr/bin/env python
"""Round-over-round plan-cost gate (VERDICT r5 "Next round" #6): diff a
fresh COSTS.json against the previously committed one and FAIL when any
query's shuffle-WRITE bytes OR input bytes grew more than 2x at fixed SF
without a listed justification (shuffle growth = a re-shuffle crept into
the plan; input growth = a scan widened or pushdown/pruning was lost).
Byte counters are run-invariant (unlike wall-clock,
which the host's ±40% co-tenant noise makes ungateable), so this catches
the plan-regression class that bench medians hide — the a10/j1 drift of
round 4 would have tripped it.

Protocol per round: run scripts/cost_report.py (regenerates COSTS.md +
COSTS.json), then this check against the last committed baseline:

    python scripts/cost_report.py
    python scripts/check_costs.py            # new COSTS.json vs HEAD's

Usage: python scripts/check_costs.py [new_json] [git_ref_or_old_json]
Exit 1 on ungated growth; 0 otherwise (including "no baseline yet").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Justified growth, keyed "query.metric" (e.g.
#: "dd_jaccard_df_capped.input_bytes") -> (max allowed factor, reason) —
#: per-metric so a waiver never covers the OTHER counter. Entries are
#: round-scoped — remove them once the new baseline is committed.
ALLOWED_GROWTH: dict[str, tuple[float, str]] = {
    # (r7 note, entry since removed: dd_jaccard_df_capped.input_bytes
    # jumped 5300x when the max_df branch started CACHING the exploded
    # inverted index — InMemoryTableScan reads count as input at
    # uncompressed in-memory width, an accounting shift, not a plan
    # regression; wall measured faster cached, 3.0s vs 4.5s median at
    # sf0.1. The committed COSTS.json baseline now carries the in-memory
    # figure, so the gate compares like-for-like again and a waiver
    # would only mask real regressions.)
}

#: Below this baseline, byte deltas are scheduler noise, not plans.
FLOOR_BYTES = 4 * 1024


def load(src: str) -> dict:
    if os.path.exists(src):
        with open(src) as f:
            return json.load(f)
    # treat as a git ref holding COSTS.json
    out = subprocess.run(
        ["git", "-C", REPO, "show", f"{src}:COSTS.json"],
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        return {}
    return json.loads(out.stdout)


def main() -> int:
    new_src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "COSTS.json")
    old_src = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    new = load(new_src)
    old = load(old_src)
    if not new:
        print(f"no fresh {new_src} — run scripts/cost_report.py first",
              file=sys.stderr)
        return 2
    if not old:
        print(f"no baseline at {old_src} — first round with COSTS.json; "
              "commit the fresh one as the baseline")
        return 0
    if new.get("sf_dir") != old.get("sf_dir"):
        print(f"sf_dir changed ({old.get('sf_dir')} -> {new.get('sf_dir')}) — "
              "cross-SF byte comparison is meaningless; skipping gate")
        return 0
    violations = []
    for name in old["queries"]:
        if name not in new["queries"]:
            # a query vanishing from the report is the silent-coverage-loss
            # class, not a pass — it may be hiding the very regression the
            # gate exists to catch
            violations.append(f"{name}: in baseline but MISSING from fresh run")
    for name, m in new["queries"].items():
        o = old["queries"].get(name)
        if o is None:
            print(f"{name}: NEW (no baseline — recorded)")
            continue
        for key in ("shuffle_write_bytes", "input_bytes"):
            b, n = o[key], m[key]
            if abs(n - b) < FLOOR_BYTES and n < 4 * FLOOR_BYTES:
                # sub-floor absolute deltas on still-tiny values are
                # scheduler/AQE noise even when the RATIO is large (a
                # 990B baseline tripling is not a plan regression); the
                # second conjunct bounds the maximal silent drift to
                # <16KB absolute — anything that grows PAST that is
                # gated by ratio no matter how small the baseline was
                continue
            factor = n / max(b, 1)
            cap, reason = ALLOWED_GROWTH.get(f"{name}.{key}", (2.0, None))
            status = "ok" if factor <= cap else "VIOLATION"
            if factor > cap:
                violations.append(f"{name}.{key}: {b} -> {n} ({factor:.2f}x > {cap}x)")
            if factor > 1.3 or factor < 0.7 or status != "ok":
                note = f" [allowed: {reason}]" if reason and factor <= cap else ""
                print(f"{name}.{key}: {b} -> {n} ({factor:.2f}x) {status}{note}")
    if violations:
        print("\nUNGATED PLAN-COST GROWTH (shuffle write / input bytes):\n  "
              + "\n  ".join(violations))
        print("either fix the plan regression or add an ALLOWED_GROWTH entry "
              "with the measured justification")
        return 1
    print("check_costs: no ungated shuffle/input growth >2x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
