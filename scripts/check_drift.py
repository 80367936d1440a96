#!/usr/bin/env python
"""Round-start testdata drift check (VERDICT r2 standing trap #8).

The driver REGENERATES /root/testdata between rounds: events.ts has flipped
between TIMESTAMP(NANOS) and TIMESTAMP(MICROS), and documents/embeddings row
counts / id ranges change. Run this FIRST each round; it prints the facts the
engine adapts to at runtime (load_table's footer sniff, computed split
points) so a drift that needs code changes is visible in seconds.

Usage: python scripts/check_drift.py [sf_dirs...]
"""

from __future__ import annotations

import sys

import pyarrow.parquet as pq

DIRS = sys.argv[1:] or [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> int:
    problems = []
    for d in DIRS:
        print(f"== {d}")
        for t in TABLES:
            path = f"{d}/{t}.parquet"
            try:
                f = pq.ParquetFile(path)
            except Exception as e:  # noqa: BLE001
                problems.append(f"{path}: {e}")
                print(f"  {t}: MISSING/UNREADABLE ({e})")
                continue
            n = f.metadata.num_rows
            notes = []
            try:
                schema = f.schema_arrow
                if t == "events":
                    unit = getattr(schema.field("ts").type, "unit", None)
                    notes.append(f"ts_unit={unit or schema.field('ts').type}")
                if t in ("documents", "embeddings"):
                    idc = "doc_id" if t == "documents" else "vec_id"
                    first = f.read_row_group(0, columns=[idc])[idc]
                    lo = first[0].as_py()
                    last = f.read_row_group(
                        f.metadata.num_row_groups - 1, columns=[idc]
                    )[idc]
                    hi = last[-1].as_py()
                    notes.append(f"{idc}=[{lo}..{hi}]")
                if t == "embeddings":
                    dim_probe = f.read_row_group(0, columns=["embedding"])["embedding"][0]
                    notes.append(f"dim={len(dim_probe)}")
            except Exception as e:  # noqa: BLE001 — a drift checker must REPORT
                # surprises (0 rows, missing column, empty row groups), not die
                problems.append(f"{path}: probe failed: {e}")
                notes.append(f"PROBE-FAILED ({e})")
            print(f"  {t}: {n} rows  {' '.join(notes)}")
    if problems:
        print(f"\nDRIFT PROBLEMS: {problems}")
        return 1
    print("\nno structural drift problems (semantic drift: compare row "
          "counts/ranges against the previous round's output of this script)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
