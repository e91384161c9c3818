"""Merge per-query bench_scale runs (one JSON doc per file, last line of
each --out file) into a single SCALE_STUDY_r{N}.json. Per-query files
exist because the round-5 ladder is run one fresh JVM per query: a shared
driver accumulates localCheckpoint blocks across ~36 giant query-runs (a
shape no production cluster has) and distorts both memory and timing.

Usage: python tools/merge_scale_study.py OUT.json IN1.out IN2.out ...
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, ins = sys.argv[1], sys.argv[2:]
    merged: dict[str, dict] = {}
    for p in ins:
        doc = None
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line.startswith('{"scale_study"'):
                    doc = json.loads(line)
        if doc is None:
            print(f"WARN: no scale_study JSON in {p}", file=sys.stderr)
            continue
        merged.update(doc["scale_study"])
    with open(out_path, "w") as f:
        json.dump({"scale_study": merged}, f, indent=1)
    print(f"{out_path}: {sorted(merged)}")


if __name__ == "__main__":
    main()
