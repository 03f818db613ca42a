"""Skew-stress report → BENCH/SKEW.md.

Runs fences_spark.skewbench.run_skew_stress (the same block bench.py
embeds in its JSON as "skew_stress") at a standalone, larger row
count and writes the markdown record.

Run: python scripts/bench_skew.py [rows]
"""

from __future__ import annotations

import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("SKEW_ROWS", "8000000"))


def main() -> None:
    from fences_spark.session import get_spark
    from fences_spark.skewbench import run_skew_stress

    spark = get_spark(app="bench_skew", cores=32, shuffle_partitions=32)
    res = run_skew_stress(spark, n=ROWS)
    d = res.as_dict()
    print(json.dumps(d))

    lines = [
        "# BENCH/SKEW — skew-stress evidence",
        "",
        f"Generated: {datetime.datetime.now(datetime.timezone.utc).isoformat(timespec='seconds')}",
        f"Rows per input: {ROWS:,} (uniform vs skewed, identical schema/size)",
        "",
        "Skew profile: one repo owns 50% of rows, one (repo, path, commit)",
        "triple owns 10%, one boilerplate content owns 30%.  Criterion:",
        "wall(skewed) <= 2x wall(uniform) per job — the skew-bounded",
        "implementations (salted two-phase dedup, map-side partial",
        "aggregation, AQE skew-join split) keep the hot key off a single",
        "reducer.  AQE skew thresholds are scaled to the harness input",
        "size (4MB/2MB vs the production 256MB/64MB) so the split fires",
        "at MB scale exactly as it would at TB scale; plan evidence:",
        f"`SortMergeJoin(skew=true)` observed = **{d['skew_split_fired']}**.",
        "",
        "| job | uniform s | skewed s | ratio |",
        "|---|---|---|---|",
    ]
    for name, v in d["ops"].items():
        lines.append(f"| {name} | {v['uniform']} | {v['skewed']} | {v['ratio']} |")
    lines += [
        "",
        f"**max ratio = {d['max_ratio']} (target <= {d['target_ratio']}) → "
        f"{'PASS' if d['pass'] else 'FAIL'}**",
        "",
        "Command: `python scripts/bench_skew.py [rows]`; the same block runs",
        "inside `python bench.py` (key `skew_stress`, 2M rows) so every",
        "driver BENCH round records it.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "SKEW.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
