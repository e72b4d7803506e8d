"""Append the sf1 gate-verification sections to SCALING.md.

``scale_probe.py`` rewrites/append-builds the growth tables but knows
nothing about the separate sf1 *gate* runs (bench ratio and, when one
was done, the full oracle selfcheck). Those sections kept getting
dropped on regeneration and re-added by hand from shell history; this
makes the re-append reproducible:

    python tools/append_gate_sections.py /tmp/bench_sf1.json \
        [--selfcheck "50/50 passed" --selfcheck-log /tmp/selfcheck_sf1.log]

The bench JSON is the single line bench.py printed for the sf1 run.
Queries whose oracle hit the timeout ceiling record -1.0 in
``duckdb_queries``; they are named, and the ratio is recomputed over
the measured twins only (Spark's own time still counts, so the
reported ratio is conservative).
"""

from __future__ import annotations

import argparse
import json
import os


def gate_section(bench: dict) -> str:
    sq = bench["queries"]
    dq = bench.get("duckdb_queries", {})
    timed_out = sorted(n for n, v in dq.items() if v is not None and v < 0)
    duck_total = sum(v for v in dq.values() if v is not None and v >= 0)
    spark_total = sum(sq.values())
    ratio = spark_total / duck_total if duck_total > 0 else float("nan")
    gaps = sorted(
        ((dq.get(n) or 0) - t, n, t, dq.get(n))
        for n, t in sq.items()
        if (dq.get(n) or 0) > 0
    )
    # only actual wins (duck slower than spark) — with fewer than 3
    # wins the unfiltered tail would present Spark LOSSES as wins
    wins = [
        f"{n} {t:.1f}s vs {d:.1f}s" for g, n, t, d in reversed(gaps[-3:]) if g > 0
    ]
    lines = [
        "## Bench gate re-verified at sf1",
        "",
        "`SPARK_GRAFT_SF_DIR=.scratch/sf1 SPARK_GRAFT_BENCH_PARTS=16"
        " SPARK_GRAFT_ORACLE_TIMEOUT=180 python bench.py`",
        f"(same {len(sq)} headline queries, same symmetric best-of-N"
        " policy, synthesized corpus as above — growth measurement, not"
        " a correctness gate):",
        "",
        f"- Spark total **{spark_total:.3f}s**, DuckDB-oracle total"
        f" **{duck_total:.3f}s**, `spark_over_duckdb` = **{ratio:.3f}**.",
    ]
    if wins:
        lines.append(f"  Largest absolute Spark wins: {'; '.join(wins)}.")
    if timed_out:
        lines += [
            f"- Oracle twins over the 180s ceiling (recorded -1.0,"
            f" excluded from the DuckDB total; Spark's own time still"
            f" counts, so the ratio is conservative): "
            + ", ".join(f"`{n}`" for n in timed_out)
            + ".",
        ]
    return "\n".join(lines) + "\n"


def selfcheck_section(result: str, log: str | None) -> str:
    lines = [
        "## Oracle correctness re-verified at sf1",
        "",
        "`python tools/selfcheck.py .scratch/sf1` — the full oracle",
        "comparison (rows + schema + value hash) on the synthesized",
        f"10x corpus: **{result}**.",
    ]
    if log:
        lines.append(f"(Full per-query log: `{log}`.)")
    return "\n".join(lines) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bench_json", help="file holding bench.py's sf1 JSON line")
    ap.add_argument("--selfcheck", help='e.g. "50/50 passed" to add the oracle section')
    ap.add_argument("--selfcheck-log", default=None)
    args = ap.parse_args()

    with open(args.bench_json) as f:
        bench = json.loads(f.read().strip().splitlines()[-1])
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    parts = [gate_section(bench)]
    if args.selfcheck:
        parts.append(selfcheck_section(args.selfcheck, args.selfcheck_log))
    with open(out, "a") as f:
        f.write("\n" + "\n".join(parts))
    print(f"appended {len(parts)} gate section(s) to {out}")


if __name__ == "__main__":
    main()
