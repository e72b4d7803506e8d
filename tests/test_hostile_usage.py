"""Adversarial usage-pipeline differential (r12 VERDICT #7 stretch).

The parser → reconstruct → usage-cube path has been oracle-green since
round 5 on planted-quirk fixtures whose hostile cases are enumerated
and sectioned. This suite renders a HOSTILE log fixture — an order of
magnitude larger than the unit fixtures, with the failure classes the
verdict named — and diffs the full exact-integer usage cube computed
by the engine (scan → parse → J4 merge → P7 → J5 → A1 explode → A3)
against an INDEPENDENT DuckDB twin that re-implements the same
semantics in SQL directly over the raw file bytes:

- truncated lines interleaved at random offsets (some drop as noise,
  some parse as partial fragments whose captured params must merge
  via the last-non-null fold — including a truncated duplicate that
  lands LAST and therefore replaces the attempt's counters map with
  a partial/empty one);
- duplicate attempt fragments with CONFLICTING counters (times merge
  with max across fragments, the LAST fragment's counters map wins
  wholesale — a later fragment missing SPILLED_RECORDS erases it);
- DST-transition-spanning attempts at BOTH America/Los_Angeles fold
  hours (spring-forward 2024-03-10 and fall-back 2024-11-03): the
  cube's GMT hour explode and proration must be calendar-free;
- zero-length attempts (emit no buckets at all — loop rule
  `currentTime < end`) and reverse-order fragments (finish < start:
  dropped when alone, VALID when a later fragment's max-merge raises
  the finish past the start);
- duplicate params on one line (LAST_WIN), duplicate counter groups
  (LAST_WIN), escaped quotes stripped before param extraction,
  attempt lines polluted with USER= plus a job-id-shaped token (the
  P5 classifier's job-first precedence reroutes them into the job
  fold — their TASK_ATTEMPT_ID must never become an attempt), orphan
  attempts whose job lines are absent (inner user-attach drops them);
- hidden poison files (.*/_* with well-formed corrupt job lines) the
  scan must exclude.

The twin shares NOTHING with the engine: DuckDB regexes over the raw
lines, list-filter param extraction, window-function excess labeling,
generate_series hour explode. Measures are the exact-integer cube
(elapsedMs / cpuMsProrated / spilledRecords / reduceShuffleBytes /
started / finished) so the comparison is bit-exact — double proration
uses the same IEEE-754 op sequence (div, mul, floor) on both sides.
"""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

LA_SPRING_FOLD_MS = 1_710_064_800_000  # 2024-03-10T10:00:00Z = 02:00->03:00 LA
LA_FALL_FOLD_MS = 1_730_624_400_000  # 2024-11-03T09:00:00Z = second 01:00 LA
BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
HOUR = 3_600_000

N_JOBS = 5_000  # ~25k lines, ~10x the sectioned unit fixture


def _render_hostile(root: str, n_jobs: int = N_JOBS, seed: int = 13) -> None:
    """Write the hostile fixture as real log files under
    <root>/<cluster>/daily/2024/<MMdd>/part-N.log. Every job's lines
    stay within one file (the reference's layout — within-file order
    is the only merge order that exists), but fragment order inside
    the file is seeded-shuffled so duplicates land before AND after
    their primaries."""
    rng = random.Random(seed)
    files: dict[tuple[str, int], list[str]] = {}

    def emit(cluster: str, fileno: int, line: str) -> None:
        buf = files.setdefault((cluster, fileno), [])
        buf.append(line)
        # interleaved truncated copies: parse either as noise or as a
        # partial fragment, depending on where the cut lands
        if rng.random() < 0.12:
            cut = rng.randrange(10, len(line))
            buf.append(line[:cut])

    for k in range(n_jobs):
        cluster = "alpha" if k % 2 == 0 else "beta"
        fileno = (k // 2) % 3
        jid = f"job_{k}_7"
        submit = BASE_MS + (k * 97_003) % (300 * 86_400_000)
        user = f"u{k % 17}"

        # job fragments: early bogus non-terminal, late terminal
        emit(
            cluster, fileno,
            f'Job JOBID="{jid}" JOBNAME="h{k}" USER="{user}" JOB_STATUS="FAILURE"'
            f' SUBMIT_TIME="{submit}" TOTAL_MAPS="999" .',
        )
        if k % 17 == 4:  # escaped quotes stripped before param extraction
            emit(
                cluster, fileno,
                f'Job JOBID="{jid}" JOBNAME="we \\"quoted\\" it" USER="{user}" .',
            )
        if k % 7 == 2:  # duplicate param on one line: LAST_WIN
            emit(
                cluster, fileno,
                f'Job JOBID="{jid}" TOTAL_MAPS="1" JOB_STATUS="SUCCESS"'
                f' FINISH_TIME="{submit + 777_000}" TOTAL_MAPS="{k % 50}" .',
            )
        else:
            emit(
                cluster, fileno,
                f'Job JOBID="{jid}" JOB_STATUS="SUCCESS"'
                f' FINISH_TIME="{submit + 777_000}" TOTAL_MAPS="{k % 50}" .',
            )

        tid = f"task_{k}_7_m_0"
        aid = f"attempt_{k}_7_m_0_0"
        kind = "MapAttempt" if k % 4 != 1 else "ReduceAttempt"
        ttype = "MAP" if k % 8 < 6 else "REDUCE"  # incl. mismatched prefix/type

        # class-planted spans
        if k % 50 == 7:  # spans the LA spring-forward fold hour
            start, fin = LA_SPRING_FOLD_MS - 90 * 60_000, LA_SPRING_FOLD_MS + 45 * 60_000
        elif k % 50 == 17:  # spans the LA fall-back fold (both 01:00s)
            start, fin = LA_FALL_FOLD_MS - HOUR - 30 * 60_000, LA_FALL_FOLD_MS + 20 * 60_000
        elif k % 11 == 3:  # zero-length: passes P7, emits NO buckets
            start = fin = submit + 1_000
        elif k % 13 in (5, 6):  # reverse-order: dropped at P7 when alone
            start, fin = submit + 60_000, submit + 10_000
        elif k % 41 == 19:
            # finishes EXACTLY on an hour boundary: the boundary bucket
            # itself is never emitted (loop rule `currentTime < end`);
            # `finished` books into the PRECEDING hour
            start = submit + 1_000
            fin = (start // HOUR + 2) * HOUR
        else:
            start = submit + 1_000
            fin = start + 61_000 + (k % 7_200) * 1_000

        emit(
            cluster, fileno,
            f'{kind} TASK_TYPE="{ttype}" TASKID="{tid}" TASK_ATTEMPT_ID="{aid}"'
            f' TASK_STATUS="SUCCESS" START_TIME="{start}" FINISH_TIME="{fin}"'
            f' COUNTERS="[(CPU_MILLISECONDS)(cpu)({1 + k % 999_983})'
            f'(SPILLED_RECORDS)(sp)({k % 4_001})]" .',
        )
        if k % 13 == 6:  # reverse-order fragment HEALED by a later max-merge
            emit(
                cluster, fileno,
                f'{kind} TASK_TYPE="{ttype}" TASKID="{tid}" TASK_ATTEMPT_ID="{aid}"'
                f' FINISH_TIME="{start + 2 * HOUR + 300_017}" .',
            )
        if k % 3 == 0:  # conflicting-counters duplicate: last map wins WHOLESALE
            emit(
                cluster, fileno,
                f'{kind} TASK_TYPE="{ttype}" TASKID="{tid}" TASK_ATTEMPT_ID="{aid}"'
                f' TASK_STATUS="SUCCESS" START_TIME="{start - 500}"'
                f' FINISH_TIME="{fin + 2_000}"'
                f' COUNTERS="[(CPU_MILLISECONDS)(cpu)({7 + k % 13})'
                f'(CPU_MILLISECONDS)(cpu)({k % 1_000_003})'
                f'(REDUCE_SHUFFLE_BYTES)(rs)({k % 77_777})]" .',
            )
        if k % 4 == 0:  # excess retry (task DID succeed -> retry is excess)
            emit(
                cluster, fileno,
                f'{kind} TASK_TYPE="{ttype}" TASKID="{tid}"'
                f' TASK_ATTEMPT_ID="attempt_{k}_7_m_0_1" TASK_STATUS="FAILED"'
                f' START_TIME="{start - 200}" FINISH_TIME="{start + 50_000}"'
                f' COUNTERS="[(CPU_MILLISECONDS)(cpu)({3 + k % 17})]" .',
            )
        if k % 23 == 21:  # all-FAILED task: FIRST attempt is un-marked
            t2 = f"task_{k}_7_r_1"
            for i in range(2):
                emit(
                    cluster, fileno,
                    f'ReduceAttempt TASK_TYPE="REDUCE" TASKID="{t2}"'
                    f' TASK_ATTEMPT_ID="attempt_{k}_7_r_1_{i}" TASK_STATUS="FAILED"'
                    f' START_TIME="{start + i * 1_000}" FINISH_TIME="{start + 400_000 + i}"'
                    f' COUNTERS="[(SPILLED_RECORDS)(sp)({k % 501})]" .',
                )
        if k % 19 == 11:  # orphan attempt: its job's lines never exist
            emit(
                cluster, fileno,
                f'MapAttempt TASK_TYPE="MAP" TASKID="task_9{k}9_9_m_0"'
                f' TASK_ATTEMPT_ID="attempt_9{k}9_9_m_0_0" TASK_STATUS="SUCCESS"'
                f' START_TIME="{start}" FINISH_TIME="{fin + 1}"'
                f' COUNTERS="[(CPU_MILLISECONDS)(cpu)(5)]" .',
            )
        if k % 29 == 13:
            # attempt line polluted with USER= and a job-id-shaped
            # token: P5's job-first precedence classifies it JOB (the
            # fragment merges into the real job via the regex jobId
            # fallback); its TASK_ATTEMPT_ID must NOT become an attempt
            emit(
                cluster, fileno,
                f'MapAttempt TASK_TYPE="MAP" USER="{user}" JOBNAME="{jid}"'
                f' TASKID="{tid}" TASK_ATTEMPT_ID="{aid}_9" TASK_STATUS="KILLED"'
                f' START_TIME="{start}" FINISH_TIME="{fin}" .',
            )
        # pure noise
        if k % 31 == 9:
            emit(cluster, fileno, f"garbage line {k} with = signs and no grammar")

    for (cluster, fileno), buf in files.items():
        rng.shuffle(buf)  # hostile fragment order, still deterministic
        d = os.path.join(root, cluster, "daily", "2024", "0101")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"part-{fileno}.log"), "w") as fh:
            fh.write('Meta VERSION="1" .\n')
            for line in buf:
                fh.write(line + "\n")
        for bad in (".stale-part.log", "_tmp-attempt.log"):
            with open(os.path.join(d, bad), "w") as fh:
                fh.write(
                    'Meta VERSION="1" .\n'
                    'Job JOBID="job_0_7" JOB_STATUS="FAILED"'
                    ' FINISH_TIME="999999999999999" TOTAL_MAPS="31337" .\n'
                    'MapAttempt TASK_TYPE="MAP" TASKID="task_0_7_m_0"'
                    ' TASK_ATTEMPT_ID="attempt_0_7_m_0_0" TASK_STATUS="SUCCESS"'
                    ' START_TIME="1" FINISH_TIME="999999999999999" .\n'
                )


def _engine_cube(spark, root: str):
    """scan → parse → J4 merge → P7 → J5 → user/cluster attach →
    A1 explode → exact-integer A3 — entirely the production operators."""
    from white_elephant_spark.operators import parse, reconstruct, usage
    from white_elephant_spark.sources import logfiles

    lines = logfiles.read_log_lines(
        spark, os.path.join(root, "*", "daily", "*", "*", "*.log")
    ).withColumn("cluster", logfiles.cluster_from_path(root_name="hostile"))
    atts = reconstruct.reconstruct_attempts(parse.parse_attempt_lines(lines))
    jobs = reconstruct.merge_job_fragments(
        parse.parse_job_lines(lines), extra_keys=("cluster",)
    )
    cube_in = atts.drop("cluster").join(
        jobs.select("jobId", "user", "cluster"), "jobId"
    )
    per_hour = usage.explode_attempt_hours(usage.filter_usable_attempts(cube_in))
    out = usage.aggregate_usage_exact(per_hour)
    # ntz -> epoch ms under the session's pinned UTC zone (test-side
    # transform only; the operator output is untouched)
    return out.withColumn(
        "hour_ms", F.unix_millis(F.col("time").cast("timestamp"))
    ).drop("time")


_TWIN_SQL = r"""
WITH clean AS (
  SELECT cluster, fname, lineno,
         regexp_replace(line, '\\"', '', 'g') AS cl, line
  FROM raw
),
classified AS (
  SELECT *,
    CASE
      WHEN regexp_matches(line, '^Job JOBID="job_\d+_\d+"')
           OR (contains(line, 'USER=') AND regexp_matches(line, 'job_\d+_\d+'))
        THEN 'job'
      WHEN regexp_matches(line, '^(Map|Reduce)Attempt TASK_TYPE="(MAP|REDUCE)"')
        THEN 'attempt'
      WHEN regexp_matches(line, '^Task TASKID="task_\d+_\d+_[mr]_\d+" TASK_TYPE="(MAP|REDUCE)"')
        THEN 'task'
    END AS kind
  FROM clean
),
job_frag AS (
  SELECT cluster, fname, lineno,
         COALESCE(pval(cl, 'JOBID'), regexp_extract(line, '(job_\d+_\d+)', 1)) AS jobId,
         pval(cl, 'USER') AS juser
  FROM classified WHERE kind = 'job'
),
jobs AS (
  SELECT jobId, cluster,
         (list(juser ORDER BY lineno) FILTER (WHERE juser IS NOT NULL))[-1] AS juser
  FROM job_frag
  WHERE length(jobId) > 0
  GROUP BY jobId, cluster
),
att_frag AS (
  SELECT cluster, fname, lineno, cl,
         regexp_extract(line, '^(Map|Reduce)Attempt TASK_TYPE="(MAP|REDUCE)"', 2) AS type,
         pval(cl, 'TASKID') AS taskId,
         pval(cl, 'TASK_ATTEMPT_ID') AS attId,
         pval(cl, 'TASK_STATUS') AS status,
         TRY_CAST(NULLIF(pval(cl, 'START_TIME'), '') AS BIGINT) AS tstart,
         TRY_CAST(NULLIF(pval(cl, 'FINISH_TIME'), '') AS BIGINT) AS tfinish,
         CASE WHEN taskId IS NULL THEN NULL
              WHEN regexp_extract(taskId, 'task_(\d+_\d+)', 0) = '' THEN ''
              ELSE 'job_' || regexp_extract(taskId, 'task_(\d+_\d+)', 1)
         END AS jobId
  FROM classified WHERE kind = 'attempt'
),
att_merged AS (
  SELECT jobId, taskId, attId,
         (list(type ORDER BY lineno) FILTER (WHERE type IS NOT NULL))[-1] AS type,
         (list(status ORDER BY lineno) FILTER (WHERE status IS NOT NULL))[-1] AS status,
         max(tstart) AS tstart,
         max(tfinish) AS tfinish,
         arg_max(cl, lineno) AS last_cl
  FROM att_frag
  WHERE attId IS NOT NULL AND length(jobId) > 0
  GROUP BY jobId, taskId, attId
),
att_valid AS (
  SELECT *, cval(last_cl, 'CPU_MILLISECONDS') AS cpu,
         cval(last_cl, 'SPILLED_RECORDS') AS spilled,
         cval(last_cl, 'REDUCE_SHUFFLE_BYTES') AS shuffle
  FROM att_merged
  WHERE attId IS NOT NULL AND status IS NOT NULL
    AND tstart IS NOT NULL AND tfinish IS NOT NULL AND tfinish >= tstart
),
att_lab AS (
  SELECT *,
    CASE WHEN status = 'SUCCESS' THEN FALSE
         WHEN max(CASE WHEN status = 'SUCCESS' THEN 1 ELSE 0 END)
              OVER (PARTITION BY jobId, taskId) = 1 THEN TRUE
         ELSE row_number() OVER (PARTITION BY jobId, taskId
                                 ORDER BY tstart, attId) <> 1
    END AS excess
  FROM att_valid
),
joined AS (
  SELECT a.*, j.juser, j.cluster AS jcluster
  FROM att_lab a JOIN jobs j USING (jobId)
  WHERE a.tstart > 0 AND a.tfinish > 0
),
hours AS (
  SELECT juser, jcluster AS cluster, excess, type, status,
         h AS hour_idx, tstart, tfinish, cpu, spilled, shuffle,
         h * 3600000 AS bucket,
         h * 3600000 + 3600000 AS bend
  FROM joined, UNNEST(generate_series(tstart // 3600000,
                                      (tfinish - 1) // 3600000)) AS t(h)
  WHERE tfinish > tstart
),
rows_ AS (
  SELECT juser, cluster, excess, type, status, hour_idx,
         CASE WHEN bend >= tstart AND tstart >= bucket THEN 1 ELSE 0 END AS started,
         CASE WHEN bend >= tfinish AND tfinish >= bucket THEN 1 ELSE 0 END AS finished,
         least(bend, tfinish) - greatest(bucket, tstart) AS elapsedMs,
         CAST(floor(((least(bend, tfinish) - greatest(bucket, tstart))::DOUBLE
                     / (tfinish - tstart)::DOUBLE) * cpu::DOUBLE) AS BIGINT) AS cpuMsProrated,
         CAST(floor(((least(bend, tfinish) - greatest(bucket, tstart))::DOUBLE
                     / (tfinish - tstart)::DOUBLE) * spilled::DOUBLE) AS BIGINT) AS spilledRecords,
         shuffle AS reduceShuffleBytes
  FROM hours
)
SELECT juser, hour_idx * 3600000 AS hour_ms, cluster, excess, type, status,
       sum(started) AS started, sum(finished) AS finished,
       sum(elapsedMs) AS elapsedMs, sum(cpuMsProrated) AS cpuMsProrated,
       sum(spilledRecords) AS spilledRecords,
       sum(reduceShuffleBytes) AS reduceShuffleBytes
FROM rows_
GROUP BY ALL
"""


def _duck_cube(root: str):
    """The independent twin: raw bytes -> cube, all in DuckDB SQL."""
    import duckdb

    rows = []
    for cluster in sorted(os.listdir(root)):
        cdir = os.path.join(root, cluster, "daily", "2024", "0101")
        if not os.path.isdir(cdir):
            continue
        for fname in sorted(os.listdir(cdir)):
            if fname.startswith((".", "_")):
                continue  # the S5 contract, applied independently
            with open(os.path.join(cdir, fname)) as fh:
                for i, line in enumerate(fh):
                    rows.append((cluster, fname, i, line.rstrip("\n")))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE raw(cluster TEXT, fname TEXT, lineno BIGINT, line TEXT)"
    )
    con.executemany("INSERT INTO raw VALUES (?, ?, ?, ?)", rows)
    # last occurrence of NAME="value" (params_map LAST_WIN + element_at);
    # value chars are [^"]* so the greedy quote-to-quote capture is it
    con.execute(
        """CREATE MACRO pval(cl, k) AS regexp_extract(
             (list_filter(regexp_extract_all(cl, '[A-Z_]+="[^"]*"'),
                          x -> starts_with(x, k || '="')))[-1],
             '"(.*)"', 1)"""
    )
    # last occurrence of [(NAME)(disp)(value)] (counters_map LAST_WIN)
    con.execute(
        r"""CREATE MACRO cval(cl, k) AS TRY_CAST(regexp_extract(
             (list_filter(regexp_extract_all(cl, '\[\([A-Z_]+\)\([^()]*\)\(\d+\)\]'),
                          x -> starts_with(x, '[(' || k || ')')))[-1],
             '\((\d+)\)\]$', 1) AS BIGINT)"""
    )
    return con.execute(_TWIN_SQL).fetchall()


def test_hostile_usage_cube_matches_duckdb_twin(spark, tmp_path):
    # production queries get this from the catalog loader (catalog.py);
    # this test scans raw files directly, so set it the same way —
    # restored in the finally so the session-scoped fixture doesn't
    # leak the conf to later tests (r13 ADVICE)
    prev_policy = spark.conf.get("spark.sql.mapKeyDedupPolicy", None)
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    try:
        _hostile_cube_body(spark, tmp_path)
    finally:
        if prev_policy is None:
            spark.conf.unset("spark.sql.mapKeyDedupPolicy")
        else:
            spark.conf.set("spark.sql.mapKeyDedupPolicy", prev_policy)


def _hostile_cube_body(spark, tmp_path):
    root = str(tmp_path / "hostile")
    _render_hostile(root)

    got = _engine_cube(spark, root).collect()
    spark_rows = sorted(
        (
            r["user"], r["hour_ms"], r["cluster"], r["excess"], r["type"],
            r["status"], r["started"], r["finished"], r["elapsedMs"],
            r["cpuMsProrated"], r["spilledRecords"], r["reduceShuffleBytes"],
        )
        for r in got
    )
    duck_rows = sorted(tuple(r) for r in _duck_cube(root))

    only_spark = sorted(set(spark_rows) - set(duck_rows))
    only_duck = sorted(set(duck_rows) - set(spark_rows))
    assert spark_rows == duck_rows, (
        f"cube diverged: {len(only_spark)} spark-only rows"
        f" (first 3: {only_spark[:3]}), {len(only_duck)} duck-only rows"
        f" (first 3: {only_duck[:3]})"
    )

    # the planted classes actually reached the cube: fold-spanning
    # attempts produce the fold hours, zero-length attempts produce
    # nothing for their (user, hour) keys
    hour_set = {r[1] for r in spark_rows}
    assert LA_SPRING_FOLD_MS in hour_set and LA_SPRING_FOLD_MS - HOUR in hour_set
    assert LA_FALL_FOLD_MS in hour_set and LA_FALL_FOLD_MS - HOUR in hour_set
    assert len(spark_rows) > 5_000  # the 10x fixture is genuinely exercised
