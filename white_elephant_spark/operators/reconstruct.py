"""Entity reconstruction (J1-J6 in SURVEY.md §2.3).

The reference reconstructs Job ⊃ Task ⊃ Attempt entities by shuffling
every line fragment of a job to one reducer and merging imperatively
(parsing/ParseJobsFromLogs.java:297-760). Spark-first version: each
merge is a ``groupBy().agg()`` with per-field precedence expressions —
map-side partial aggregation halves the shuffle for free, and nothing
ever materializes a whole job in one task's memory (at 100 TB a single
hot job's fragments still fit, because merges are associative
aggregates, not an in-reducer list).

Merge semantics preserved from the reference (SURVEY §4 quirk list):
- last-non-null wins per field, in *line order* (J2/J3). Line order
  inside a log file is reproduced with ``input_file_name`` + a
  monotonically increasing per-file line index captured at scan time;
  here the caller provides an explicit ``seq`` ordering column.
- jobStatus is taken only from lines that also carry FINISH_TIME
  (ParseJobsFromLogs.java:385-389) — status appears throughout a
  job's lifetime, only the terminal one counts.
- duplicate attempt fragments merge times with **max**
  (ParseJobsFromLogs.java:575-609) and keep the last counters map
  (:616-619).
- attempts missing ids/status/times or with finish<start are dropped
  (P7, ParseJobsFromLogs.java:622-669).
- excess labeling (J5, ParseJobsFromLogs.java:709-748): within a
  task, every non-SUCCESS attempt is excess; if no attempt succeeded,
  the first (by startTime, then attemptId) is un-marked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _last_non_null(col: str, seq: str) -> Column:
    """Value of ``col`` on the highest-``seq`` row where it's set."""
    return F.max_by(F.col(col), F.when(F.col(col).isNotNull(), F.col(seq)))


def merge_job_fragments(
    job_lines: DataFrame, seq_col: str = "seq", extra_keys: tuple[str, ...] = ()
) -> DataFrame:
    """J2 — fold per-line job fragments to one row per jobId
    (ParseJobsFromLogs.java:380-456). ``extra_keys`` carries
    job-constant columns (e.g. the P9 ``cluster`` derived from the
    file path) through the fold as additional group keys."""
    last = lambda c: _last_non_null(c, seq_col)  # noqa: E731
    status_seq = F.when(
        F.col("jobStatus").isNotNull() & F.col("finishTime").isNotNull(),
        F.col(seq_col),
    )
    return job_lines.groupBy("jobId", *extra_keys).agg(
        last("user").alias("user"),
        last("jobName").alias("jobName"),
        last("jobQueue").alias("jobQueue"),
        # terminal-status rule: only lines that also carry finishTime
        F.max_by(F.col("jobStatus"), status_seq).alias("jobStatus"),
        last("submitTime").alias("submitTime"),
        last("launchTime").alias("launchTime"),
        last("finishTime").alias("finishTime"),
        last("totalMaps").alias("totalMaps"),
        last("totalReduces").alias("totalReduces"),
        last("finishedMaps").alias("finishedMaps"),
        last("finishedReduces").alias("finishedReduces"),
        last("failedMaps").alias("failedMaps"),
        last("failedReduces").alias("failedReduces"),
    )


def merge_task_fragments(task_lines: DataFrame, seq_col: str = "seq") -> DataFrame:
    """J3 — one row per (jobId, taskId), last-non-null per field
    (ParseJobsFromLogs.java:458-527)."""
    last = lambda c: _last_non_null(c, seq_col)  # noqa: E731
    return task_lines.groupBy("jobId", "taskId").agg(
        last("type").alias("type"),
        last("taskStatus").alias("taskStatus"),
        last("startTime").alias("startTime"),
        last("finishTime").alias("finishTime"),
    )


def merge_attempt_fragments(attempt_lines: DataFrame, seq_col: str = "seq") -> DataFrame:
    """J4 (merge half) — one row per attempt; times merge with max,
    counters keep the last fragment's map
    (ParseJobsFromLogs.java:575-619)."""
    return attempt_lines.groupBy("jobId", "taskId", "taskAttemptId").agg(
        _last_non_null("type", seq_col).alias("type"),
        _last_non_null("taskStatus", seq_col).alias("taskStatus"),
        F.max("startTime").alias("startTime"),
        F.max("finishTime").alias("finishTime"),
        F.max("shuffleFinished").alias("shuffleFinished"),
        F.max("sortFinished").alias("sortFinished"),
        F.max_by(F.col("counters"), F.col(seq_col)).alias("counters"),
    )


def filter_valid_attempts(attempts: DataFrame) -> DataFrame:
    """P7 — drop (not error) attempts missing id/status/times or with
    finish < start (ParseJobsFromLogs.java:622-669)."""
    return attempts.filter(
        F.col("taskAttemptId").isNotNull()
        & F.col("taskStatus").isNotNull()
        & F.col("startTime").isNotNull()
        & F.col("finishTime").isNotNull()
        & (F.col("finishTime") >= F.col("startTime"))
    )


def label_excess(attempts: DataFrame) -> DataFrame:
    """J5 — excess-attempt labeling (ParseJobsFromLogs.java:709-748).

    Per task (attempts ordered by startTime, then attemptId):
    every non-SUCCESS attempt is ``excess``; if **no** attempt of the
    task succeeded, the first attempt is un-marked — the task had to
    run once, so only retries count as waste.
    """
    task = ("jobId", "taskId")
    order = [F.col("startTime").asc(), F.col("taskAttemptId").asc()]
    w_rank = Window.partitionBy(*task).orderBy(*order)
    w_task = Window.partitionBy(*task)
    any_success = F.max((F.col("taskStatus") == "SUCCESS").cast("int")).over(w_task) == 1
    rn = F.row_number().over(w_rank)
    return attempts.withColumn(
        "excess",
        F.when(F.col("taskStatus") == "SUCCESS", F.lit(False)).otherwise(
            F.when(any_success, F.lit(True)).otherwise(rn != 1)
        ),
    )


def derive_attempt_measures(attempts: DataFrame) -> DataFrame:
    """J6 — per-attempt derived measures
    (ParseJobsFromLogs.java:715-731): wall minutes from the time span,
    cpuMinutes from the CPU_MILLISECONDS counter; zero start/finish
    nulls the measure."""
    valid_span = (F.col("startTime") > 0) & (F.col("finishTime") > 0)
    return attempts.withColumns(
        {
            "minutes": F.when(
                valid_span, (F.col("finishTime") - F.col("startTime")) / 60000.0
            ),
            "cpuMinutes": F.element_at(F.col("counters"), "CPU_MILLISECONDS") / 60000.0,
        }
    )


def _cmp_fields(a: Column, b: Column, fields: list[str]) -> Column:
    """Lexicographic struct comparator as a -1/0/1 expression — the
    Spark analogue of the reference's Java sort comparators. Needed
    (vs natural struct ordering) because the structs carry map-typed
    columns (counters), which are not orderable in Spark."""
    out = F.lit(0)
    for f in reversed(fields):
        out = (
            F.when(a[f] < b[f], F.lit(-1))
            .when(a[f] > b[f], F.lit(1))
            .otherwise(out)
        )
    return out


def to_nested_jobs(
    jobs: DataFrame, tasks: DataFrame, attempts: DataFrame
) -> DataFrame:
    """J3/J4 attach + O1 sorts — assemble the reference's nested
    export record Job ⊃ Task ⊃ Attempt (LogData.avsc:30-139) from the
    flat entity DataFrames.

    Sort parity: tasks ordered by taskId
    (ParseJobsFromLogs.java:518-524); attempts ordered by startTime,
    then taskAttemptId (:701-707,751-757). Attempts attach to their
    task by (jobId, taskId) inner match (:679-694 — the reference
    errors on a missing task; here the inner join drops, consistent
    with the P7 drop-don't-error policy).

    Distributed shape: two groupBy+collect_list levels — each task's
    attempt list, then each job's task list, lives in one aggregation
    buffer, which is exactly the reference's reducer memory footprint
    for one job. The flat DataFrames remain the query-side
    representation (SURVEY §7.3); this operator exists for export
    parity at the serving edge."""
    att_struct = F.struct(
        "taskAttemptId", "taskStatus", "startTime", "finishTime",
        "shuffleFinished", "sortFinished",
        *(["counters"] if "counters" in attempts.columns else []),
        *(["excess"] if "excess" in attempts.columns else []),
        *(["minutes"] if "minutes" in attempts.columns else []),
        *(["cpuMinutes"] if "cpuMinutes" in attempts.columns else []),
    )
    att_arrays = attempts.groupBy("jobId", "taskId").agg(
        F.array_sort(
            F.collect_list(att_struct),
            lambda a, b: _cmp_fields(a, b, ["startTime", "taskAttemptId"]),
        ).alias("attempts")
    )
    task_struct = F.struct(
        "taskId", "type", "taskStatus", "startTime", "finishTime", "attempts"
    )
    task_arrays = (
        tasks.join(att_arrays, ["jobId", "taskId"])
        .groupBy("jobId")
        .agg(
            F.array_sort(
                F.collect_list(task_struct),
                lambda a, b: _cmp_fields(a, b, ["taskId"]),
            ).alias("tasks")
        )
    )
    return jobs.join(task_arrays, "jobId", "left")


def reconstruct_attempts(raw_attempt_lines: DataFrame, seq_col: str = "seq") -> DataFrame:
    """Full J4+P7+J5+J6 chain from parsed attempt-line fragments to
    labeled, measured attempts (the input of the usage cube)."""
    merged = merge_attempt_fragments(raw_attempt_lines, seq_col)
    return derive_attempt_measures(label_excess(filter_valid_attempts(merged)))
