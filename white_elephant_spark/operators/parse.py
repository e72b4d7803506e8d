"""Log-line parsing (P1-P5 in SURVEY.md §2.2).

Re-expresses the reference's regex line parser
(hadoop/src/java/com/linkedin/whiteelephant/parsing/LineParsing.java:44-219,
267-338) as pure Catalyst expressions: ``rlike`` classification,
``regexp_extract_all`` → ``map_from_arrays`` parameter extraction.
No Python UDFs — the whole extract phase stays inside whole-stage
codegen, which is what makes it viable on 100 TB of raw logs.

Line grammar (LineParsing.java:44-51):
- params:    NAME="value"            (backslash-escaped quotes stripped first,
                                      LineParsing.java:56)
- counters:  [(NAME)(display)(123)]  (LineParsing.java:48)
- Job line:     ^Job JOBID="job_d_d" ... — or any line carrying USER= plus a
                job_d_d token (LineParsing.java:53-97)
- Attempt line: ^(Map|Reduce)Attempt TASK_TYPE="(MAP|REDUCE)" ...
                (LineParsing.java:158-219)
- Task line:    ^Task TASKID="task_..." TASK_TYPE="(MAP|REDUCE)" ...
                (LineParsing.java:267-338)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Regexes mirroring LineParsing.java:44-51 (semantics, not code).
PARAM_RE = r'([A-Z_]+)="([^"]*)"'
COUNTER_RE = r"\[\(([A-Z_]+)\)\([^()]*\)\((\d+)\)\]"
JOB_ID_RE = r"job_\d+_\d+"
TASK_ID_RE = r"task_\d+_\d+_[mr]_\d+"
JOB_LINE_RE = r'^Job JOBID="job_\d+_\d+"'
ATTEMPT_LINE_RE = r'^(Map|Reduce)Attempt TASK_TYPE="(MAP|REDUCE)"'
TASK_LINE_RE = r'^Task TASKID="task_\d+_\d+_[mr]_\d+" TASK_TYPE="(MAP|REDUCE)"'


def strip_escaped_quotes(line: Column) -> Column:
    """LineParsing.java:56 — remove ``\\"`` before param extraction."""
    return F.regexp_replace(line, r'\\"', "")


def params_map(line: Column) -> Column:
    """All ``NAME="value"`` pairs as map<string,string>; duplicate
    names keep the last occurrence (the reference's put-in-loop
    behavior, LineParsing.java:88-92 — requires
    spark.sql.mapKeyDedupPolicy=LAST_WIN, set by the catalog)."""
    clean = strip_escaped_quotes(line)
    return F.map_from_arrays(
        F.regexp_extract_all(clean, F.lit(PARAM_RE), 1),
        F.regexp_extract_all(clean, F.lit(PARAM_RE), 2),
    )


def counters_map(line: Column) -> Column:
    """COUNTERS groups ``[(NAME)(display)(value)]`` as
    map<string,long> (LineParsing.java:48,186-199)."""
    clean = strip_escaped_quotes(line)
    return F.map_from_arrays(
        F.regexp_extract_all(clean, F.lit(COUNTER_RE), 1),
        F.regexp_extract_all(clean, F.lit(COUNTER_RE), 2).cast("array<long>"),
    )


def job_id_from_task_id(task_id: Column) -> Column:
    """Derive jobId from a taskId/attemptId
    (LineParsing.java:201: ``String.format("job_%s_%s", ...)``)."""
    return F.regexp_replace(
        F.regexp_extract(task_id, r"task_(\d+_\d+)", 0), r"^task_", "job_"
    )


def classify(line: Column) -> Column:
    """P5 line classifier (ParseJobsFromLogs.java:205-262): try job →
    attempt → task; anything else is noise (NULL kind)."""
    is_job = line.rlike(JOB_LINE_RE) | (
        line.contains("USER=") & line.rlike(JOB_ID_RE)
    )
    return (
        F.when(is_job, F.lit("job"))
        .when(line.rlike(ATTEMPT_LINE_RE), F.lit("attempt"))
        .when(line.rlike(TASK_LINE_RE), F.lit("task"))
        .otherwise(F.lit(None).cast("string"))
    )


def _ms(params: Column, key: str) -> Column:
    return F.element_at(params, key).cast("long")


def _int(params: Column, key: str) -> Column:
    return F.element_at(params, key).cast("int")


def parse_job_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """P1+P2 — job-line fragments with typed fields
    (LineParsing.java:53-156). One output row per job *line*; the
    merge to one row per job is reconstruct.merge_job_fragments.

    JOB_STATUS is kept only when the line's value is SUCCESS or
    FAILURE (LineParsing.java:128-134), normalized to the JobStatus
    enum domain {SUCCESS, FAILED, KILLED} (LogData.avsc:113-119).
    """
    line = F.col(line_col)
    p = params_map(line)
    raw_status = F.element_at(p, "JOB_STATUS")
    job_id = F.coalesce(
        F.element_at(p, "JOBID"), F.regexp_extract(line, f"({JOB_ID_RE})", 1)
    )
    return (
        df.filter(classify(line) == "job")
        .select(
            "*",
            job_id.alias("jobId"),
            F.element_at(p, "USER").alias("user"),
            F.element_at(p, "JOBNAME").alias("jobName"),
            F.element_at(p, "JOB_QUEUE").alias("jobQueue"),
            F.when(raw_status == "SUCCESS", "SUCCESS")
            .when(raw_status == "FAILURE", "FAILED")
            .alias("jobStatus"),
            _ms(p, "SUBMIT_TIME").alias("submitTime"),
            _ms(p, "LAUNCH_TIME").alias("launchTime"),
            _ms(p, "FINISH_TIME").alias("finishTime"),
            _int(p, "TOTAL_MAPS").alias("totalMaps"),
            _int(p, "TOTAL_REDUCES").alias("totalReduces"),
            _int(p, "FINISHED_MAPS").alias("finishedMaps"),
            _int(p, "FINISHED_REDUCES").alias("finishedReduces"),
            _int(p, "FAILED_MAPS").alias("failedMaps"),
            _int(p, "FAILED_REDUCES").alias("failedReduces"),
        )
        # length(jobId) > 0 ≡ isNotNull AND != '' — in ONE reference.
        # The optimizer pushes this predicate below the projection by
        # substituting the aliased expression per reference, and a
        # filter-side evaluation re-derives the whole params map (the
        # codegen subexpression sharing that makes the 13-field
        # projection cost one map build does not extend into the
        # Filter): measured at sf0.1, the two-conjunct form ran the
        # parse at 8.9 s vs 5.6 s with the single-reference predicate.
        .filter(F.length(F.col("jobId")) > 0)
        .drop(line_col)
    )


def parse_attempt_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """P3 — attempt-line fragments (LineParsing.java:158-219), with
    counters map and jobId derived from the taskId. Truncated lines
    missing TASKID/TASK_ATTEMPT_ID are dropped
    (ParseJobsFromLogs.java:230-262)."""
    line = F.col(line_col)
    p = params_map(line)
    return (
        df.filter(classify(line) == "attempt")
        .select(
            "*",
            F.regexp_extract(line, r'^(Map|Reduce)Attempt TASK_TYPE="(MAP|REDUCE)"', 2).alias("type"),
            F.element_at(p, "TASKID").alias("taskId"),
            F.element_at(p, "TASK_ATTEMPT_ID").alias("taskAttemptId"),
            F.element_at(p, "TASK_STATUS").alias("taskStatus"),
            _ms(p, "START_TIME").alias("startTime"),
            _ms(p, "FINISH_TIME").alias("finishTime"),
            _ms(p, "SHUFFLE_FINISHED").alias("shuffleFinished"),
            _ms(p, "SORT_FINISHED").alias("sortFinished"),
            counters_map(line).alias("counters"),
        )
        .withColumn("jobId", job_id_from_task_id(F.col("taskId")))
        # Two references instead of three (see parse_job_lines' filter
        # note): jobId is a regex of taskId, so length(jobId) > 0
        # already implies taskId IS NOT NULL — only the attempt id
        # needs its own check.
        .filter(F.col("taskAttemptId").isNotNull() & (F.length(F.col("jobId")) > 0))
        .drop(line_col)
    )


def parse_task_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """P4 — task-line fragments (LineParsing.java:267-338)."""
    line = F.col(line_col)
    p = params_map(line)
    return (
        df.filter(classify(line) == "task")
        .select(
            "*",
            F.regexp_extract(line, TASK_LINE_RE, 1).alias("type"),
            F.element_at(p, "TASKID").alias("taskId"),
            F.element_at(p, "TASK_STATUS").alias("taskStatus"),
            _ms(p, "START_TIME").alias("startTime"),
            _ms(p, "FINISH_TIME").alias("finishTime"),
        )
        .withColumn("jobId", job_id_from_task_id(F.col("taskId")))
        # single reference (see parse_job_lines' filter note): jobId
        # derives from taskId, so length(jobId) > 0 covers both the
        # taskId null check and the non-empty check.
        .filter(F.length(F.col("jobId")) > 0)
        .drop(line_col)
    )
