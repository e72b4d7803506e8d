"""Job-conf XML parsing (P6/S2/J8 in SURVEY.md §2).

The reference reads each job's conf XML as one whole-file record
(mapreduce/lib/input/CombineDocumentFileFormat.java:36-116), DOM-parses
``<property><name>/<value>`` pairs into ``map<string,string>``, and
takes the jobId from the filename
(parsing/ParseJobConfs.java:180-228). The parsed confs share ``jobId``
with parsed jobs as "base data for a variety of usage analytics
workflows" (README.md:96-98) — the join itself (J8) is latent in the
reference and free here.

Spark-first: ``spark.read.format("binaryFile")`` is the whole-file
scan; the property extraction is JVM-side regex over the decoded text
(no Python UDF, no DOM) — each ``<property>`` block is isolated first
so a missing ``<value>`` can't misalign names and values, then the
five predefined XML entities are unescaped. At 100 TB of tiny conf
files the binaryFile source combines small files per task
(``spark.sql.files.maxPartitionBytes``), the regex runs inside
whole-stage codegen, and the conf side of J8 stays broadcast-sized
after projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: filename → jobId, e.g. ``.../job_201301010000_1234_conf.xml``
JOB_ID_RE = r"(job_[0-9]+_[0-9]+)"


def xml_unescape(s: Column) -> Column:
    """The five predefined XML entities (what a DOM parser would
    decode); ``&amp;`` last so it can't create new entities."""
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'")):
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.replace(s, F.lit("&amp;"), F.lit("&"))


def conf_map(xml: Column) -> Column:
    """``map<string,string>`` of the ``<property>`` entries. Blocks
    are isolated first ((?s): tags may span lines), so malformed
    entries yield empty strings rather than shifting pairs."""
    props = F.regexp_extract_all(xml, F.lit(r"(?s)<property>(.*?)</property>"), F.lit(1))
    name = lambda p: xml_unescape(  # noqa: E731
        F.regexp_extract(p, r"(?s)<name>\s*(.*?)\s*</name>", 1)
    )
    value = lambda p: xml_unescape(  # noqa: E731
        F.regexp_extract(p, r"(?s)<value>\s*(.*?)\s*</value>", 1)
    )
    return F.map_from_arrays(
        F.transform(props, name), F.transform(props, value)
    )


def parse_conf_documents(docs: DataFrame, path_col: str = "path", xml_col: str = "xml") -> DataFrame:
    """P6 — (path, xml text) → JobConf rows
    ``(path, jobId, configuration)`` (JobConf.avsc:17-38); jobId comes
    from the filename like ParseJobConfs.java:199-204."""
    return docs.select(
        F.col(path_col).alias("path"),
        F.regexp_extract(F.col(path_col), JOB_ID_RE, 1).alias("jobId"),
        conf_map(F.col(xml_col)).alias("configuration"),
    ).filter(F.col("jobId") != "")


def read_conf_files(spark: SparkSession, glob: str) -> DataFrame:
    """S2 — whole-file scan: one record per conf XML file, decoded to
    text. Small files are packed into tasks by the file source."""
    raw = spark.read.format("binaryFile").load(glob)
    return parse_conf_documents(
        raw.select("path", F.decode(F.col("content"), "UTF-8").alias("xml"))
    )


def join_jobs_confs(jobs: DataFrame, confs: DataFrame, how: str = "left") -> DataFrame:
    """J8 — jobs ⋈ confs on jobId. The conf side is tiny after
    projection (one row per job, a handful of selected keys), so it is
    broadcast: no shuffle of the big jobs table."""
    return jobs.join(F.broadcast(confs), "jobId", how)
