"""Storage listing abstraction for incremental state (I1/I3).

The reference probes HDFS with ``FileSystem.exists`` to decide which
day directories still need building
(util/JobStatsProcessing.java:71-79) and globs storage for new/changed
files to load (server/app/usage_hadoop_loader.rb:100-107,
usage_loader.rb:83-163). Round 1 walked the *driver's local
filesystem* (``os.listdir``/``os.walk``) — fine for tests, wrong for a
cluster whose cube lives on HDFS/S3/GCS.

Two implementations of one small surface:

- :class:`LocalListing` — ``os`` calls; unit tests and single-node
  runs.
- :class:`HadoopFsListing` — the JVM Hadoop ``FileSystem`` API via the
  active SparkSession, so the same code paths resolve ``hdfs://``,
  ``s3a://``, ``gs://``, ``abfs://`` or ``file://`` URIs with the
  cluster's own credentials/committers. Listing is a driver-side
  metadata operation in both the reference and here; the *data* never
  flows through it.

Scale note: ``walk_files`` on object storage is one LIST call per
1000 keys (the S3A connector pages internally) — O(files) metadata,
no data reads. For multi-million-file inputs prefer the Structured
Streaming file-source checkpoint (streaming/cube_stream.py) which
amortizes discovery across runs; this interface covers the
reference-parity batch path.
"""

from __future__ import annotations

import os
from typing import Protocol


class Listing(Protocol):
    def list_subdirs(self, path: str) -> list[str]:
        """Names (not paths) of immediate subdirectories; [] if the
        path does not exist."""
        ...

    def walk_files(self, path: str, suffix: str) -> dict[str, float]:
        """All non-hidden files under ``path`` (recursive) whose name
        ends with ``suffix`` → modification time (epoch seconds).
        Hidden = basename starting with ``_`` or ``.``, applied to
        EVERY path segment below ``path``, not just the file name —
        the reference's HiddenFilePathFilter
        (StagedOutputJob.java:244-253) runs per directory level during
        Hadoop input listing, so a ``part-00000`` inside an in-flight
        ``_temporary/`` tree is excluded there and must be here."""
        ...


def _hidden(name: str) -> bool:
    return name.startswith(("_", "."))


class LocalListing:
    """Driver-local filesystem listing (tests, single-node)."""

    def list_subdirs(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return [n for n in os.listdir(path) if os.path.isdir(os.path.join(path, n))]

    def walk_files(self, path: str, suffix: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for root, dirs, files in os.walk(path):
            # Prune hidden directories from the walk itself — the
            # reference's filter runs per level, so files inside an
            # in-flight _temporary/ tree never surface.
            dirs[:] = [d for d in dirs if not _hidden(d)]
            for name in files:
                if _hidden(name) or not name.endswith(suffix):
                    continue
                p = os.path.join(root, name)
                out[p] = os.path.getmtime(p)
        return out


class HadoopFsListing:
    """Hadoop ``FileSystem``-backed listing — works against any URI
    scheme the cluster's Hadoop configuration can resolve (HDFS, S3A,
    GCS, ABFS, local). The reference's ``fs.exists`` probe
    (JobStatsProcessing.java:71-79), generalized."""

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _resolve(self, path: str):
        jpath = self._jvm.org.apache.hadoop.fs.Path(path)
        return jpath.getFileSystem(self._conf), jpath

    def list_subdirs(self, path: str) -> list[str]:
        fs, p = self._resolve(path)
        if not fs.exists(p):
            return []
        return [
            st.getPath().getName() for st in fs.listStatus(p) if st.isDirectory()
        ]

    def walk_files(self, path: str, suffix: str) -> dict[str, float]:
        fs, p = self._resolve(path)
        if not fs.exists(p):
            return {}
        # listFiles(recursive) keeps the object-store paged listing;
        # the per-level hidden rule is applied by checking every path
        # segment BELOW the root (the root itself may legitimately be
        # hidden-named), matching Hadoop's per-directory PathFilter.
        # Segments are derived STRUCTURALLY — getPath().getParent()
        # walked up to the listing root — never by string-prefix
        # slicing a URI: makeQualified(root) and listFiles output can
        # disagree on URI form (authority casing, trailing encoding)
        # on some filesystems, and a silent fallback to name-only
        # filtering would quietly ingest another writer's in-flight
        # _temporary/ output.
        root_depth = fs.makeQualified(p).depth()
        out: dict[str, float] = {}
        it = fs.listFiles(p, True)  # recursive; pages on object stores
        while it.hasNext():
            st = it.next()
            jp = st.getPath()
            full = str(jp)
            segs: list[str] = []
            node = jp
            while node is not None and node.depth() > root_depth:
                segs.append(node.getName())
                node = node.getParent()
            if any(_hidden(seg) for seg in segs):
                continue
            if not full.endswith(suffix):
                continue
            out[full] = st.getModificationTime() / 1000.0
        return out
