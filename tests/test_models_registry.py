"""Train-once/serve-many model registry (white_elephant_spark/models.py)."""

from __future__ import annotations

import os
import time

from white_elephant_spark import models

SF = "/root/testdata/sf0.001"


def test_memo_hits_and_key_separation(spark):
    calls = []

    def trainer(tag):
        def t():
            calls.append(tag)
            return {"model": tag}

        return t

    a = models.get_or_train(spark, SF, "embeddings", "m", (1,), trainer("a"))
    b = models.get_or_train(spark, SF, "embeddings", "m", (1,), trainer("a2"))
    assert a is b and calls == ["a"]  # hit serves the SAME artifact
    models.get_or_train(spark, SF, "embeddings", "m", (2,), trainer("p"))
    models.get_or_train(spark, SF, "embeddings", "other", (1,), trainer("n"))
    models.get_or_train(spark, SF, "documents", "m", (1,), trainer("t"))
    assert calls == ["a", "p", "n", "t"]  # params/name/table all key


def test_mtime_invalidation(spark, tmp_path):
    corpus = tmp_path / "tbl.parquet"
    corpus.write_text("v1")
    calls = []

    def trainer():
        calls.append(1)
        return object()

    models.get_or_train(spark, str(tmp_path), "tbl", "m", (), trainer)
    models.get_or_train(spark, str(tmp_path), "tbl", "m", (), trainer)
    assert len(calls) == 1
    # a rewritten corpus (new mtime) must retrain, not serve stale
    later = time.time() + 5
    os.utime(corpus, (later, later))
    models.get_or_train(spark, str(tmp_path), "tbl", "m", (), trainer)
    assert len(calls) == 2
