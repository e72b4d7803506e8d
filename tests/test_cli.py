"""CLI front door (python -m white_elephant_spark)."""

from __future__ import annotations

import json

from white_elephant_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def test_list_names_every_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    from white_elephant_spark.plans.registry import all_queries

    for name in all_queries():
        assert name in out


def test_oracle_prints_sql(capsys):
    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "lineitem" in capsys.readouterr().out


def test_unknown_query_is_an_error(capsys):
    assert main(["run", "no_such_query", "--sf-dir", SF]) == 2


def test_run_and_api_clusters(spark, capsys):
    # spark fixture keeps the session alive; the CLI's get_spark
    # getOrCreate()s into it.
    assert main(["run", "q1_pricing_summary", "--sf-dir", SF, "--limit", "3"]) == 0
    assert "sum_qty" in capsys.readouterr().out
    assert main(["api", "clusters", "--sf-dir", SF]) == 0
    assert json.loads(capsys.readouterr().out) == ["alpha", "beta"]
