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


def test_profile_subcommand(spark, capsys):
    assert main(["profile", "events", "--sf-dir", SF, "--columns", "event_id,value"]) == 0
    out = capsys.readouterr().out
    assert "event_id" in out and "value" in out and "approx_distinct" in out
    assert main(["profile", "nope", "--sf-dir", SF]) == 2


def test_api_usage_and_table(spark, capsys):
    assert main(["api", "usage", "--sf-dir", SF, "--unit", "DAYS", "--zone", "UTC"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["cluster"] == "alpha"
    assert res["times"] and res["users"]
    assert all(len(u["data"]) == len(res["times"]) for u in res["users"])

    assert main(["api", "table", "--sf-dir", SF, "--unit", "WEEKS", "--users", "u1,u2"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "time,u1,u2"
    assert len(out) > 1 and all(len(line.split(",")) == 3 for line in out[1:])


def test_cli_upload(tmp_path, capsys):
    import os
    import time

    from white_elephant_spark.__main__ import main

    old = tmp_path / "logs" / "job_1_2.log"
    os.makedirs(old.parent)
    old.write_text("LOG")
    two_days = time.time() - 2 * 86400
    os.utime(old, (two_days, two_days))
    rc = main(
        [
            "upload",
            str(tmp_path / "logs"),
            f"file://{tmp_path}/wh",
            "--grid",
            "gridZ",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "1 uploaded, 0 already present" in out
    assert "/gridZ/daily/unknown/" in out
    # idempotent re-run
    rc = main(["upload", str(tmp_path / "logs"), f"file://{tmp_path}/wh", "--grid", "gridZ"])
    assert "0 uploaded, 1 already present" in capsys.readouterr().out
