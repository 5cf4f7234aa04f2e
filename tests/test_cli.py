"""CLI dispatch tests (mbta_etl_spark/cli.py): the registry surface —
`--registry list` enumerates every entry, a named entry renders against
--sf-dir, and an unknown name exits 1. The session factory is patched to
the shared test session (and stop() neutered) so the CLI's lifecycle
doesn't tear down the suite's SparkSession."""

from __future__ import annotations

from tests.conftest import SF_DIR_SMALL


def _patched_cli(spark, monkeypatch):
    from mbta_etl_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda name: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    return cli


def test_cli_registry_list_enumerates_all_entries(spark, monkeypatch, capsys):
    cli = _patched_cli(spark, monkeypatch)
    assert cli.main(["--registry", "list"]) == 0
    names = capsys.readouterr().out.split()
    from mbta_etl_spark.plans import registry

    assert set(names) == set(registry.queries())


def test_cli_registry_runs_named_entry(spark, monkeypatch, capsys):
    cli = _patched_cli(spark, monkeypatch)
    rc = cli.main(
        ["--registry", "q12_count", "--sf-dir", SF_DIR_SMALL]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "6000" in out  # lineitem rows at sf0.001


def test_cli_registry_unknown_entry_exits_1(spark, monkeypatch, capsys):
    cli = _patched_cli(spark, monkeypatch)
    assert cli.main(["--registry", "nope_not_real"]) == 1
    assert "unknown registry entry" in capsys.readouterr().err
