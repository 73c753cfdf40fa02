"""CLI linking mode: --catalogue/--synthetic-catalogue switches the
entry point to the two-table retrieve->rerank->assign product."""

import json

from blink_spark import cli


def test_cli_linking_mode(spark, tmp_path, capsys):
    rc = cli.main([
        "--synthetic-entities", "60",
        "--synthetic-catalogue",
        "--eval-gold",
        "--output", str(tmp_path / "link_out"),
        "--cores", "8",
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["mode"] == "link"
    assert out["linking"]["accuracy"] >= 0.98
    assert out["n_linked"] == out["n_mentions"]
    # link_pred stage table persisted for resume/inspection
    import os

    assert os.path.exists(
        str(tmp_path / "link_out" / "link_stages" / "link_pred" / "_SUCCESS")
    )


def test_cli_linking_undirected(spark, tmp_path, capsys):
    rc = cli.main([
        "--synthetic-entities", "40",
        "--synthetic-catalogue",
        "--eval-gold",
        "--graph-mode", "undirected",
        "--output", str(tmp_path / "link_out_u"),
        "--cores", "8",
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["graph_mode"] == "undirected"
    assert out["linking"]["accuracy"] >= 0.98


def test_cli_discovery_mode(spark, tmp_path, capsys):
    """--discover-drop runs the G9 experiment end-to-end: sweep rows,
    best config excludes threshold 0, decent NMI/ARI on the synthetic
    corpus with 20% of the catalogue dropped."""
    rc = cli.main([
        "--synthetic-entities", "40",
        "--synthetic-catalogue",
        "--eval-gold",
        "--discover-drop", "0.2",
        "--n-thresholds", "3",
        "--output", str(tmp_path / "disc_out"),
        "--cores", "8",
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["mode"] == "discover" and out["drop_all"] is False
    assert len(out["sweep"]) >= 3
    assert out["best"]["threshold"] != 0.0
    assert out["best"]["average"] >= 0.7, out["best"]
