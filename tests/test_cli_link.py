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
