"""CLI probabilistic mode: --fs runs the Fellegi-Sunter dedup workflow
(SN blocking, EM-fitted gammas, posterior-thresholded CC) end-to-end."""

import json

from blink_spark import cli


def test_cli_fs_mode(spark, tmp_path, capsys):
    rc = cli.main([
        "--fs",
        "--synthetic-entities", "80",
        "--hot-family", "20",
        "--eval-gold",
        "--output", str(tmp_path / "fs_out"),
        "--cores", "8",
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["mode"] == "fs"
    assert out["n_records"] > 0
    # EM must land high-m / low-u unsupervised on the clone corpus
    assert all(v > 0.8 for v in out["em"]["m"].values()), out["em"]
    assert all(v < 0.3 for v in out["em"]["u"].values()), out["em"]
    # cheap-feature FS: near-perfect precision; recall bounded by the
    # heavily-mutated variants that only content-LSH can link
    assert out["pairwise"]["precision"] >= 0.95, out["pairwise"]
    assert out["pairwise"]["f1"] >= 0.8, out["pairwise"]
