"""End-to-end CLI smoke: the reference's console-script surface
(--deezy_mode train / inference / candidate_ranker) driven through
``python -m deezymatch_ray`` in subprocesses (each owns its Ray
session, mirroring real usage)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest


def _run(args: list[str], cwd: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    p = subprocess.run(
        [sys.executable, "-m", "deezymatch_ray", *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=420,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.slow
def test_cli_train_inference_rank_roundtrip(tmp_path):
    import pyarrow as pa

    from deezymatch_ray.data.synth import make_entity_names, make_labeled_pairs

    pairs = make_labeled_pairs(400, seed=6)
    tsv = tmp_path / "pairs.tsv"
    with open(tsv, "w") as fh:
        for s1, s2, y in zip(pairs["s1"].to_pylist(), pairs["s2"].to_pylist(),
                             pairs["label"].to_pylist()):
            fh.write(f"{s1}\t{s2}\t{str(bool(y)).lower()}\n")
    yml = tmp_path / "input_dfm.yaml"
    yml.write_text(
        "gru_lstm:\n  main_architecture: gru\n  rnn_hidden_dim: 16\n"
        "  embedding_dim: 16\n  epochs: 2\n"
        "preprocessing:\n  lowercase: true\n"
    )

    out = _run(["--deezy_mode", "train", "-i", str(tsv), "-m", "cli_m",
                "--models_dir", str(tmp_path / "models"), "-f", str(yml)],
               cwd=str(tmp_path))
    mdir = out["model_dir"]
    assert os.path.exists(os.path.join(mdir, "model.npz"))
    assert os.path.exists(os.path.join(mdir, "log.json"))

    out = _run(["--deezy_mode", "inference", "-m", mdir, "-i", str(tsv),
                "-o", str(tmp_path / "preds"), "-n", "50"], cwd=str(tmp_path))
    assert out["rows"] == 50  # cutoff applied

    names = make_entity_names(12, seed=2)
    qfile = tmp_path / "names.txt"
    qfile.write_text("\n".join(names) + "\n")
    out = _run(["--deezy_mode", "candidate_ranker", "-m", mdir,
                "--queries", str(qfile), "--candidates", str(qfile),
                "--selection_threshold", "1e9", "--num_candidates", "3",
                "-tn", "4", "-o", str(tmp_path / "ranked")], cwd=str(tmp_path))
    assert 0 < out["rows"] <= 4 * 3  # only the first 4 queries ranked
