"""Turn-key acceptance harness over a synthetic ESA-layout tree.

tools/acceptance.py is the product's "point it at the real dataset"
entry (reference README.md:100-216 acceptance recipe: pipeline ->
train -> serve -> norm.csv-normalized score table).  The real ESA data
is unobtainable in this environment, so this test exercises the full
harness — tree discovery, cfg rewrite, all four CLI subprocess stages,
score-table emission — over a miniature synthetic tree with a norm.csv
at the dataset root, exactly where the Kelvins download ships it
(reference utils/utils.py:430-432).
"""

import json
import os
import subprocess
import sys

from synthetic_data import make_raw_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMEOUT = 1500


def test_acceptance_over_synthetic_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("accept_ws")
    raw = make_raw_tree(str(root / "raw"), bands=("NIR", "RED"),
                        train_scenes=3, test_scenes=2, frames=5, seed=23)
    with open(os.path.join(raw, "norm.csv"), "w") as f:
        f.write("scene,norm\n")
        for i in range(32):      # superset of the tree's ids; extras unused
            f.write(f"imgset{i:04d},45.0\n")

    # Tiny-net cfg: acceptance.py replaces its [Directories] lines, so the
    # paths here are throwaway placeholders.
    cfg = str(root / "base.cfg")
    from synthetic_data import write_cfg
    write_cfg(cfg, raw="PLACEHOLDER", out="PLACEHOLDER",
              model_out="PLACEHOLDER", train_out="PLACEHOLDER",
              test_out="PLACEHOLDER")

    ws = str(root / "ws")
    env = dict(os.environ)
    env["MPLBACKEND"] = "Agg"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "acceptance.py"),
         "--raw-tree", raw, "--workdir", ws, "--cfg", cfg,
         "--epochs", "1", "--fused", "off", "--cpu"],
        env=env, capture_output=True, text=True, timeout=TIMEOUT)
    assert proc.returncode == 0, (
        f"acceptance.py exited {proc.returncode}\n--- stdout ---\n"
        f"{proc.stdout}\n--- stderr ---\n{proc.stderr}")

    report = json.load(open(os.path.join(ws, "acceptance_report.json")))
    steps = report["steps"]
    for name in ("data_generator_NIR", "data_generator_RED", "train_BOTH",
                 "test_TEST_NIR", "test_TEST_RED", "test_TRAIN_NIR",
                 "test_TRAIN_RED", "evaluate"):
        assert steps[name]["exit"] == 0, name
    assert report["counts"] == {"train_RED": 3, "train_NIR": 3,
                                "test_RED": 2, "test_NIR": 2}

    score = json.load(open(os.path.join(ws, "score.json")))
    assert set(score["bands"]) == {"RED", "NIR"}
    for r in score["bands"].values():
        assert r["scenes"] > 0 and r["candidate_mean_cpsnr"] > 0
    assert report["score"] == score
    assert score["normalized_score"] > 0
    assert "normalized ESA score" in proc.stdout

    # The epochs override landed in the rewritten cfg; everything else
    # from the base cfg survived verbatim.
    cfg_text = open(os.path.join(ws, "acceptance.cfg")).read()
    assert "epochs=1\n" in cfg_text
    assert "num_filters=4" in cfg_text
    assert f"raw_data={raw}" in cfg_text


def test_acceptance_rejects_empty_tree(tmp_path):
    raw = tmp_path / "raw"
    (raw / "train" / "RED").mkdir(parents=True)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "acceptance.py"),
         "--raw-tree", str(raw), "--workdir", str(tmp_path / "ws"),
         "--cpu"],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode != 0
    assert "missing scenes" in proc.stderr
