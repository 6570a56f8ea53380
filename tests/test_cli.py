"""Process-level smoke tests for the four CLI entry points.

The reference's product surface is its CLIs (README.md:119-191): every
workflow is ``python3 <tool>.py --cfg ... --band ...``.  These tests run
the real scripts as subprocesses over a miniature synthetic raw tree and
assert exit codes and the artifact contract — argparse plumbing, the
``--ckpt`` stage override, ``--band BOTH``, ``--tta``, the fused-tier
alignment warning, and the missing-artifact error paths, none of which
in-process unit tests exercise.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from synthetic_data import make_raw_tree, write_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMEOUT = 900


def run_cli(script, *args, cwd, cache, check=True):
    """Run a repo CLI as a real subprocess on host CPU."""
    env = dict(os.environ)
    env["MPLBACKEND"] = "Agg"
    env["PROBAV_COMPILE_CACHE"] = cache     # share compiles across tests
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args, "--cpu"],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=TIMEOUT)
    if check and proc.returncode != 0:
        raise AssertionError(
            f"{script} {' '.join(args)} exited {proc.returncode}\n"
            f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}")
    return proc


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    """Workspace with a 3+2-scene two-band raw tree, preprocessed through
    the REAL data_generator.py subprocess for both bands."""
    root = tmp_path_factory.mktemp("cli_ws")
    raw = make_raw_tree(str(root / "raw"), bands=("NIR", "RED"),
                        train_scenes=3, test_scenes=2, frames=5, seed=11)
    cfg = write_cfg(str(root / "synth.cfg"), raw=raw,
                    out=str(root / "out"),
                    model_out=str(root / "out" / "modelInfo"),
                    train_out=str(root / "out" / "trainout"),
                    test_out=str(root / "out" / "testout"))
    cache = str(root / "xla_cache")
    for band in ("NIR", "RED"):
        run_cli("data_generator.py", "--cfg", cfg, "--band", band,
                cwd=str(root), cache=cache)
    return {"root": root, "cfg": cfg, "cache": cache,
            "out": root / "out"}


@pytest.fixture(scope="module")
def trained(ws):
    """train.py --band BOTH over the workspace (the reference's per-band
    recipe collapsed into the one-flag loop)."""
    proc = run_cli("train.py", "--cfg", ws["cfg"], "--band", "BOTH",
                   cwd=str(ws["root"]), cache=ws["cache"])
    return proc


class TestDataGeneratorCLI:
    def test_stage_artifacts_written(self, ws):
        out = ws["out"]
        for band in ("NIR", "RED"):
            for name in (f"TRAINpatchesLR_{band}.npy",
                         f"TRAINpatchesHR_{band}.npy",
                         f"TRAINVALpatchesLR_{band}.npy",
                         f"TRAINVALpatchesHR_{band}.npy"):
                assert (out / "augmentedPatchesDir" / name).exists(), name
            assert (out / "resolverDir" / f"TESTpatchesLR_{band}.npy").exists()
            assert (out / "resolverDir" / f"TRAINimgHR_{band}.npy").exists()

    def test_ckpt_override_reruns_only_selected_stages(self, ws):
        """--ckpt 2,3 must rerun stages 2-3 and leave stage-4/5 artifacts
        untouched (the reference's resumable-checkpoint contract)."""
        out = ws["out"]
        stage2 = out / "trimmedArrayDir" / "TRAINimgLR_NIR.npy"
        stage5 = out / "augmentedPatchesDir" / "TRAINpatchesLR_NIR.npy"
        before2, before5 = stage2.stat().st_mtime, stage5.stat().st_mtime
        run_cli("data_generator.py", "--cfg", ws["cfg"], "--band", "NIR",
                "--ckpt", "2,3", cwd=str(ws["root"]), cache=ws["cache"])
        assert stage2.stat().st_mtime > before2      # stage 2 ran
        assert stage5.stat().st_mtime == before5     # stage 5 did not


class TestTrainCLI:
    def test_band_both_trains_both_bands(self, ws, trained):
        assert "SUCCESS" in trained.stderr + trained.stdout
        from probav_tpu.config import Config
        cfg = Config.from_file(ws["cfg"])
        for band in ("NIR", "RED"):
            ckpts = os.listdir(cfg.ckpt_dir(band))
            assert ckpts, f"no checkpoint written for {band}"

    def test_fused_misaligned_batch_warns_and_falls_back(self, ws, trained):
        """batch 4 != 128: the fused tier must compile the plain stack and
        say so loudly (models/wdsr.py fallback warning)."""
        root = ws["root"]
        from probav_tpu.config import Config
        cfg2 = write_cfg(str(root / "fused.cfg"),
                         raw=str(root / "raw"), out=str(ws["out"]),
                         model_out=str(root / "fused_modelinfo"),
                         train_out=str(ws["out"] / "trainout"),
                         test_out=str(ws["out"] / "testout"))
        proc = run_cli("train.py", "--cfg", cfg2, "--band", "NIR",
                       "--fused-stack", "t",
                       cwd=str(root), cache=ws["cache"])
        assert "falls back to the plain XLA stack" in proc.stderr
        assert os.listdir(Config.from_file(cfg2).ckpt_dir("NIR"))

    def test_missing_stage5_artifacts_fail_loudly(self, ws, tmp_path):
        cfg = write_cfg(str(tmp_path / "empty.cfg"),
                        raw=str(tmp_path / "raw"), out=str(tmp_path / "out"),
                        model_out=str(tmp_path / "mi"),
                        train_out=str(tmp_path / "tr"),
                        test_out=str(tmp_path / "te"))
        proc = run_cli("train.py", "--cfg", cfg, "--band", "NIR",
                       cwd=str(tmp_path), cache=ws["cache"], check=False)
        assert proc.returncode != 0
        assert "TRAINpatchesLR_NIR.npy" in proc.stderr


class TestTestCLI:
    def test_submission_numbering_and_dtype(self, ws, trained):
        """TEST/NIR numbering starts at 1306 (reference test.py:79-90)."""
        from probav_tpu.config import Config
        from probav_tpu.utils.io import read_png
        run_cli("test.py", "--cfg", ws["cfg"], "--band", "NIR",
                "--totest", "TEST", cwd=str(ws["root"]), cache=ws["cache"])
        out = Config.from_file(ws["cfg"]).out_dir("TEST")
        names = sorted(os.listdir(out))
        assert names == ["imgset1306.png", "imgset1307.png"]
        img = read_png(os.path.join(out, names[0]))
        assert img.dtype == np.uint16 and img.shape == (96, 96)

    def test_train_split_outputs_for_both_bands(self, ws, trained):
        """TRAIN numbering: RED from 0, NIR from 594 — the layout
        evaluate.py consumes."""
        from probav_tpu.config import Config
        for band in ("RED", "NIR"):
            run_cli("test.py", "--cfg", ws["cfg"], "--band", band,
                    "--totest", "TRAIN",
                    cwd=str(ws["root"]), cache=ws["cache"])
        out = Config.from_file(ws["cfg"]).out_dir("TRAIN")
        assert sorted(os.listdir(out)) == [
            "imgset0000.png", "imgset0001.png", "imgset0002.png",
            "imgset0594.png", "imgset0595.png", "imgset0596.png"]

    def test_tta_flag(self, ws, trained):
        proc = run_cli("test.py", "--cfg", ws["cfg"], "--band", "NIR",
                       "--totest", "TEST", "--tta",
                       cwd=str(ws["root"]), cache=ws["cache"])
        assert "Wrote 2 scenes" in proc.stderr + proc.stdout

    def test_missing_checkpoint_fails_loudly(self, ws, tmp_path):
        cfg = write_cfg(str(tmp_path / "nock.cfg"),
                        raw=str(ws["root"] / "raw"), out=str(ws["out"]),
                        model_out=str(tmp_path / "empty_modelinfo"),
                        train_out=str(tmp_path / "tr"),
                        test_out=str(tmp_path / "te"))
        proc = run_cli("test.py", "--cfg", cfg, "--band", "NIR",
                       "--totest", "TEST",
                       cwd=str(tmp_path), cache=ws["cache"], check=False)
        assert proc.returncode != 0
        assert "no checkpoint" in proc.stderr


class TestEvaluateCLI:
    def test_scatter_and_normalized_score(self, ws, trained, tmp_path):
        """Full evaluate.py over real TRAIN outputs: per-band means, the
        scatter artifact, and the norm.csv leaderboard score with the
        per-band offset numbering."""
        from probav_tpu.config import Config
        out_dir = Config.from_file(ws["cfg"]).out_dir("TRAIN")
        if not os.path.exists(out_dir):   # ordering safety: make outputs
            for band in ("RED", "NIR"):
                run_cli("test.py", "--cfg", ws["cfg"], "--band", band,
                        "--totest", "TRAIN",
                        cwd=str(ws["root"]), cache=ws["cache"])
        norm_csv = tmp_path / "norm.csv"
        with open(norm_csv, "w") as f:
            f.write("scene,norm\n")
            for i in (0, 1, 2, 594, 595, 596):
                f.write(f"imgset{i:04d},45.0\n")
        png = tmp_path / "comparison.png"
        proc = run_cli("evaluate.py", "--cfg", ws["cfg"],
                       "--toCompare", out_dir, "--benchmark", out_dir,
                       "--red-count", "3", "--bands", "RED,NIR",
                       "--norm-csv", str(norm_csv), "--out", str(png),
                       cwd=str(ws["root"]), cache=ws["cache"])
        text = proc.stderr + proc.stdout
        assert "benchmark mean cPSNR" in text
        assert "normalized (lower is better):" in text
        assert png.exists() and png.stat().st_size > 0
