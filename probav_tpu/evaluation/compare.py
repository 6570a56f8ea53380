"""Model-vs-model evaluation: per-scene cPSNR comparison and ESA scoring.

Rebuild of reference evaluate.py: load the ground-truth HR scenes saved by
pipeline stage 2 (``resolverDir/TRAINimgHR_<band>.npy``), score two
directories of predicted scenes (benchmark vs candidate) with the
shift-compensated cPSNR, and scatter-plot them per band (evaluate.py:28-73).

Also carries the legacy ESA normalization (utils/utils.py:425-435): with the
competition's ``norm.csv`` (per-scene bicubic-baseline cPSNR), the
leaderboard score is mean(norm_i / cPSNR_i) — lower is better.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from probav_tpu.ops.shift_loss import ShiftCompensatedLosses
from probav_tpu.utils.io import read_png, load_npy


def load_hr_scenes(preprocessing_out: str,
                   bands: Sequence[str] = ("RED", "NIR")) -> np.ma.masked_array:
    """Concatenate per-band HR ground truth (evaluate.py:106-116).

    -> masked [S, H, W, 1] float32, RED scenes first.
    """
    parts = []
    for band in bands:
        path = os.path.join(preprocessing_out, "resolverDir",
                            f"TRAINimgHR_{band}.npy")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — run pipeline stage 2 for band {band}, "
                f"or restrict the band list (CLI: --bands)")
        parts.append(load_npy(path))
    allimg = np.ma.concatenate(parts)
    allimg = allimg.squeeze(1)                     # [S, C, H, W]
    return allimg.astype(np.float32).transpose(0, 2, 3, 1)


def load_scene_dir(path: str, limit: Optional[int] = None) -> np.ndarray:
    """Sorted PNG dir -> [S, H, W, 1] float32 (evaluate.py:90-103)."""
    names = sorted(os.listdir(path))
    if limit is not None:
        names = names[:limit]
    imgs = [read_png(os.path.join(path, n))[..., None].astype(np.float32)
            for n in names]
    return np.stack(imgs)


def _scene_ids(path: str) -> Optional[list]:
    """Scene ids parsed from imgsetNNNN.png names; None if nonconforming."""
    import re
    ids = []
    for n in sorted(os.listdir(path)):
        m = re.fullmatch(r"imgset(\d+)\.png", n)
        if not m:
            return None
        ids.append(int(m.group(1)))
    return ids


def per_scene_cpsnr(hr: np.ma.masked_array, pred: np.ndarray,
                    batch: int = 16) -> np.ndarray:
    """Shift-compensated cPSNR per scene; hr is masked [S,H,W,1]."""
    size = hr.shape[1]
    losses = ShiftCompensatedLosses(target_shape=(size, size, 1),
                                    use_pallas=False)
    import jax
    fn = jax.jit(losses.cpsnr)
    out = []
    mask = (~np.ma.getmaskarray(hr)).astype(np.float32)
    data = np.asarray(hr, dtype=np.float32)
    for s in range(0, len(hr), batch):
        out.append(np.asarray(fn(data[s:s + batch], mask[s:s + batch],
                                 pred[s:s + batch])))
    return np.concatenate(out)


def compare_runs(preprocessing_out: str, benchmark_dir: str,
                 candidate_dir: str, red_count: int = 594,
                 bands: Sequence[str] = ("RED", "NIR")
                 ) -> Dict[str, Dict[str, np.ndarray]]:
    """Score two output dirs against ground truth, split by band.

    Returns {'RED': {'benchmark': [...], 'candidate': [...]}, 'NIR': ...}.
    The first ``red_count`` sorted scenes are RED, the rest NIR — the
    reference's train-set layout (evaluate.py:37-46, test.py:79-90).
    """
    hr = load_hr_scenes(preprocessing_out, bands=bands)
    bench = load_scene_dir(benchmark_dir, limit=len(hr))
    cand = load_scene_dir(candidate_dir, limit=len(hr))

    # Align predictions to ground truth BY SCENE ID when the directory uses
    # the submission naming: the HR array contains every scene (saved
    # pre-trim, pipeline stage 2) while predictions skip removed ids, so
    # positional pairing — the reference's behavior (evaluate.py:90-103) —
    # silently mis-scores everything after the first removed scene.
    ids = _scene_ids(benchmark_dir)
    counts = {}
    for band in bands:
        arr = load_npy(os.path.join(preprocessing_out, "resolverDir",
                                    f"TRAINimgHR_{band}.npy"))
        counts[band] = len(arr)
    if tuple(bands) == ("RED", "NIR") and red_count < counts["RED"]:
        # hr is the concatenation of the FULL per-band files; when the
        # caller caps RED below the file's scene count, drop the excess
        # RED rows from hr too — otherwise the NIR base offset (id path)
        # and the NIR slice (positional path) would index into RED rows.
        full_red = counts["RED"]
        keep = np.concatenate([np.arange(red_count),
                               np.arange(full_red, len(hr))])
        hr = hr[keep]
        counts["RED"] = red_count

    hr_rows: list = []
    band_of: list = []
    if (ids is not None and ids == _scene_ids(candidate_dir)
            and len(ids) == len(bench) == len(cand)):
        from probav_tpu.config import BAND_OFFSETS
        base = 0
        for band in bands:
            off = BAND_OFFSETS[("TRAIN", band)]
            for k, sid in enumerate(ids):
                if off <= sid < off + counts[band]:
                    hr_rows.append(base + sid - off)
                    band_of.append((band, k))
            base += counts[band]
    if hr_rows:   # ids resolved to band scene ranges — align by id
        hr = hr[np.asarray(hr_rows, dtype=np.int64)]
        keep = np.asarray([k for _, k in band_of])
        bench, cand = bench[keep], cand[keep]
        spans = {}
        for i, (band, _) in enumerate(band_of):
            spans.setdefault(band, [i, i])[1] = i
        band_slices = [(band, slice(lo, hi + 1))
                       for band, (lo, hi) in spans.items()]
    else:
        # Positional pairing (the reference's behavior) for nonconforming
        # file names: trim all three stacks to the common length.
        n = min(len(hr), len(bench), len(cand))
        hr, bench, cand = hr[:n], bench[:n], cand[:n]
        band_slices = []
        start = 0
        for band in bands:
            band_slices.append((band, slice(start, start + counts[band])))
            start += counts[band]

    out = {}
    for band, sl in band_slices:
        h = hr[sl]
        if len(h) == 0:
            continue
        out[band] = {
            "benchmark": per_scene_cpsnr(h, bench[sl]),
            "candidate": per_scene_cpsnr(h, cand[sl]),
        }
    return out


def scatter_plot(results: Dict[str, Dict[str, np.ndarray]],
                 out_path: str = "comparison.png") -> str:
    """Benchmark-vs-candidate scatter, one panel per band (evaluate.py:57-73)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    bands = list(results)
    fig, axs = plt.subplots(1, max(2, len(bands)), figsize=(10, 5))
    colors = {"RED": "#cc0e74", "NIR": "#916dd5"}
    for ax, band in zip(np.atleast_1d(axs), bands):
        r = results[band]
        ax.scatter(r["benchmark"], r["candidate"], edgecolors="k",
                   alpha=0.6, color=colors.get(band, "#444444"), label=band)
        ax.set_title(f"{band} scenes")
        ax.grid(True)
        ax.set_xlim([20, 70])
        ax.set_ylim([20, 70])
        ax.plot([20, 70], [20, 70], "#08ffc8", zorder=1)
        ax.set_xlabel("cPSNR(dB) Benchmark")
        ax.set_ylabel("cPSNR(dB) Candidate")
    fig.tight_layout()
    fig.savefig(out_path, dpi=300)
    plt.close(fig)
    return out_path


def load_norm_csv(path: str) -> Dict[str, float]:
    """ESA norm.csv: per-scene baseline cPSNR (utils/utils.py:425-435)."""
    import csv
    out = {}
    with open(path) as f:
        for row in csv.reader(f):
            if len(row) >= 2:
                try:
                    out[row[0].strip()] = float(row[1])
                except ValueError:
                    continue   # header
    return out


def normalized_score(cpsnr_by_scene: Dict[str, float],
                     norms: Dict[str, float]) -> float:
    """ESA leaderboard score: mean(norm_i / cPSNR_i); lower is better."""
    vals = [norms[k] / v for k, v in cpsnr_by_scene.items() if k in norms]
    if not vals:
        raise ValueError("no overlapping scene ids between scores and norms")
    return float(np.mean(vals))
