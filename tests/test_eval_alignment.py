"""Scene-id alignment in compare_runs when scenes were removed.

The reference pairs sorted prediction files with the HR array by POSITION
(evaluate.py:90-103), silently mis-scoring everything after the first
removed scene id; compare_runs aligns by the imgsetNNNN id instead.
"""

import os

import numpy as np
import pytest

from probav_tpu.evaluation import compare_runs
from probav_tpu.utils.io import write_png, dump_masked


@pytest.fixture()
def workspace(tmp_path, rng):
    # 4 NIR HR scenes (ids 594..597); scene 595 was "removed" -> predictions
    # exist for ids 594, 596, 597 only.
    scenes = rng.uniform(0, 60000, (4, 1, 1, 32, 32)).astype(np.float64)
    hr = np.ma.masked_array(scenes, mask=np.zeros_like(scenes, bool))
    resolver = tmp_path / "chkpt" / "resolverDir"
    os.makedirs(resolver)
    dump_masked(hr, str(resolver / "TRAINimgHR_NIR.npy"))

    pred = tmp_path / "pred"
    os.makedirs(pred)
    for sid, scene_idx in ((594, 0), (596, 2), (597, 3)):
        write_png(str(pred / f"imgset{sid:04d}.png"),
                  scenes[scene_idx, 0, 0])
    return tmp_path, pred


def test_alignment_skips_removed_scene(workspace):
    tmp_path, pred = workspace
    results = compare_runs(str(tmp_path / "chkpt"), str(pred), str(pred),
                           red_count=0, bands=("NIR",))
    psnr = results["NIR"]["candidate"]
    # Predictions equal their own HR scenes -> near-perfect cPSNR for ALL
    # three, including the two after the removed id.  Positional pairing
    # would score imgset0596 against scene index 1 (the removed one) and
    # fail badly.
    assert len(psnr) == 3
    assert (psnr > 80).all(), psnr


def test_red_count_cap_does_not_shift_nir_rows(tmp_path, rng):
    # With red_count below the RED file's scene count, the excess RED HR
    # rows must be dropped before concatenation — otherwise NIR's base
    # offset / band slice silently indexes into RED rows.
    red = rng.uniform(0, 60000, (3, 1, 1, 16, 16)).astype(np.float64)
    nir = rng.uniform(0, 60000, (2, 1, 1, 16, 16)).astype(np.float64)
    resolver = tmp_path / "chkpt" / "resolverDir"
    os.makedirs(resolver)
    dump_masked(np.ma.masked_array(red, mask=np.zeros_like(red, bool)),
                str(resolver / "TRAINimgHR_RED.npy"))
    dump_masked(np.ma.masked_array(nir, mask=np.zeros_like(nir, bool)),
                str(resolver / "TRAINimgHR_NIR.npy"))

    pred = tmp_path / "pred"
    os.makedirs(pred)
    # Predictions for RED ids 0,1 (id 2 capped away) and both NIR scenes.
    for sid, scene in ((0, red[0]), (1, red[1]),
                       (594, nir[0]), (595, nir[1])):
        write_png(str(pred / f"imgset{sid:04d}.png"), scene[0, 0])

    for variant in ("ids", "positional"):
        d = pred
        if variant == "positional":
            import shutil
            d = tmp_path / "alt"
            os.makedirs(d, exist_ok=True)
            for i, n in enumerate(sorted(os.listdir(pred))):
                shutil.copy(pred / n, d / f"scene_{i}.png")
        results = compare_runs(str(tmp_path / "chkpt"), str(d), str(d),
                               red_count=2, bands=("RED", "NIR"))
        for band in ("RED", "NIR"):
            psnr = results[band]["candidate"]
            assert len(psnr) == 2, (variant, band, psnr)
            # each prediction equals its own HR scene -> near-perfect
            assert (psnr > 80).all(), (variant, band, psnr)


def test_positional_fallback_without_id_names(workspace, tmp_path):
    # Non-conforming names fall back to the reference's positional pairing.
    tmp_path2, pred = workspace
    alt = tmp_path2 / "alt"
    os.makedirs(alt)
    import shutil
    for i, n in enumerate(sorted(os.listdir(pred))):
        shutil.copy(pred / n, alt / f"scene_{i}.png")
    results = compare_runs(str(tmp_path2 / "chkpt"), str(alt), str(alt),
                           red_count=0, bands=("NIR",))
    assert len(results["NIR"]["candidate"]) == 3
