"""Stage 1 — raw dataset ingest.

Rebuild of loadAndSaveRawData/loadData (utils/dataGenerator.py:844-941):
walk ``<raw>/{train|test}/<band>/imgset*``, read the LR frames (``LR*.png``),
their quality masks (``QM*.png``), and for training scenes the HR image
(``HR.png``) + status mask (``SM.png``), stack each scene to
``[numFrames, C, H, W]``, and dump one object array per artifact into
``arrayDir`` under the reference's exact file names.

Scenes have ragged frame counts (9-19 LR frames), so the per-band stacks are
numpy object arrays of per-scene ``[T_i, C, H, W]`` arrays — identical to
what the reference pickles.
"""

from __future__ import annotations

import glob
import os
from typing import List, Tuple

import numpy as np

from probav_tpu.utils.io import read_png, dump_masked, load_npy


def _scene_stack(dir_name: str, pattern: str, grayscale: bool) -> np.ndarray:
    files = sorted(glob.glob(os.path.join(dir_name, pattern)))
    frames = []
    for f in files:
        img = read_png(f)
        frames.append(img[None] if grayscale else img.transpose(2, 0, 1))
    return np.array(frames)


def _object_array(scenes: List[np.ndarray]) -> np.ndarray:
    """Stack scenes; ragged frame counts produce an object array."""
    try:
        return np.array(scenes)
    except ValueError:
        out = np.empty(len(scenes), dtype=object)
        for i, s in enumerate(scenes):
            out[i] = s
        return out


def load_and_save_raw_data(raw_data_dir: str, array_dir: str, band: str,
                           is_grayscale: bool = True,
                           is_train_data: bool = True,
                           progress: bool = False) -> None:
    """Ingest one band of one split and dump the big arrays."""
    os.makedirs(array_dir, exist_ok=True)
    key = "TRAIN" if is_train_data else "TEST"
    split_dir = os.path.join(raw_data_dir, key.lower(), band)
    dir_list = sorted(glob.glob(os.path.join(split_dir, "imgset*")))
    if not dir_list:
        raise FileNotFoundError(f"no imgset* under {split_dir}")
    it = dir_list
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(dir_list, desc=f"[ INFO ] Ingesting {key} {band}")
        except Exception:
            pass

    img_lr, msk_lr, img_hr, msk_hr = [], [], [], []
    for d in it:
        img_lr.append(_scene_stack(d, "LR*.png", is_grayscale))
        msk_lr.append(_scene_stack(d, "QM*.png", is_grayscale))
        if is_train_data:
            img_hr.append(read_png(os.path.join(d, "HR.png"))[None]
                          if is_grayscale else
                          read_png(os.path.join(d, "HR.png")).transpose(2, 0, 1))
            msk_hr.append(read_png(os.path.join(d, "SM.png"))[None]
                          if is_grayscale else
                          read_png(os.path.join(d, "SM.png")).transpose(2, 0, 1))

    dump_masked(_object_array(img_lr), os.path.join(array_dir, f"{key}imgLR_{band}.npy"))
    dump_masked(_object_array(msk_lr), os.path.join(array_dir, f"{key}mskLR_{band}.npy"))
    if is_train_data:
        # HR arrays get an explicit frame axis of 1: [numImgSet, 1, C, H, W].
        dump_masked(np.expand_dims(np.array(img_hr), 1),
                    os.path.join(array_dir, f"{key}imgHR_{band}.npy"))
        dump_masked(np.expand_dims(np.array(msk_hr), 1),
                    os.path.join(array_dir, f"{key}mskHR_{band}.npy"))


def load_data(array_dir: str, band: str) -> Tuple[tuple, tuple]:
    """Reload stage-1 artifacts (dataGenerator.py:844-871)."""
    if not os.path.exists(array_dir):
        raise FileNotFoundError(array_dir)
    g = lambda n: load_npy(os.path.join(array_dir, f"{n}_{band}.npy"))
    train = (g("TRAINimgLR"), g("TRAINmskLR"), g("TRAINimgHR"), g("TRAINmskHR"))
    test = (g("TESTimgLR"), g("TESTmskLR"))
    return train, test
