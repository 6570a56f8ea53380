"""Full-scene inference + ESA submission writer.

Rebuild of the reference test path (test.py:34-160):

- ``Resolver`` jits the model once over a whole scene's patch grid (all 64
  22x22 patches in ONE device call — the reference chunked into batches of
  16 on GPU, test.py:125-134; a TPU chip eats the full grid), clips to the
  16-bit range, rounds, and pastes the 48x48 tiles row-major into the
  384x384 scene.  Optional test-time augmentation averages predictions over
  random temporal permutations (resolveBySampleAveraging, test.py:137-146).

- ``write_submission`` reproduces the submission numbering contract
  bit-for-bit: scene ids start at the band/split offset (test.py:79-90),
  ids listed in ``removedTrainSets<band>.txt`` are skipped, and images are
  written as uint16 ``imgset%04d.png``.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from probav_tpu.config import BAND_OFFSETS
from probav_tpu.ops.patches import reconstruct_from_patches
from probav_tpu.utils.io import write_png


def load_removed_sets(band: str, search_dirs=(".",)) -> List[int]:
    """Scene ids to skip when numbering outputs (test.py:71-77).

    Searches each directory in order for ``removedTrainSets<BAND>.txt`` and
    returns the first hit.  The pipeline writes the file under
    ``cfg.preprocessing_out`` (Config.removed_sets_path); keep ``"."`` in
    the list for trees produced by the reference, which writes it
    CWD-relative.
    """
    if isinstance(search_dirs, str):
        search_dirs = (search_dirs,)
    for d in search_dirs:
        path = os.path.join(d, f"removedTrainSets{band.upper()}.txt")
        if os.path.exists(path):
            with open(path) as f:
                return [int(float(line.strip()))
                        for line in f if line.strip()]
    return []


class Resolver:
    """Scene-at-a-time super-resolution with a jitted full-grid forward.

    Pass a ``mesh`` (probav_tpu.parallel.make_mesh) to shard each scene's
    patch grid over the 'data' axis — multi-chip serving where every chip
    resolves a slice of the 8x8 grid (the grid size must divide by the data
    axis; 64 patches over 2/4/8 chips all work).
    """

    def __init__(self, model, params, scene_size: int = 384,
                 bit_depth: int = 16, mesh=None):
        self.model = model
        self.params = params
        self.scene_size = scene_size
        self.clip_max = float(2 ** bit_depth)   # test.py:118 clips to 2**16

        def _resolve_fn(params, patches):
            pred = model.apply({"params": params}, patches.astype(jnp.float32))
            return jnp.round(jnp.clip(pred, 0.0, self.clip_max))

        if mesh is None:
            self._resolve = jax.jit(_resolve_fn)
        else:
            from probav_tpu.parallel import (batch_sharding,
                                             replicated_sharding)
            self._resolve = jax.jit(
                _resolve_fn,
                in_shardings=(replicated_sharding(mesh),
                              batch_sharding(mesh)),
                out_shardings=batch_sharding(mesh))

        @jax.jit
        def _resolve_mean(params, patches_stack):
            # patches_stack: [R, P, h, w, T, C] -> mean over R repeats.
            preds = jax.vmap(lambda p: model.apply(
                {"params": params}, p.astype(jnp.float32)))(patches_stack)
            preds = jnp.round(jnp.clip(preds, 0.0, self.clip_max))
            return jnp.mean(preds, axis=0)

        self._resolve_mean = _resolve_mean

    def resolve_scene(self, patches: np.ndarray) -> np.ndarray:
        """[P, h, w, T, C] patches -> [scene, scene, 1] uint-valued float."""
        sr = self._resolve(self.params, jnp.asarray(patches))
        return np.asarray(reconstruct_from_patches(sr, self.scene_size))

    def resolve_scene_tta(self, patches: np.ndarray, repeats: int = 20,
                          seed: int = 0) -> np.ndarray:
        """Temporal-permutation TTA (test.py:137-146), one device call."""
        rng = np.random.default_rng(seed)
        t = patches.shape[3]
        stack = np.stack([patches[:, :, :, rng.permutation(t), :]
                          for _ in range(repeats)])
        sr = self._resolve_mean(self.params, jnp.asarray(stack))
        return np.asarray(reconstruct_from_patches(sr, self.scene_size))

    def resolve_all(self, all_patches, progress: bool = True,
                    tta: bool = False) -> List[np.ndarray]:
        """[S, P, h, w, T, C] -> list of S scenes (test.py:103-111)."""
        scenes = range(len(all_patches))
        if progress:
            try:
                from tqdm import tqdm
                scenes = tqdm(scenes, desc="[ INFO ] Resolving scenes")
            except Exception:
                pass
        fn = self.resolve_scene_tta if tta else self.resolve_scene
        return [fn(np.asarray(all_patches[i], dtype=np.float32))
                for i in scenes]


def write_submission(scenes: Sequence[np.ndarray], out_dir: str, band: str,
                     totest: str = "TEST",
                     removed: Optional[Iterable[int]] = None,
                     start_id: Optional[int] = None) -> List[str]:
    """Write uint16 submission PNGs with reference numbering (test.py:92-100)."""
    os.makedirs(out_dir, exist_ok=True)
    skip = set(removed if removed is not None else
               load_removed_sets(band))
    i = start_id if start_id is not None else \
        BAND_OFFSETS[(totest.upper(), band.upper())]
    written = []
    for scene in scenes:
        while i in skip:
            i += 1
        path = os.path.join(out_dir, f"imgset{i:04d}.png")
        write_png(path, scene[:, :, 0])
        written.append(path)
        i += 1
    return written
