"""Shift-compensated masked losses and the cPSNR competition metric.

TPU-native rebuild of the reference loss family (models/loss.py:8-238).  ESA
scores PROBA-V submissions with a "cPSNR": for every translation (i, j) of the
ground truth within a ±crop_border window, compute a brightness-bias-corrected
quality-mask-weighted MSE against the center crop of the prediction, and keep
the best shift.  The reference evaluates the 7x7=49 shifts with a Python loop
of TF graph ops; here the whole scan is one vectorized XLA computation (and a
fused Pallas kernel on TPU — see probav_tpu.ops.pallas_shift_loss).

Dispatch: the vectorized XLA path is the default and is NOT the step
bottleneck.  Committed measurement (round 2, tools/trace_groups.py on the
production 43 ms bf16 train step at batch 128): the entire loss + metric
subgraph — both 49-shift scans, forward and backward — accounts for
~0.8 ms/step (the [49,128] table fusions at 0.34, the 42x42 update-slice
stack at 0.20, abs/multiply reduces at 0.2).  A lane-aligned Pallas
rewrite could at best win back a fraction of 2% of the step, so the XLA
path stays the default by measurement, not by default.  The fused Pallas
kernel (ops/pallas_shift_loss.py) remains numerically verified but opt-in
(``use_pallas=True``): the current Mosaic toolchain lowers its unaligned
42x42 window reductions pathologically slowly.

Faithfulness notes (bit-level contracts preserved from loss.py):
- the ground truth enters the residual UNMASKED: occluded HR pixels contribute
  |HR| to the sum while the prediction is zeroed there (loss.py:226-228);
- the normalizer is the count of clear pixels, not the window size;
- losses take min over shifts then mean over batch; cPSNR takes max over
  shifts and returns the per-sample vector (the trainer averages it).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from probav_tpu.ops.sobel import sobel_edges


def _crop(x: jnp.ndarray, i: int, j: int, h: int, w: int) -> jnp.ndarray:
    """Reference cropImage (utils/utils.py:42-44): slice + cast to f32."""
    return x[:, i:i + h, j:j + w, :].astype(jnp.float32)


class ShiftCompensatedLosses:
    """All shift-compensated losses over [B, H, W, C] HR/mask/pred batches.

    Parameters mirror Losses.__init__ (loss.py:13-35): target_shape is the HR
    patch shape, crop_border the per-side shift allowance (max shift = 2*border),
    bit_depth sets the dynamic-range constant of cPSNR/SSIM.
    """

    def __init__(self, target_shape: Tuple[int, int, int] = (96, 96, 1),
                 crop_border: int = 3, bit_depth: int = 16,
                 use_pallas: bool = False):
        self.th, self.tw, self.tc = target_shape
        self.border = crop_border
        self.max_shift = 2 * crop_border
        self.num_bytes = float(2 ** bit_depth - 1)
        self.ch = self.th - self.max_shift   # crop height
        self.cw = self.tw - self.max_shift   # crop width
        self.pi = 0.7                        # SobelL1Mix blend (loss.py:21)
        # Multi-scale SSIM constants (loss.py:28-35).
        self.sigma = (0.5, 1.0, 2.0, 4.0, 8.0)
        self.C1 = (0.01 * self.num_bytes) ** 2
        self.C2 = (0.03 * self.num_bytes) ** 2
        self.C3 = self.C2 / 2.0
        self.alpha = self.beta = self.gamma = 1.0
        self.eta = 0.25
        self.use_pallas = use_pallas

    # ------------------------------------------------------------------ #
    # shared machinery                                                    #
    # ------------------------------------------------------------------ #

    def _shift_stack(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,C] -> [S,B,ch,cw,C]: all (maxShift+1)^2 crops, row-major."""
        crops = [
            _crop(x, i, j, self.ch, self.cw)
            for i in range(self.max_shift + 1)
            for j in range(self.max_shift + 1)
        ]
        return jnp.stack(crops, axis=0)

    def _corrected(self, hr: jnp.ndarray, mask: jnp.ndarray,
                   pred: jnp.ndarray):
        """Common per-shift preprocessing for every loss.

        Returns (hr_s, mask_s, corrected_s, total_clear) with shapes
        [S,B,ch,cw,C], [S,B,ch,cw,C], [S,B,ch,cw,C], [S,B]: the shifted truth,
        shifted mask, bias-corrected masked prediction, and clear-pixel counts
        (loss.py:140-152 inlined and vectorized over the shift axis).
        """
        pred_c = _crop(pred, self.border, self.border, self.ch, self.cw)
        hr_s = self._shift_stack(hr)
        mask_s = self._shift_stack(mask)
        total = jnp.sum(mask_s, axis=(2, 3, 4))                       # [S,B]
        pred_masked = pred_c[None] * mask_s
        # Brightness bias b = sum(HR - SR*M)/sum(M) (loss.py:182-187).
        bias = (jnp.sum(hr_s - pred_masked, axis=(2, 3, 4)) / total)  # [S,B]
        corrected = (pred_c[None] + bias[:, :, None, None, None]) * mask_s
        return hr_s, mask_s, corrected, total

    # ------------------------------------------------------------------ #
    # losses                                                              #
    # ------------------------------------------------------------------ #

    def _per_shift_l1(self, hr, mask, pred):
        hr_s, _, corr, total = self._corrected(hr, mask, pred)
        return jnp.sum(jnp.abs(hr_s - corr), axis=(2, 3, 4)) / total  # [S,B]

    def _per_shift_l2(self, hr, mask, pred):
        hr_s, _, corr, total = self._corrected(hr, mask, pred)
        return jnp.sum(jnp.square(hr_s - corr), axis=(2, 3, 4)) / total

    def l1(self, hr: jnp.ndarray, mask: jnp.ndarray, pred: jnp.ndarray):
        """shiftCompensatedL1Loss (loss.py:73-84): scalar."""
        per_shift = self._maybe_pallas("l1", hr, mask, pred)
        return jnp.mean(jnp.min(per_shift, axis=0))

    def l2(self, hr: jnp.ndarray, mask: jnp.ndarray, pred: jnp.ndarray):
        """shiftCompensatedL2Loss (loss.py:55-71): scalar."""
        per_shift = self._maybe_pallas("l2", hr, mask, pred)
        return jnp.mean(jnp.min(per_shift, axis=0))

    def cpsnr(self, hr: jnp.ndarray, mask: jnp.ndarray, pred: jnp.ndarray):
        """shiftCompensatedcPSNR (loss.py:37-53): per-sample [B] vector."""
        l2 = self._maybe_pallas("l2", hr, mask, pred)
        val = 10.0 * (jnp.log(self.num_bytes ** 2 / l2) / jnp.log(10.0))
        return jnp.max(val, axis=0)

    def _per_shift_l1_edge(self, hr, mask, pred):
        hr_s, _, corr, total = self._corrected(hr, mask, pred)
        s, b = hr_s.shape[:2]
        flat = lambda x: x.reshape((s * b,) + x.shape[2:])
        sob_hr = sobel_edges(flat(hr_s)).reshape(hr_s.shape + (2,))
        sob_sr = sobel_edges(flat(corr)).reshape(corr.shape + (2,))
        l1 = jnp.sum(jnp.abs(hr_s - corr), axis=(2, 3, 4)) / total
        sob = jnp.sum(jnp.abs(sob_hr - sob_sr), axis=(2, 3, 4, 5)) / total
        return self.pi * l1 + (1.0 - self.pi) * sob                   # [S,B]

    def l1_edge(self, hr, mask, pred):
        """shiftCompensatedL1EdgeLoss (loss.py:86-97, 219-224): scalar.

        pi * masked L1 + (1-pi) * L1 between Sobel edge maps of the unmasked
        truth crop and the corrected masked prediction.
        """
        per_shift = self._per_shift_l1_edge(hr, mask, pred)
        return jnp.mean(jnp.min(per_shift, axis=0))

    def rev_msssim(self, hr, mask, pred):
        """shiftCompensatedRevSSIM (loss.py:99-110, 189-217): scalar.

        Faithful to the reference formula, including its idiosyncrasies (the
        window is exp(-linspace/(2*sigma^2)) without squaring, and luminance
        is summed over all scales).
        """
        return self.rev_msssim_weighted(hr, mask, pred, None)

    def rev_msssim_weighted(self, hr, mask, pred, w):
        """rev_msssim over the w>0 rows only, exactly.

        ``w`` is a [B] 0/1 sample-weight vector (None = all ones).  The
        per-scale window normalization is already per-sample, so zeroing a
        row's contribution and replacing the reference's ``b*c`` denominator
        with ``sum(w)*c`` reproduces bit-exactly what an unpadded batch of
        the real rows would score — this is how the trainer keeps the
        l1msssim validation loss exact when a ragged final batch is
        wrap-padded for mesh/kernel alignment (ModelTrainer.eval_step)."""
        hr_s, mask_s, corr, total = self._corrected(hr, mask, pred)

        def per_shift(args):
            hr_c, m_c, sr_c = args
            return self._rev_msssim_single(hr_c, m_c, sr_c, w=w)

        vals = jax.vmap(per_shift)((hr_s, mask_s, corr))              # [S]
        return jnp.min(vals, axis=0)

    def _rev_msssim_single(self, hr, mask, sr, w=None):
        """One shift of computeRevMultiScaleSSIM (loss.py:189-217).

        ``w``: optional [B] sample weights — see rev_msssim_weighted."""
        b, h, w_, c = hr.shape
        if w is None:
            w = jnp.ones((b,), jnp.float32)
        denom = jnp.sum(w) * c
        wb = w[:, None, None, None]                                   # [B,1,1,1]
        lin = jnp.linspace(-h / 2.0, h / 2.0, h)
        ws = []
        for sig in self.sigma:
            w1 = jnp.exp(-1.0 * lin / (2.0 * sig ** 2))
            w2 = jnp.einsum("i,j->ij", w1, w1)
            w2 = w2.reshape(1, h, w_, 1) * jnp.ones((b, 1, 1, c))
            w2 = w2 * mask.astype(jnp.float32)
            w2 = w2 / jnp.sum(w2, axis=(1, 2, 3), keepdims=True)
            ws.append(w2)
        weights = jnp.stack(ws)                                       # [5,B,h,w,C]

        mu_hr = jnp.sum(weights * hr, axis=(2, 3), keepdims=True)
        mu_sr = jnp.sum(weights * sr, axis=(2, 3), keepdims=True)
        var_hr = jnp.sum(weights * hr ** 2, axis=(2, 3), keepdims=True) - mu_hr ** 2
        var_sr = jnp.sum(weights * sr ** 2, axis=(2, 3), keepdims=True) - mu_sr ** 2
        cov = jnp.sum(weights * hr * sr, axis=(2, 3), keepdims=True) - mu_sr * mu_hr

        lum = (2.0 * mu_hr * mu_sr + self.C1) / (mu_hr ** 2 + mu_sr ** 2 + self.C1)
        con = (2.0 * var_hr * var_sr + self.C1) / (var_hr ** 2 + var_sr ** 2 + self.C1)
        struct = (2.0 * cov + self.C3) / (var_hr * var_sr + self.C3)

        pcs = jnp.prod((con ** self.beta) * (struct ** self.gamma), axis=0)
        loss = 1.0 - jnp.sum((lum ** self.alpha) * pcs * wb) / denom
        # Mixed with a window-weighted normalized L1 (loss.py:213-216).
        l1w = (jnp.sum(jnp.abs(hr - sr) * weights * wb)
               / denom / self.num_bytes)
        return self.eta * loss + (1.0 - self.eta) * l1w

    # ------------------------------------------------------------------ #
    # dispatch                                                            #
    # ------------------------------------------------------------------ #

    def _maybe_pallas(self, kind: str, hr, mask, pred):
        """Per-shift L1/L2 table [S, B]; fused Pallas kernel on TPU."""
        if self.use_pallas and _on_tpu():
            from probav_tpu.ops import pallas_shift_loss as psl
            if psl.supports(jnp.asarray(hr), self.border):
                return psl.per_shift_table(kind, jnp.asarray(hr),
                                           jnp.asarray(mask),
                                           jnp.asarray(pred),
                                           border=self.border)
        if kind == "l1":
            return self._per_shift_l1(hr, mask, pred)
        return self._per_shift_l2(hr, mask, pred)

    def by_name(self, name: str):
        """Cfg loss-key dispatch (train.py:93-100)."""
        table = {"l1": self.l1, "sobel_l1_mix": self.l1_edge,
                 "l2": self.l2, "l1msssim": self.rev_msssim}
        return table[name]

    def per_sample(self, name: str):
        """Per-sample [B] variant of a loss (min over shifts, no batch
        mean), or None when the loss is inherently batch-coupled
        (rev_msssim normalizes luminance over the whole batch,
        loss.py:207-216).  ``mean(per_sample(...)) == by_name(...)``
        exactly; the trainer uses this to weight out padded validation
        rows (ModelTrainer eval_step)."""

        def reduce(per_shift_fn):
            return lambda hr, mask, pred: jnp.min(
                per_shift_fn(hr, mask, pred), axis=0)

        table = {
            "l1": reduce(lambda h, m, p: self._maybe_pallas("l1", h, m, p)),
            "l2": reduce(lambda h, m, p: self._maybe_pallas("l2", h, m, p)),
            "sobel_l1_mix": reduce(self._per_shift_l1_edge),
            "l1msssim": None,
        }
        return table[name]

    def weighted(self, name: str):
        """Sample-weighted variant fn(hr, mask, pred, w[B]) -> scalar.

        Equals ``by_name(name)`` on the rows with w == 1 exactly — for the
        per-sample-decomposable losses via a weighted mean of per_sample,
        and for the batch-coupled rev_msssim via rev_msssim_weighted.  The
        trainer uses this to evaluate padded validation batches exactly."""
        if name == "l1msssim":
            return self.rev_msssim_weighted
        ps = self.per_sample(name)

        def fn(hr, mask, pred, w):
            return jnp.sum(ps(hr, mask, pred) * w) / jnp.sum(w)

        return fn


@functools.cache
def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"
