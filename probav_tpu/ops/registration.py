"""Frame registration: FFT phase correlation + integer circular shift.

Rebuild of the reference registration stage (utils/dataGenerator.py:599-678),
which aligns every LR frame of a scene to its clearest frame:

- ``tech='freq'``: skimage ``register_translation`` (default upsample_factor=1
  => integer shifts) followed by ``scipy.ndimage.fourier_shift`` round-trips.
  An integer-shift Fourier translation is exactly a circular roll, so we
  compute the argmax of the FFT cross-correlation and apply ``np.roll`` /
  ``jnp.roll`` — bit-exact w.r.t. the reference up to FFT rounding, and
  batched on TPU via ``register_image_set_jax``.

- ``tech='time'``: masked normalized cross-correlation (Padfield) as in
  skimage ``masked_register_translation``, then a reflect-mode spatial shift.
  Batched on TPU via ``register_scenes_jax(tech='time')``.

Masks follow the reference convention INTO this module as QM arrays
(nonzero == clear); the outputs are masked arrays with mask=True == occluded.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

try:  # scipy is available in the image; used only for the 'time' technique.
    from scipy import ndimage as _ndimage
except Exception:  # pragma: no cover
    _ndimage = None


# --------------------------------------------------------------------- #
# shift estimation                                                       #
# --------------------------------------------------------------------- #

def phase_correlation_shift(reference: np.ndarray, moving: np.ndarray) -> np.ndarray:
    """Integer shift (per axis) aligning ``moving`` to ``reference``.

    Equivalent to skimage register_translation(reference, moving) with
    upsample_factor=1: argmax of |ifftn(F_ref * conj(F_mov))| with wrap-around
    indices mapped to negative shifts.
    """
    f_ref = np.fft.fftn(reference)
    f_mov = np.fft.fftn(moving)
    cc = np.fft.ifftn(f_ref * f_mov.conj())
    shape = np.array(reference.shape)
    maxima = np.unravel_index(np.argmax(np.abs(cc)), reference.shape)
    shifts = np.array(maxima, dtype=np.float64)
    midpoints = np.fix(shape / 2)
    shifts[shifts > midpoints] -= shape[shifts > midpoints]
    return shifts


def masked_phase_correlation_shift(reference: np.ndarray, moving: np.ndarray,
                                   reference_mask: np.ndarray,
                                   moving_mask: np.ndarray,
                                   overlap_ratio: float = 3.0 / 10.0) -> np.ndarray:
    """Masked normalized cross-correlation shift (Padfield 2012).

    Port of the algorithm behind skimage masked_register_translation: compute
    the masked NCC surface entirely via FFTs, suppress translations with too
    little mask overlap, return the argmax as an integer shift.
    """
    eps = np.finfo(np.float64).eps
    fixed = np.where(reference_mask, reference.astype(np.float64), 0.0)
    moving_img = np.where(moving_mask, moving.astype(np.float64), 0.0)
    m1 = reference_mask.astype(np.float64)
    m2 = moving_mask.astype(np.float64)

    # Zero-pad to the 'full' linear-correlation size (2N-1 per axis) as the
    # Padfield formulation requires: with unpadded circular FFTs, overlap
    # counts and the NCC surface wrap around the borders and can elect a
    # spurious wrapped translation.
    pad_shape = tuple(2 * s - 1 for s in reference.shape)
    axes = tuple(range(reference.ndim))
    fft = lambda x: np.fft.fftn(x, s=pad_shape, axes=axes)
    ifft = lambda x: np.real(np.fft.ifftn(x))
    f1, f2 = fft(fixed), fft(moving_img)
    fm1, fm2 = fft(m1), fft(m2)

    overlap = ifft(fm1 * fm2.conj())
    overlap = np.maximum(np.round(overlap), 0.0)
    s1 = ifft(f1 * fm2.conj())
    s2 = ifft(fm1 * f2.conj())
    sq1 = ifft(fft(fixed ** 2) * fm2.conj())
    sq2 = ifft(fm1 * fft(moving_img ** 2).conj())
    cross = ifft(f1 * f2.conj())

    with np.errstate(divide="ignore", invalid="ignore"):
        num = cross - s1 * s2 / np.maximum(overlap, eps)
        var1 = np.maximum(sq1 - s1 ** 2 / np.maximum(overlap, eps), 0.0)
        var2 = np.maximum(sq2 - s2 ** 2 / np.maximum(overlap, eps), 0.0)
        ncc = num / np.sqrt(var1 * var2 + eps)

    ncc[overlap < overlap_ratio * overlap.max()] = -np.inf
    maxima = np.unravel_index(np.argmax(ncc), pad_shape)
    # Padded 'full' correlation: index k maps to displacement k for
    # k < n, else k - (2n - 1).
    shifts = np.array([
        float(k) if k < n else float(k - p)
        for k, n, p in zip(maxima, reference.shape, pad_shape)
    ])
    return shifts


# --------------------------------------------------------------------- #
# frame / set registration (host pipeline entry points)                  #
# --------------------------------------------------------------------- #

def register_frame(img: np.ndarray, msk: np.ndarray,
                   reference_img: np.ndarray, reference_msk: np.ndarray,
                   tech: str = "freq") -> Tuple[np.ndarray, np.ndarray]:
    """Align one frame (+ boolean clear-mask) to the reference frame.

    Mirrors registerFrame (dataGenerator.py:649-678).  Shapes [C, H, W].
    """
    if tech == "freq":
        shift = phase_correlation_shift(reference_img, img).astype(np.int64)
        reg_img = np.roll(img.astype(np.float64), shift, axis=range(img.ndim))
        reg_msk = np.roll(msk.astype(bool), shift, axis=range(msk.ndim))
        return reg_img, reg_msk
    if tech == "time":
        if _ndimage is None:  # pragma: no cover
            raise RuntimeError("scipy is required for tech='time'")
        shift = masked_phase_correlation_shift(
            reference_img, img, reference_msk, msk)
        reg_img = _ndimage.shift(img.astype(np.float64), shift, mode="reflect")
        reg_msk = _ndimage.shift(msk.astype(np.float64), shift,
                                 mode="constant", cval=0.0) > 0.5
        return reg_img, reg_msk
    raise ValueError(f"unknown registration technique {tech!r}")


def _clearness_order(msk_lr) -> np.ndarray:
    """Clearest-first frame order (descending count of nonzero QM pixels):
    the reference contract that the clearest frame is the unregistered
    reference frame (dataGenerator.py:632-636).  One shared definition so
    the host, per-scene-jax, and batched-jax paths can never silently
    disagree on ordering/tie-breaks."""
    return np.argsort([-np.count_nonzero(m) for m in msk_lr])


def register_image_set(img_lr: np.ndarray, msk_lr: np.ndarray,
                       tech: str = "freq") -> np.ma.masked_array:
    """Register all frames of one scene to its clearest frame.

    Mirrors registerImagesInSet (dataGenerator.py:616-646): sort frames by
    clearness (descending count of nonzero QM pixels), use the clearest as the
    reference (left unregistered), register the rest, and return a masked
    array whose mask is True at OCCLUDED pixels (~QM).

    img_lr/msk_lr: [numFrames, C, H, W] raw image + QM arrays.
    """
    assert img_lr.shape == msk_lr.shape, "Input shape does not match!"
    order = _clearness_order(msk_lr)
    imgs = img_lr[order]
    msks = msk_lr[order]
    ref_img, ref_msk = imgs[0], msks[0] > 0

    out_img = np.empty(imgs.shape, dtype=np.float64)
    out_occluded = np.empty(imgs.shape, dtype=bool)
    out_img[0] = imgs[0]
    out_occluded[0] = ~(msks[0] > 0)
    for i in range(1, len(imgs)):
        reg_img, reg_msk = register_frame(imgs[i], msks[i] > 0, ref_img,
                                          ref_msk, tech=tech)
        out_img[i] = reg_img
        out_occluded[i] = ~reg_msk
    return np.ma.masked_array(out_img, mask=out_occluded)


def register_images(all_img_lr: np.ndarray, all_msk_lr: np.ndarray,
                    tech: str = "freq", progress: bool = False,
                    backend: str = "numpy") -> np.ma.masked_array:
    """Register every scene (dataGenerator.py:599-613).

    [numImgSet, numFrames, C, H, W] -> masked array of the same shape.
    ``backend='jax'`` runs the shift estimation + resample on the
    accelerator for BOTH techniques — phase-correlation FFT/argmax/roll
    ('freq') and Padfield masked NCC + reflect-resample ('time') —
    bucketed by frame count into chunked multi-scene device calls (see
    register_scenes_jax).
    """
    single_channel = all(np.asarray(all_img_lr[i]).shape[1] == 1
                         for i in range(len(all_img_lr)))
    if backend == "jax" and tech in ("freq", "time") and single_channel:
        registered = register_scenes_jax(all_img_lr, all_msk_lr,
                                         progress=progress, tech=tech)
    else:
        if backend == "jax" and not single_channel:
            # The device cores decode only (dy, dx) from the correlation
            # argmax; the host path's 3D FFT also shifts the channel
            # axis.  C>1 never occurs in PROBA-V, but don't diverge
            # silently if it ever does.
            import logging
            logging.getLogger("probav_tpu.data").warning(
                "backend='jax' registration supports single-channel "
                "frames only; falling back to the host path")
        sets = range(len(all_img_lr))
        if progress:
            try:
                from tqdm import tqdm
                sets = tqdm(sets, desc="[ INFO ] Registering LR images")
            except Exception:
                pass
        registered = [register_image_set(all_img_lr[i], all_msk_lr[i],
                                         tech=tech) for i in sets]
    try:
        return np.ma.stack(registered)
    except ValueError:
        # Ragged frame counts across scenes (the raw PROBA-V layout: 9-19
        # LR frames per scene): keep an object array of per-scene masked
        # arrays, as the reference does pre-top-k.
        out = np.empty(len(registered), dtype=object)
        for i, r in enumerate(registered):
            out[i] = r
        return out


# --------------------------------------------------------------------- #
# batched JAX fast path (optional, for accelerated preprocessing)        #
# --------------------------------------------------------------------- #

_jax_align = None
_jax_align_batch = None
_jax_align_time_batch = None


def _align_core(jax, jnp, ref, frames, frame_msks):
    """One scene: align every frame (+ mask) to the reference frame.

    ref [C,H,W]; frames/frame_msks [N,C,H,W].  Shared by the per-scene
    and the vmapped multi-scene jit entry points.
    """
    f_ref = jnp.fft.fft2(ref)                       # [C,H,W] complex
    f_mov = jnp.fft.fft2(frames)                    # [N,C,H,W]
    cc = jnp.abs(jnp.fft.ifft2(f_ref[None] * jnp.conj(f_mov)))
    n, c, h, w = frames.shape
    flat = cc.reshape(n, c * h * w)
    idx = jnp.argmax(flat, axis=1)
    iy = (idx % (h * w)) // w
    ix = idx % w
    sy = jnp.where(iy > h // 2, iy - h, iy)
    sx = jnp.where(ix > w // 2, ix - w, ix)

    def roll_one(img, msk, dy, dx):
        return (jnp.roll(img, (dy, dx), axis=(1, 2)),
                jnp.roll(msk, (dy, dx), axis=(1, 2)))

    return jax.vmap(roll_one)(frames, frame_msks, sy, sx)


def _get_jax_align():
    """Module-cached jitted per-scene aligner (jit caches per shape)."""
    global _jax_align
    if _jax_align is not None:
        return _jax_align
    import jax
    import jax.numpy as jnp

    _jax_align = jax.jit(functools.partial(_align_core, jax, jnp))
    return _jax_align


def _get_jax_align_batch():
    """Module-cached jitted MULTI-scene aligner: vmap of the same core
    over a leading scene axis (refs [S,C,H,W]; frames [S,N-1,C,H,W])."""
    global _jax_align_batch
    if _jax_align_batch is not None:
        return _jax_align_batch
    import jax
    import jax.numpy as jnp

    _jax_align_batch = jax.jit(
        jax.vmap(functools.partial(_align_core, jax, jnp)))
    return _jax_align_batch


def _align_time_core(jax, jnp, ref, ref_msk, frames, frame_msks,
                     overlap_ratio=3.0 / 10.0):
    """One scene, tech='time': masked-NCC shifts + reflect resample.

    Device-side mirror of masked_phase_correlation_shift +
    register_frame(tech='time') (themselves mirroring the reference's
    masked_register_translation path, dataGenerator.py:663-666): the NCC
    surface lives on the zero-padded full-correlation grid (2H-1, 2W-1),
    translations with too little mask overlap are suppressed, and the
    winning integer shift is applied by gather — exactly what
    scipy.ndimage.shift computes at integer offsets ('reflect' for the
    image, 'constant' cval=0 for the mask; verified bit-equal in
    tests/test_ops.py).  ref/ref_msk [C,H,W]; frames/frame_msks
    [N,C,H,W].  Channels ride the batch axis (the dataset is C=1; for
    C=1 this equals the host path's 3D FFT over [1,H,W]).  Compute is
    float32 on device (the host path runs float64; away from exact NCC
    ties — which the quality masks make measure-zero in practice — the
    argmax agrees).
    """
    n, c, h, w = frames.shape
    ph, pw = 2 * h - 1, 2 * w - 1
    eps = jnp.finfo(jnp.float32).eps

    fixed = jnp.where(ref_msk, ref, 0.0).astype(jnp.float32)
    moving = jnp.where(frame_msks, frames, 0.0).astype(jnp.float32)
    m1 = ref_msk.astype(jnp.float32)
    m2 = frame_msks.astype(jnp.float32)

    def fft(x):
        padding = [(0, 0)] * (x.ndim - 2) + [(0, ph - h), (0, pw - w)]
        return jnp.fft.fft2(jnp.pad(x, padding))

    def ifft(x):
        return jnp.real(jnp.fft.ifft2(x))

    f1, fm1, fs1 = fft(fixed), fft(m1), fft(fixed ** 2)      # [C,ph,pw]
    f2, fm2, fs2 = fft(moving), fft(m2), fft(moving ** 2)    # [N,C,ph,pw]

    overlap = jnp.maximum(jnp.round(ifft(fm1[None] * jnp.conj(fm2))), 0.0)
    s1 = ifft(f1[None] * jnp.conj(fm2))
    s2 = ifft(fm1[None] * jnp.conj(f2))
    sq1 = ifft(fs1[None] * jnp.conj(fm2))
    sq2 = ifft(fm1[None] * jnp.conj(fs2))
    cross = ifft(f1[None] * jnp.conj(f2))

    ovl = jnp.maximum(overlap, eps)
    num = cross - s1 * s2 / ovl
    var1 = jnp.maximum(sq1 - s1 ** 2 / ovl, 0.0)
    var2 = jnp.maximum(sq2 - s2 ** 2 / ovl, 0.0)
    ncc = num / jnp.sqrt(var1 * var2 + eps)

    omax = jnp.max(overlap.reshape(n, -1), axis=1)           # per frame
    ncc = jnp.where(overlap < overlap_ratio * omax[:, None, None, None],
                    -jnp.inf, ncc)
    flat = ncc.reshape(n, c * ph * pw)
    idx = jnp.argmax(flat, axis=1)
    iy = (idx % (ph * pw)) // pw
    ix = idx % pw
    # Full-correlation index k maps to displacement k for k < n, else
    # k - (2n - 1) (masked_phase_correlation_shift's decode).
    sy = jnp.where(iy < h, iy, iy - ph)
    sx = jnp.where(ix < w, ix, ix - pw)

    def shift_one(img, msk, dy, dx):
        jy = jnp.arange(h) - dy
        jx = jnp.arange(w) - dx
        ry = jnp.where(jy < 0, -jy - 1, jy)          # scipy 'reflect':
        ry = jnp.where(ry >= h, 2 * h - 1 - ry, ry)  # (dcba|abcd|dcba)
        rx = jnp.where(jx < 0, -jx - 1, jx)
        rx = jnp.where(rx >= w, 2 * w - 1 - rx, rx)
        reg = jnp.take(jnp.take(img, ry, axis=1), rx, axis=2)
        vy = (jy >= 0) & (jy < h)
        vx = (jx >= 0) & (jx < w)
        gm = jnp.take(jnp.take(msk, jnp.clip(jy, 0, h - 1), axis=1),
                      jnp.clip(jx, 0, w - 1), axis=2)
        return reg, gm & vy[None, :, None] & vx[None, None, :]

    return jax.vmap(shift_one)(frames, frame_msks, sy, sx)


def _get_jax_align_time_batch():
    """Module-cached jitted multi-scene 'time' aligner (vmap over a
    leading scene axis: refs/ref_msks [S,C,H,W]; frames [S,N-1,C,H,W])."""
    global _jax_align_time_batch
    if _jax_align_time_batch is not None:
        return _jax_align_time_batch
    import jax
    import jax.numpy as jnp

    _jax_align_time_batch = jax.jit(
        jax.vmap(functools.partial(_align_time_core, jax, jnp)))
    return _jax_align_time_batch


def register_scenes_jax(all_img_lr, all_msk_lr, chunk: int = None,
                        progress: bool = False, tech: str = "freq") -> list:
    """Register MANY scenes with a handful of device calls.

    Per-scene dispatch (``register_image_set_jax`` in a Python loop) pays
    the backend's per-call latency ~1160 times over the full dataset —
    on a tunneled TPU that latency (75-150 ms/call) dwarfs the FFT work.
    Scenes are therefore bucketed by frame count (the raw PROBA-V layout
    is ragged, 9-19 LR frames per scene) and each bucket runs through ONE
    vmapped jit call per ``chunk`` scenes (the same latency-amortization
    design as the resolver's scene grouping, infer/resolver.py).  A
    ragged final chunk is padded by repeating its last scene and the
    extras dropped, so every call reuses the one compiled (chunk, N)
    shape.  Results keep the input scene order; numerics are identical
    to the per-scene path (same core jit body).

    ``tech='time'`` routes through the masked-NCC core instead
    (_align_time_core); its padded-FFT surfaces are ~4x the frame area
    and ~10 deep, so the default chunk is smaller.
    """
    if tech not in ("freq", "time"):
        raise ValueError(f"unknown registration technique {tech!r}")
    if chunk is None:
        chunk = 64 if tech == "freq" else 16
    n_scenes = len(all_img_lr)
    buckets: dict = {}
    for i in range(n_scenes):
        buckets.setdefault(np.asarray(all_img_lr[i]).shape, []).append(i)

    align_b = (_get_jax_align_batch() if tech == "freq"
               else _get_jax_align_time_batch())
    out: list = [None] * n_scenes
    bar = None
    if progress:
        try:
            from tqdm import tqdm
            bar = tqdm(total=n_scenes,
                       desc="[ INFO ] Registering LR images")
        except Exception:
            pass
    for shape, idxs in buckets.items():
        n_frames = shape[0]
        for s0 in range(0, len(idxs), chunk):
            chunk_idxs = idxs[s0:s0 + chunk]
            take = len(chunk_idxs)
            # Stage ONE chunk at a time, clearest-first per scene (the
            # reference contract: the clearest frame is the unregistered
            # reference frame) — bounds the extra host copy to chunk
            # scenes instead of the whole bucket.
            raw_i = np.empty((take,) + shape, np.float32)
            raw_m = np.empty((take,) + shape, bool)
            for j, i in enumerate(chunk_idxs):
                order = _clearness_order(np.asarray(all_msk_lr[i]))
                raw_i[j] = np.asarray(all_img_lr[i])[order]
                raw_m[j] = np.asarray(all_msk_lr[i])[order] > 0
            ib, mb = raw_i, raw_m
            # Canonical batch shapes: pad every chunk up to the next power
            # of two (capped at ``chunk``) so the set of compiled batch
            # sizes is tiny ({1,2,4,...,chunk} per frame count) and SHARED
            # across splits/bands/runs — with the persistent compilation
            # cache (utils/cache.py) a 5-6-scene TEST bucket reuses the
            # 8-scene executable instead of triggering its own multi-minute
            # TPU FFT compile.  Extras are dropped below ([:take]).
            target = min(chunk, 1 << max(0, (take - 1)).bit_length())
            if take < target:
                pad = target - take
                ib = np.concatenate([ib, np.repeat(ib[-1:], pad, axis=0)])
                mb = np.concatenate([mb, np.repeat(mb[-1:], pad, axis=0)])
            if n_frames > 1:
                if tech == "freq":
                    reg_i, reg_m = align_b(ib[:, 0], ib[:, 1:], mb[:, 1:])
                else:
                    reg_i, reg_m = align_b(ib[:, 0], mb[:, 0],
                                           ib[:, 1:], mb[:, 1:])
                reg_i = np.asarray(reg_i)[:take]
                reg_m = np.asarray(reg_m)[:take]
            else:
                reg_i = np.empty((take, 0) + shape[1:], np.float32)
                reg_m = np.empty((take, 0) + shape[1:], bool)
            for j, i in enumerate(chunk_idxs):
                oi = np.concatenate([raw_i[j][:1], reg_i[j]], axis=0)
                om = np.concatenate([raw_m[j][:1], reg_m[j]], axis=0)
                out[i] = np.ma.masked_array(oi.astype(np.float64),
                                            mask=~om)
            if bar is not None:
                bar.update(take)
    if bar is not None:
        bar.close()
    return out


def register_image_set_jax(img_lr: np.ndarray, msk_lr: np.ndarray) -> np.ma.masked_array:
    """Same contract as register_image_set (freq tech), but all frames'
    FFTs/argmax/rolls run batched under jit on the default JAX backend.
    """
    import jax.numpy as jnp

    order = _clearness_order(msk_lr)
    imgs = img_lr[order].astype(np.float32)
    msks = (msk_lr[order] > 0)

    align = _get_jax_align()
    reg_img, reg_msk = align(jnp.asarray(imgs[0]), jnp.asarray(imgs[1:]),
                             jnp.asarray(msks[1:]))
    out_img = np.concatenate([imgs[:1], np.asarray(reg_img)], axis=0)
    out_msk = np.concatenate([msks[:1], np.asarray(reg_msk)], axis=0)
    return np.ma.masked_array(out_img.astype(np.float64), mask=~out_msk)
