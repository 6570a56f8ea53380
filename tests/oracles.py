"""Slow, obviously-correct numpy oracles mirroring reference semantics.

These re-derive the reference behaviors (loss.py's 49-shift Python loop,
torch-unfold patching, scipy registration) in plain numpy so the framework's
vectorized/XLA implementations can be tested against an independent source of
truth.
"""

import numpy as np


def crop(x, i, j, h, w):
    return x[:, i:i + h, j:j + w, :].astype(np.float64)


def shift_losses_oracle(hr, mask, pred, border=3, bit_depth=16):
    """Return dict of per-shift tables and final reduced values.

    hr/mask/pred: [B, H, W, C].  Follows models/loss.py:37-238 faithfully:
    bias = sum(HR - pred*M)/sum(M); corrected = (pred+b)*M; L1/L2 sums run
    over the UNMASKED truth; normalizer = clear-pixel count.
    """
    th = hr.shape[1]
    max_shift = 2 * border
    ch = cw = th - max_shift
    num_bytes = 2 ** bit_depth - 1

    pred_c = crop(pred, border, border, ch, cw)
    l1_tab, l2_tab, psnr_tab = [], [], []
    for i in range(max_shift + 1):
        for j in range(max_shift + 1):
            hr_c = crop(hr, i, j, ch, cw)
            m_c = crop(mask, i, j, ch, cw)
            total = m_c.sum(axis=(1, 2, 3))
            b = (hr_c - pred_c * m_c).sum(axis=(1, 2, 3)) / total
            corrected = (pred_c + b[:, None, None, None]) * m_c
            l1 = np.abs(hr_c - corrected).sum(axis=(1, 2, 3)) / total
            l2 = np.square(hr_c - corrected).sum(axis=(1, 2, 3)) / total
            l1_tab.append(l1)
            l2_tab.append(l2)
            psnr_tab.append(10.0 * np.log10(num_bytes ** 2 / l2))
    l1_tab = np.stack(l1_tab)
    l2_tab = np.stack(l2_tab)
    psnr_tab = np.stack(psnr_tab)
    return {
        "l1_table": l1_tab,
        "l2_table": l2_tab,
        "l1": l1_tab.min(axis=0).mean(),
        "l2": l2_tab.min(axis=0).mean(),
        "cpsnr": psnr_tab.max(axis=0),
    }


def rev_msssim_oracle(hr, mask, pred, border=3, bit_depth=16,
                      sigma=(0.5, 1.0, 2.0, 4.0, 8.0),
                      alpha=1.0, beta=1.0, gamma=1.0, eta=0.25):
    """Numpy re-derivation of shiftCompensatedRevSSIM (loss.py:99-110,
    189-217), idiosyncrasies preserved: the Gaussian window is
    exp(-linspace/(2*sigma^2)) WITHOUT squaring the coordinate, luminance is
    summed over all 5 scales, the structure term divides by var*var (not
    std*std), and the final mix adds a window-weighted normalized L1.
    Returns the scalar min over all 49 shifts.
    """
    b_n, th, tw, c_n = hr.shape
    max_shift = 2 * border
    ch = cw = th - max_shift
    nb = 2 ** bit_depth - 1
    C1 = (0.01 * nb) ** 2
    C3 = ((0.03 * nb) ** 2) / 2.0

    pred_c = crop(pred, border, border, ch, cw)
    lin = np.linspace(-ch / 2.0, ch / 2.0, ch)
    vals = []
    for i in range(max_shift + 1):
        for j in range(max_shift + 1):
            hr_c = crop(hr, i, j, ch, cw)
            m_c = crop(mask, i, j, ch, cw)
            total = m_c.sum(axis=(1, 2, 3))
            b = (hr_c - pred_c * m_c).sum(axis=(1, 2, 3)) / total
            sr = (pred_c + b[:, None, None, None]) * m_c

            ws = []
            for s in sigma:
                w1 = np.exp(-1.0 * lin / (2.0 * s ** 2))
                w2 = np.outer(w1, w1).reshape(1, ch, cw, 1)
                w2 = np.tile(w2, (b_n, 1, 1, c_n)) * m_c
                w2 = w2 / w2.sum(axis=(1, 2, 3), keepdims=True)
                ws.append(w2)
            w = np.stack(ws)                          # [5, B, h, w, C]

            mu_hr = (w * hr_c).sum(axis=(2, 3), keepdims=True)
            mu_sr = (w * sr).sum(axis=(2, 3), keepdims=True)
            var_hr = (w * hr_c ** 2).sum(axis=(2, 3), keepdims=True) - mu_hr ** 2
            var_sr = (w * sr ** 2).sum(axis=(2, 3), keepdims=True) - mu_sr ** 2
            cov = (w * hr_c * sr).sum(axis=(2, 3), keepdims=True) - mu_sr * mu_hr

            lum = (2 * mu_hr * mu_sr + C1) / (mu_hr ** 2 + mu_sr ** 2 + C1)
            con = (2 * var_hr * var_sr + C1) / (var_hr ** 2 + var_sr ** 2 + C1)
            struct = (2 * cov + C3) / (var_hr * var_sr + C3)

            pcs = np.prod((con ** beta) * (struct ** gamma), axis=0)
            loss = 1.0 - ((lum ** alpha) * pcs).sum() / (b_n * c_n)
            l1w = (np.abs(hr_c - sr) * w).sum() / (b_n * c_n) / nb
            vals.append(eta * loss + (1.0 - eta) * l1w)
    return float(np.min(vals))


def sobel_edges_oracle(images):
    """tf.image.sobel_edges oracle: [B,H,W,C] -> [B,H,W,C,2] (dy, dx)."""
    ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float64)
    kx = ky.T
    b, h, w, c = images.shape
    padded = np.pad(images.astype(np.float64),
                    ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = np.zeros((b, h, w, c, 2))
    for bi in range(b):
        for ci in range(c):
            for yi in range(h):
                for xi in range(w):
                    win = padded[bi, yi:yi + 3, xi:xi + 3, ci]
                    out[bi, yi, xi, ci, 0] = (win * ky).sum()
                    out[bi, yi, xi, ci, 1] = (win * kx).sum()
    return out


def unfold_patches_oracle(images, patch, stride):
    """torch.unfold-order patching oracle: [..., H, W] -> [..., n, p, p]."""
    h, w = images.shape[-2:]
    nh = (h - patch) // stride + 1
    nw = (w - patch) // stride + 1
    lead = images.shape[:-2]
    out = np.zeros(lead + (nh * nw, patch, patch), dtype=images.dtype)
    for i in range(nh):
        for j in range(nw):
            out[..., i * nw + j, :, :] = images[
                ..., i * stride:i * stride + patch, j * stride:j * stride + patch]
    return out


def fourier_register_oracle(reference, moving, moving_mask):
    """Reference registerFrame tech='freq' oracle using scipy fourier_shift."""
    from scipy.ndimage import fourier_shift

    f_ref = np.fft.fftn(reference)
    f_mov = np.fft.fftn(moving)
    cc = np.fft.ifftn(f_ref * f_mov.conj())
    shape = np.array(reference.shape)
    maxima = np.unravel_index(np.argmax(np.abs(cc)), reference.shape)
    shifts = np.array(maxima, dtype=np.float64)
    midpoints = np.fix(shape / 2)
    shifts[shifts > midpoints] -= shape[shifts > midpoints]

    reg = np.fft.ifftn(fourier_shift(np.fft.fftn(moving), shifts)).real
    msk = np.round(np.fft.ifftn(
        fourier_shift(np.fft.fftn(moving_mask.astype(float)), shifts)).real)
    return shifts, reg, msk.astype(bool)
