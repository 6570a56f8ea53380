"""Synthetic PROBA-V-shaped dataset for end-to-end tests.

Builds a miniature raw tree matching the ESA layout the ingest stage walks:

    <root>/{train,test}/<band>/imgsetNNNN/{LR*.png, QM*.png[, HR.png, SM.png]}

LR scenes are integer-shifted copies of a base pattern (so registration has
known ground truth) with mild noise and partial occlusion masks; HR is a
3x nearest-neighbor upscale of the base.
"""

import os

import numpy as np

from probav_tpu.utils.io import write_png

LR_SIZE = 32
HR_SIZE = 96
SCALE = 3


def _base_scene(rng, size):
    # Smooth-ish random field so phase correlation locks on.
    x = rng.uniform(0, 1, (size, size))
    k = np.ones((3, 3)) / 9.0
    for _ in range(2):
        pad = np.pad(x, 1, mode="wrap")
        x = sum(pad[i:i + size, j:j + size] * k[i, j]
                for i in range(3) for j in range(3))
    x = (x - x.min()) / (x.max() - x.min() + 1e-9)
    return (x * 40000 + 5000).astype(np.uint16)


def make_raw_tree(root: str, bands=("NIR", "RED"), train_scenes=3,
                  test_scenes=2, frames=5, seed=0, lr_size=None) -> str:
    lr_size = lr_size if lr_size is not None else LR_SIZE
    rng = np.random.default_rng(seed)
    for band in bands:
        for split, n_scenes, with_hr in (("train", train_scenes, True),
                                         ("test", test_scenes, False)):
            for s in range(n_scenes):
                d = os.path.join(root, split, band, f"imgset{s:04d}")
                os.makedirs(d, exist_ok=True)
                base = _base_scene(rng, lr_size)
                for f in range(frames):
                    dy, dx = rng.integers(-2, 3, size=2)
                    frame = np.roll(base, (dy, dx), axis=(0, 1))
                    noise = rng.normal(0, 50, frame.shape)
                    img = np.clip(frame.astype(np.int64) + noise, 0, 65535)
                    write_png(os.path.join(d, f"LR{f:03d}.png"),
                              img.astype(np.uint16))
                    qm = np.full(frame.shape, 255, np.uint16)
                    # occlude a random block on some frames
                    if f % 3 == 1:
                        y0, x0 = rng.integers(0, lr_size - 8, size=2)
                        qm[y0:y0 + 8, x0:x0 + 8] = 0
                    write_png(os.path.join(d, f"QM{f:03d}.png"), qm)
                if with_hr:
                    hr = np.kron(base, np.ones((SCALE, SCALE), np.uint16))
                    write_png(os.path.join(d, "HR.png"), hr)
                    sm = np.full(hr.shape, 255, np.uint16)
                    sm[:4, :4] = 0
                    write_png(os.path.join(d, "SM.png"), sm)
    return root


SYNTH_CFG = """
[Directories]
raw_data={raw}
preprocessing_out={out}
model_out={model_out}
train_out={train_out}
test_out={test_out}

[Train]
batch_size=4
epochs=2
learning_rate=0.002
optimizer=nadam
loss=l1
split=0.25

[Net]
num_res_blocks=1
num_low_res_imgs=9
scale=3
num_filters=4
kernel_size=3
exp_rate=2
decay_rate=0.8
is_grayscale=1

[Preprocessing]
max_shift=6
patch_size=16
patch_stride=16
num_low_res_imgs_pre=9
low_res_patch_thresholds=0.85
low_res_threshold=0.3
high_res_threshold=0.85
num_low_res_permute=1
to_flip=0
to_rotate=0
ckpt=1,2,3,4,5
"""


def write_cfg(path: str, raw: str, out: str, model_out: str,
              train_out: str, test_out: str) -> str:
    with open(path, "w") as f:
        f.write(SYNTH_CFG.format(raw=raw, out=out, model_out=model_out,
                                 train_out=train_out, test_out=test_out))
    return path
