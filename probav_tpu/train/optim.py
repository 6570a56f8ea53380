"""Optimizer construction from cfg (optax).

Mirrors the reference optimizer selection (train.py:77-83: adam | nadam | sgd
at the configured learning rate) plus the staged decay schedule sketched in
the reference's multi-GPU experiment (debug/trainClassMultiGPU.py:59-65:
lr -> lr/2 at epoch 10 -> lr/10 at epoch 20; never wired up there — here it's
an opt-in flag).
"""

from __future__ import annotations

from typing import Optional

import optax


def staged_decay(base_lr: float, steps_per_epoch: int) -> optax.Schedule:
    """lr for epochs [0,10), lr/2 for [10,20), lr/10 afterwards."""
    return optax.piecewise_constant_schedule(
        init_value=base_lr,
        boundaries_and_scales={
            10 * steps_per_epoch: 0.5,
            20 * steps_per_epoch: 0.2,   # x0.5 x0.2 == lr/10 total
        },
    )


def build_optimizer(name: str, learning_rate: float,
                    steps_per_epoch: Optional[int] = None,
                    use_staged_decay: bool = False) -> optax.GradientTransformation:
    lr = (staged_decay(learning_rate, steps_per_epoch)
          if use_staged_decay and steps_per_epoch else learning_rate)
    if name == "adam":
        return optax.adam(lr)
    if name == "nadam":
        return optax.nadam(lr)
    if name == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer {name!r} (want adam|nadam|sgd)")
