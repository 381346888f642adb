"""Learning-rate schedules as pure ``step -> decay_rate`` functions.

The reference models schedules as stateful decay-rate objects whose
``set_lr`` writes ``init_lr * decay_rate`` into optimizer param groups each
step (reference: src/schedule.py:40-47).  Here each schedule is a pure
function of the (1-based) step so it can live inside the jitted train step;
the effective lr is ``init_lr * decay_rate(step)`` exactly as the reference
computes it.  The `bob` schedule is inherently stateful (decays on dev-loss
plateaus, reference: src/schedule.py:134-160) and is provided as a small
host-side state machine.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def _interp_linear(x, x0, y0, x1, y1):
    x = jnp.asarray(x, jnp.float32)
    f = (x - x0) / jnp.maximum(x1 - x0, 1e-8)
    y = y0 + jnp.clip(f, 0.0, 1.0) * (y1 - y0)
    return jnp.where(x < x0, y0, jnp.where(x > x1, y1, y))


def linear_schedule(cfg) -> Callable:
    """reference: src/schedule.py:88-102 (LinearLearningRateSchedule)."""
    x0, y0, x1, y1 = cfg["x0"], cfg["y0"], cfg["x1"], cfg["y1"]

    def decay(step):
        return _interp_linear(step, x0, y0, x1, y1)

    return decay


def warmup_linear_schedule(cfg) -> Callable:
    """reference: src/schedule.py:105-115 (WarmupLinearLearningRateSchedule)."""
    x0, y0, x1, y1 = cfg["x0"], cfg["y0"], cfg["x1"], cfg["y1"]
    warmup = cfg["warmup_step"]

    def decay(step):
        d0 = _interp_linear(step, 0, 0.0, warmup, y0)
        d1 = _interp_linear(step, x0, y0, x1, y1)
        return jnp.minimum(d0, d1)

    return decay


def warmup_transformer_schedule(cfg) -> Callable:
    """Noam: d_model^-0.5 * min(step^-0.5, step * warmup^-1.5).

    reference: src/schedule.py:118-131 (WarmupTransformerLearningRateSchedule).
    """
    warmup = float(cfg["warmup_step"])
    d_model = float(cfg["d_model"])

    def decay(step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return d_model ** -0.5 * jnp.minimum(step ** -0.5, step * warmup ** -1.5)

    return decay


class BobSchedule:
    """Dev-loss-plateau decay; host-side state, applied between epochs.

    reference: src/schedule.py:134-160 (BobLearningRateSchedule).
    """

    def __init__(self, cfg):
        self.decay_coef = float(cfg["decay_coef"])
        self.tolerate = float(cfg["tolerate"])
        self.decay_rate = 1.0
        self.last_loss = -1.0

    def __call__(self, step):
        return jnp.asarray(self.decay_rate, jnp.float32)

    def update(self, dev_loss: float) -> None:
        if self.last_loss > 0:
            improvement = (self.last_loss - dev_loss) / self.last_loss
            if improvement < self.tolerate:
                self.decay_rate *= self.decay_coef
        self.last_loss = dev_loss

    def pack_state(self) -> dict:
        return {"decay_rate": self.decay_rate, "last_loss": self.last_loss}

    def restore_state(self, state: dict) -> None:
        self.decay_rate = state["decay_rate"]
        self.last_loss = state["last_loss"]


def get_schedule(cfg) -> Callable:
    """Factory matching the reference's `schedule.get_scheduler`
    (reference: src/schedule.py:19-29)."""
    kind = cfg["type"]
    if kind == "linear":
        return linear_schedule(cfg)
    if kind == "warmup_linear":
        return warmup_linear_schedule(cfg)
    if kind == "warmup_transformer":
        return warmup_transformer_schedule(cfg)
    if kind == "bob":
        return BobSchedule(cfg)
    raise ValueError(f"Unknown scheduler: {kind}")
