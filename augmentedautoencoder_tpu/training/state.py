"""Train state: params + optimizer + (optional) batch-norm statistics.

Optimizer selection mirrors the reference's cfg surface
(`[Training] OPTIMIZER/LEARNING_RATE`, built via tf.train.<name>Optimizer in
ae_factory.py:79-95); Adam with lr 2e-4 is the template default.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..config import TrainConfig
from ..models import AAE


class AAETrainState(train_state.TrainState):
    batch_stats: Any = None


_OPTIMIZERS = {
    "adam": optax.adam,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "gradientdescent": optax.sgd,
    "momentum": lambda lr: optax.sgd(lr, momentum=0.9),
}


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    name = cfg.optimizer.lower()
    if name not in _OPTIMIZERS:
        raise ValueError(f"unknown optimizer: {cfg.optimizer}")
    return _OPTIMIZERS[name](cfg.learning_rate)


def create_train_state(
    rng: jax.Array, cfg: TrainConfig, model: Optional[AAE] = None
) -> AAETrainState:
    if model is None:
        model = AAE.from_config(cfg)
    dummy = jnp.zeros((1,) + tuple(cfg.shape), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, dummy, dummy, train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    return AAETrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=make_optimizer(cfg),
        batch_stats=batch_stats,
    )
