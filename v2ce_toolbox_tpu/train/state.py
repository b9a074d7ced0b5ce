"""Training state and optimizer construction.

Replaces the reference's Lightning plumbing (reference:
train/scripts/model/model_interface.py:113-134 for the optimizer/scheduler,
train/main.py:191-195 for DDP/fp16 policy) with optax + an explicit flax
struct. Data parallelism is jit-with-shardings over a jax Mesh instead of
one-process-per-GPU DDP.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax
from flax import struct

from v2ce_toolbox_tpu.config import TrainConfig


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """torch StepLR / CosineAnnealingLR equivalents, stepped per epoch
    (reference: model_interface.py:118-131)."""
    if cfg.lr_scheduler is None:
        return cfg.lr

    def schedule(step):
        import jax.numpy as jnp

        epoch = step // max(steps_per_epoch, 1)
        if cfg.lr_scheduler == "step":
            factor = cfg.lr_decay_rate ** (epoch // cfg.lr_decay_steps)
            return jnp.maximum(cfg.lr * factor, cfg.lr_decay_min_lr)
        if cfg.lr_scheduler == "cosine":
            t = jnp.minimum(epoch / cfg.lr_decay_steps, 1.0)
            return (cfg.lr_decay_min_lr +
                    (cfg.lr - cfg.lr_decay_min_lr) * 0.5 *
                    (1 + jnp.cos(jnp.pi * t)))
        raise ValueError(f"invalid lr_scheduler {cfg.lr_scheduler!r}")

    return schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1000):
    """Adam with additive L2 weight decay, matching torch
    Adam(lr, weight_decay) semantics (reference: model_interface.py:113-116)."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(make_lr_schedule(cfg, steps_per_epoch)),
    )


class TrainState(struct.PyTreeNode):
    """Generator + discriminator training state (one pytree, one ckpt)."""

    step: jax.Array
    params: Any
    batch_stats: Any
    sn: Any                       # spectral-norm power-iteration vectors
    opt_state: Any
    disc_params: Optional[Any] = None
    disc_opt_state: Optional[Any] = None

    def model_variables(self) -> Dict[str, Any]:
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "sn": self.sn,
        }


def create_train_state(
    model,
    cfg: TrainConfig,
    *,
    input_shape=(1, 2, 260, 346, 2),
    steps_per_epoch: int = 1000,
    disc=None,
    disc_input_shape=(1, 260, 346, 20),
    rng: Optional[jax.Array] = None,
) -> TrainState:
    import jax.numpy as jnp

    if rng is None:
        rng = jax.random.key(cfg.seed)
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32),
                           train=False)
    tx = make_optimizer(cfg, steps_per_epoch)
    disc_params = disc_opt_state = None
    if disc is not None:
        from v2ce_toolbox_tpu.train.gan import make_disc_optimizer

        disc_vars = disc.init(jax.random.fold_in(rng, 1),
                              jnp.zeros(disc_input_shape, jnp.float32))
        disc_params = disc_vars["params"]
        disc_opt_state = make_disc_optimizer().init(disc_params)
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        sn=variables.get("sn", {}),
        opt_state=tx.init(variables["params"]),
        disc_params=disc_params,
        disc_opt_state=disc_opt_state,
    )
