"""Jitted training / evaluation steps, data-parallel over a device mesh.

Replaces ModelInterface.training_step + Lightning DDP
(reference: train/scripts/model/model_interface.py:53-77,
train/main.py:191-195). One program, one jit: the batch is sharded over the
mesh 'data' axis, parameters are replicated, and XLA compiles the gradient
all-reduce into ICI collectives. BatchNorm statistics are computed over the
GLOBAL batch (XLA inserts the cross-chip mean) — stronger than torch DDP's
per-replica stats.

The GAN discriminator (when enabled) updates inside the step with its own
optimizer, mirroring the reference's optimizer-inside-the-loss
(reference: train/scripts/model/gan.py:263-299).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from v2ce_toolbox_tpu.config import TrainConfig
from v2ce_toolbox_tpu.train.gan import (
    discriminator_update,
    generator_adversarial_loss,
    make_disc_optimizer,
)
from v2ce_toolbox_tpu.train.losses import compose_losses
from v2ce_toolbox_tpu.train.metrics import build_metric_suite
from v2ce_toolbox_tpu.train.state import TrainState, make_optimizer


def _split_pred(pred):
    """Support multi-output models: a dict pred carries 'voxels' plus
    auxiliary outputs ('imu', 'physical_atts'); a bare array is the voxels
    (reference: train/scripts/model/v2ce_3d.py:27-32 returns a dict)."""
    if isinstance(pred, dict):
        return pred["voxels"], pred
    return pred, {}


def _maybe_encoder_loss(loss_names, encoder_loss_fn):
    """Build a frozen EncoderLoss when '--loss encoder' is requested and the
    caller supplied none (reference: model_interface.py:358-360)."""
    if "encoder" in loss_names and encoder_loss_fn is None:
        from v2ce_toolbox_tpu.train.voxel_encoder import EncoderLoss

        encoder_loss_fn = EncoderLoss()
    return encoder_loss_fn


def make_train_step(
    model,
    cfg: TrainConfig,
    *,
    disc=None,
    gan_k: int = 3,
    use_3d_disc: bool = False,
    steps_per_epoch: int = 1000,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    encoder_loss_fn=None,
):
    """Build train_step(state, batch) -> (state, logs).

    batch: {'image_units': (B, L, H, W, 2), 'voxels': (B, L, H, W, 20)},
    plus optional 'imu' / 'physical_att' targets for models that emit the
    matching auxiliary outputs. When `mesh` is given the step is jitted with
    batch sharded over 'data' and state replicated.
    """
    mcfg = getattr(model, "config", None)
    if getattr(mcfg, "conv_impl", "xla") == "pallas":
        raise ValueError(
            "conv_impl='pallas' is forward-only (no custom VJP); "
            "use conv_impl='xla' for training")
    if (getattr(mcfg, "subpixel_decoder", False)
            and getattr(mcfg, "subpixel_impl", "") == "pallas"):
        raise ValueError(
            "subpixel_impl='pallas' (fused decoder kernel) is forward-only; "
            "use an XLA subpixel_impl or subpixel_decoder=False for training")
    loss_names = tuple(cfg.loss.split("+"))
    tx = make_optimizer(cfg, steps_per_epoch)
    disc_tx = make_disc_optimizer() if disc is not None else None
    use_gan = disc is not None and "gan" in loss_names
    encoder_loss_fn = _maybe_encoder_loss(loss_names, encoder_loss_fn)

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        gt = batch["voxels"]

        disc_params, disc_opt_state = state.disc_params, state.disc_opt_state
        d_loss = jnp.zeros(())
        if use_gan:
            # Phase A: discriminator steps on stopped-gradient predictions
            fake_voxels, _ = model.apply(
                state.model_variables(), batch["image_units"], train=True,
                mutable=["batch_stats", "sn"],
            )
            fake_voxels, _ = _split_pred(fake_voxels)
            disc_params, disc_opt_state, d_loss = discriminator_update(
                disc, disc_params, disc_opt_state,
                fake_voxels, gt, gan_k=gan_k, use_3d_conv=use_3d_disc,
                optimizer=disc_tx,
            )

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats, "sn": state.sn}
            pred, new_model_state = model.apply(
                variables, batch["image_units"], train=True,
                mutable=["batch_stats", "sn"],
            )
            pred, pred_extras = _split_pred(pred)
            gan_term = None
            if use_gan:
                gan_term = generator_adversarial_loss(
                    disc, disc_params, pred, use_3d_conv=use_3d_disc)
            total, logs = compose_losses(pred, gt, loss_names,
                                         ef_type=cfg.ef_type,
                                         add_base_loss=cfg.add_base_loss,
                                         gan_loss_value=gan_term,
                                         encoder_loss_fn=encoder_loss_fn,
                                         pred_extras=pred_extras,
                                         batch=batch)
            return total, (new_model_state, logs)

        (loss, (new_model_state, logs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)

        logs = dict(logs, loss=loss, d_loss=d_loss)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_model_state["batch_stats"],
            sn=new_model_state["sn"],
            opt_state=new_opt_state,
            disc_params=disc_params,
            disc_opt_state=disc_opt_state,
        )
        return new_state, logs

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(
    model,
    cfg: TrainConfig,
    *,
    metric_names: Sequence[str] = ("binarymatch", "binarymatchf1",
                                   "poolmse", "l1"),
    mesh: Optional[Mesh] = None,
    encoder_loss_fn=None,
):
    """Build eval_step(state, batch) -> metrics dict (reference:
    model_interface.py:79-99 + calculate_metrics :136-152)."""
    suite = build_metric_suite(metric_names)
    loss_names = tuple(n for n in cfg.loss.split("+") if n != "gan")
    encoder_loss_fn = _maybe_encoder_loss(loss_names, encoder_loss_fn)

    def step(state: TrainState, batch) -> Dict:
        pred = model.apply(state.model_variables(), batch["image_units"],
                           train=False)
        pred, pred_extras = _split_pred(pred)
        loss, _ = compose_losses(pred, batch["voxels"], loss_names,
                                 ef_type=cfg.ef_type,
                                 add_base_loss=cfg.add_base_loss,
                                 encoder_loss_fn=encoder_loss_fn,
                                 pred_extras=pred_extras, batch=batch)
        out = {name: fn(pred, batch["voxels"]) for name, fn in suite.items()}
        out["val_loss"] = loss
        return out

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data), out_shardings=repl)
