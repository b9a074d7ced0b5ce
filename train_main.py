#!/usr/bin/env python
"""V2CE stage-1 training driver — TPU-native.

Flag-compatible re-design of the reference training entry point
(reference: train/main.py:85-216): same flag groups (control / LR /
restart / logs / loss / model / data), but Lightning DDP becomes one jit
over a jax Mesh, torch Adam becomes optax, and checkpoints are orbax.

Smoke test without data:  python v2ce_toolbox_tpu/data/dummy_data_gen.py
                          python train_main.py --data_dir dummy_data \
                              --max_epochs 1 --batch_size 2
"""

import argparse
import json
import logging
import os
import os.path as op
import sys
import time

sys.path.insert(0, op.dirname(op.abspath(__file__)))

logger = logging.getLogger("train")


def SBool(v):
    if isinstance(v, bool):
        return v
    return v.lower() in ("yes", "true", "t", "y", "1")


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    g = p.add_argument_group("Basic Training Control")
    g.add_argument("--batch_size", default=4, type=int)
    g.add_argument("--num_workers", default=4, type=int)
    g.add_argument("--seed", default=1234, type=int)
    g.add_argument("--weight_decay", default=1e-5, type=float)
    g.add_argument("--test_only", type=SBool, default=False, nargs="?", const=True)
    g.add_argument("--max_epochs", default=100, type=int)
    g.add_argument("--devices", default=None, type=int,
                   help="number of chips for the data mesh (default: all)")
    g.add_argument("--coordinator", default=None, type=str,
                   help="multi-host coordinator address host:port "
                        "(reference analog: multi-node DDP, "
                        "train/main.py:192-195); None on TPU pods "
                        "autodetects when --num_processes > 1")
    g.add_argument("--num_processes", default=1, type=int,
                   help="total number of host processes in the job")
    g.add_argument("--process_id", default=0, type=int,
                   help="this host's rank in [0, num_processes)")

    g = p.add_argument_group("LR and Scheduler")
    g.add_argument("--lr", default=1e-3, type=float)
    g.add_argument("--lr_scheduler", choices=["step", "cosine"], type=str)
    g.add_argument("--lr_decay_steps", default=10, type=int)
    g.add_argument("--lr_decay_rate", default=0.5, type=float)
    g.add_argument("--lr_decay_min_lr", default=1e-6, type=float)

    g = p.add_argument_group("Restart Control")
    g.add_argument("--load_dir", default=None, type=str)
    g.add_argument("--load_best", action="store_true")

    g = p.add_argument_group("Logs and Training Info")
    g.add_argument("--log_dir", default="./logs", type=str)
    g.add_argument("--exp_name", default=None, type=str)
    g.add_argument("--logging_level", default="INFO", type=str)
    g.add_argument("--log_frequency", default=8, type=int)

    g = p.add_argument_group("Loss & Metrics Info")
    g.add_argument("--loss", default=["pyramid", "gan", "ef", "ef_splitp",
                                      "compensation"], nargs="*")
    g.add_argument("--add_base_loss", type=SBool, default=False, nargs="?", const=True)
    g.add_argument("--ef_type", default="c+cl", choices=("only_c", "cl", "c+cl"))
    g.add_argument("--metrics", type=str, nargs="*",
                   default=["L1", "BinaryMatch", "BinaryMatchF1", "PoolMSE"])
    g.add_argument("--gan_k", default=3, type=int)
    g.add_argument("--gan_3d_conv", type=SBool, default=False, nargs="?", const=True)

    g = p.add_argument_group("Model & Data")
    g.add_argument("--model_name", default="v2ce_3d", type=str)
    g.add_argument("--base_num_channels", default=32, type=int,
                   help="UNet3D base channel width (reference analog: "
                        "model-size flags, train/main.py:151-166)")
    g.add_argument("--num_encoders", default=4, type=int)
    g.add_argument("--dataset", default="event_pack_dataset", type=str)
    g.add_argument("--data_dir", default="dummy_data", type=str)
    g.add_argument("--seq_len", default=16, type=int)
    g.add_argument("--partial_dataset", default=1.0, type=float)
    g.add_argument("--random_flip", type=SBool, default=False, nargs="?", const=True)
    g.add_argument("--max_steps_per_epoch", default=0, type=int,
                   help="truncate epochs (0 = full epoch); smoke-test hook")
    g.add_argument("--dump_previews", type=SBool, default=True, nargs="?",
                   const=True, help="save input/GT/pred event-frame preview "
                                    "grids each eval (TB image-callback "
                                    "analog; on by default)")
    g.add_argument("--record_predictions", default=0, type=int,
                   help="dump this many val batches (pred + GT voxels) to "
                        "<workdir>/recorder each eval — feeds the stage-2 "
                        "eval harness (reference: RecorderCallback, "
                        "train/scripts/utils/callbacks.py:165-227)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=getattr(logging, args.logging_level.upper()))

    import numpy as np

    import jax

    from v2ce_toolbox_tpu.config import ModelConfig, TrainConfig
    from v2ce_toolbox_tpu.data.event_pack_dataset import EventPackDataset
    from v2ce_toolbox_tpu.data.loader import device_prefetch, iterate_batches
    from v2ce_toolbox_tpu.models import V2ce3d
    from v2ce_toolbox_tpu.parallel.mesh import make_mesh
    from v2ce_toolbox_tpu.train.gan import make_discriminator
    from v2ce_toolbox_tpu.train.state import create_train_state
    from v2ce_toolbox_tpu.train.step import make_eval_step, make_train_step
    from v2ce_toolbox_tpu.utils.checkpoint import save_checkpoint
    from v2ce_toolbox_tpu.utils.jax_setup import (
        enable_compilation_cache,
        raise_cpu_collective_timeouts,
    )

    raise_cpu_collective_timeouts()
    enable_compilation_cache()

    if args.num_processes > 1 or args.coordinator:
        from v2ce_toolbox_tpu.parallel.mesh import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
    is_lead = jax.process_index() == 0

    exp = args.exp_name or time.strftime("%Y%m%d-%H%M%S")
    work_dir = op.join(args.log_dir, exp)
    os.makedirs(work_dir, exist_ok=True)
    ckpt_dir = op.join(work_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    # largest chip count that divides the batch (batch-dim sharding needs
    # even division)
    avail = args.devices or len(jax.devices())
    n_dp = max(d for d in range(1, avail + 1) if args.batch_size % d == 0)
    mesh = make_mesh(n_dp)
    logger.info("data-parallel over %d device(s), global batch %d",
                n_dp, args.batch_size)

    cfg = TrainConfig(
        lr=args.lr, weight_decay=args.weight_decay,
        lr_scheduler=args.lr_scheduler, lr_decay_steps=args.lr_decay_steps,
        lr_decay_rate=args.lr_decay_rate, lr_decay_min_lr=args.lr_decay_min_lr,
        batch_size=args.batch_size, max_epochs=args.max_epochs,
        seed=args.seed, loss="+".join(args.loss),
        ef_type=args.ef_type, add_base_loss=args.add_base_loss,
    )

    train_ds = EventPackDataset("train", args.data_dir, seq_len=args.seq_len,
                                partial_dataset=args.partial_dataset,
                                random_flip=args.random_flip)
    val_ds = EventPackDataset("val", args.data_dir, seq_len=args.seq_len)
    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)

    model = V2ce3d(config=ModelConfig(
        base_num_channels=args.base_num_channels,
        num_encoders=args.num_encoders))
    use_gan = "gan" in args.loss
    disc = make_discriminator(args.gan_3d_conv) if use_gan else None

    sample = train_ds[0]
    h, w = sample["image_units"].shape[1:3]
    state = create_train_state(
        model, cfg, input_shape=(1, min(args.seq_len, 2), h, w, 2),
        steps_per_epoch=steps_per_epoch, disc=disc,
        disc_input_shape=(1, h, w, 20),
        rng=jax.random.key(args.seed),
    )

    if args.load_dir:
        # full-state resume (reference: train/main.py:61-77 +
        # utils.load_model_path best/last resolution)
        from v2ce_toolbox_tpu.utils.checkpoint import (
            best_or_last,
            load_checkpoint,
        )

        ckpt = (best_or_last(args.load_dir, prefer_best=args.load_best)
                or args.load_dir)
        logger.info("resuming from checkpoint %s", ckpt)
        state = load_checkpoint(ckpt, target=state)

    train_step = make_train_step(model, cfg, disc=disc, gan_k=args.gan_k,
                                 use_3d_disc=args.gan_3d_conv,
                                 steps_per_epoch=steps_per_epoch, mesh=mesh)
    eval_step = make_eval_step(model, cfg,
                               metric_names=[m.lower() for m in args.metrics],
                               mesh=mesh)

    best_f1 = -1.0
    # host-side artifacts come from the lead process only (reference
    # analog: rank-aware logging, train/scripts/utils/utils.py:122-130);
    # checkpoint saves stay collective (orbax coordinates across hosts)
    metrics_log = (open(op.join(work_dir, "metrics.jsonl"), "a")
                   if is_lead else open(os.devnull, "w"))

    recorder_dir = op.join(work_dir, "recorder")
    predict = jax.jit(lambda s, b: model.apply(
        s.model_variables(), b["image_units"], train=False))

    def run_eval(state, epoch):
        nonlocal best_f1
        agg = {}
        n_b = 0
        batches = iterate_batches(val_ds, args.batch_size, shuffle=False,
                                  num_workers=args.num_workers)
        for batch in device_prefetch(batches, mesh):
            m = eval_step(state, batch)
            # recorder/preview dumps read the full batch on one host —
            # single-process only (multi-host shards are not addressable)
            one_proc = jax.process_count() == 1
            if n_b < args.record_predictions and one_proc:
                import pickle

                os.makedirs(recorder_dir, exist_ok=True)
                pred = predict(state, batch)
                with open(op.join(recorder_dir,
                                  f"val-e{epoch}-b{n_b}.pkl"), "wb") as f:
                    pickle.dump({
                        "pred_voxels": np.asarray(pred),
                        "gt_voxels": np.asarray(batch["voxels"]),
                        "epoch": epoch,
                    }, f)
            if args.dump_previews and n_b == 0 and one_proc:
                # input / GT / pred event-frame preview panel (reference:
                # WritePlotsToTensorBoardCallBack, callbacks.py:72-162:
                # pred_voxel_sum + target_voxel_sum + input_frame_0 + lfr)
                import sys as _sys

                _sys.path.insert(0, op.dirname(op.abspath(__file__)))
                from tools.vis_tools import batch_show, event_frame_rgb

                pred = predict(state, batch)
                pv = np.asarray(pred[0])      # (L, H, W, 20)
                gv = np.asarray(batch["voxels"][0])
                frames = np.asarray(batch["image_units"][0])  # (L, H, W, 2)
                lfr = (np.asarray(batch["lfr"][0])
                       if "lfr" in batch else None)
                imgs, titles = [], []
                for i in range(0, pv.shape[0], max(pv.shape[0] // 4, 1)):
                    ref_layout = lambda a: np.moveaxis(
                        a[i], -1, 0).reshape(2, 10, *a.shape[1:3])
                    # denormalize the input frame (callbacks.py:132)
                    imgs.append(np.clip(
                        frames[i, :, :, 0] * 0.165 + 0.153, 0, 1))
                    imgs += [event_frame_rgb(ref_layout(gv)),
                             event_frame_rgb(ref_layout(pv))]
                    titles += [f"input f{i}", f"gt f{i}", f"pred f{i}"]
                if lfr is not None:
                    rng_ = np.ptp(lfr[0]) or 1.0
                    imgs.append((lfr[0, :, :, 0] - lfr[0].min()) / rng_)
                    titles.append("lfr f0")
                os.makedirs(op.join(work_dir, "previews"), exist_ok=True)
                batch_show(imgs, cols=3, titles=titles,
                           save_path=op.join(work_dir, "previews",
                                             f"epoch{epoch}.png"))
            for k, v in m.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n_b += 1
            if args.max_steps_per_epoch and n_b >= args.max_steps_per_epoch:
                break
        agg = {k: v / max(n_b, 1) for k, v in agg.items()}
        agg["epoch"] = epoch
        metrics_log.write(json.dumps({"eval": agg}) + "\n")
        metrics_log.flush()
        logger.info("eval epoch %d: %s", epoch,
                    {k: round(v, 4) for k, v in agg.items()})
        f1 = agg.get("BinaryMatchF1_sum_c", 0.0)
        # monitor val_BinaryMatchF1_sum_c, mode max (reference: main.py:22-29)
        if f1 > best_f1:
            best_f1 = f1
            save_checkpoint(op.join(ckpt_dir, f"best-epoch={epoch}"), state)
        save_checkpoint(op.join(ckpt_dir, "last"), state)
        return agg

    if args.test_only:
        run_eval(state, -1)
        return

    for epoch in range(args.max_epochs):
        t0 = time.time()
        batches = iterate_batches(train_ds, args.batch_size, shuffle=True,
                                  seed=args.seed + epoch,
                                  num_workers=args.num_workers)
        for i, batch in enumerate(device_prefetch(batches, mesh)):
            state, logs = train_step(state, batch)
            if i % args.log_frequency == 0:
                line = {k: float(v) for k, v in logs.items()}
                line.update(epoch=epoch, step=i)
                metrics_log.write(json.dumps({"train": line}) + "\n")
                metrics_log.flush()
                logger.info("epoch %d step %d loss %.4f", epoch, i,
                            line["loss"])
            if args.max_steps_per_epoch and i + 1 >= args.max_steps_per_epoch:
                break
        logger.info("epoch %d done in %.1fs", epoch, time.time() - t0)
        run_eval(state, epoch)


if __name__ == "__main__":
    main()
