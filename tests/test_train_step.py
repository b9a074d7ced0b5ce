"""Training-step integration tests on the virtual 8-device CPU mesh."""

import sys

import numpy as np

from tests import conftest as _cf  # noqa: F401  (forces cpu mesh)

if _cf.REPO_ROOT not in sys.path:
    sys.path.insert(0, _cf.REPO_ROOT)


def test_dryrun_multichip_8():
    """The driver's multi-chip surface: full train step (generator + GAN)
    jitted over an 8-device mesh, one real step."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_train_main_smoke(tmp_path):
    """One truncated epoch of the training driver on dummy packets."""
    import json

    import train_main
    from v2ce_toolbox_tpu.data.dummy_data_gen import generate

    data_dir = str(tmp_path / "data")
    log_dir = str(tmp_path / "logs")
    # 20 packets -> 16 train / 2 val / 2 test under the 0.8/0.1/0.1 split
    generate(data_dir, num_packets=20, height=32, width=40,
             events_per_frame=64)
    train_main.main([
        "--data_dir", data_dir,
        "--log_dir", log_dir,
        "--exp_name", "smoke",
        "--batch_size", "2",
        "--seq_len", "2",
        "--max_epochs", "1",
        "--max_steps_per_epoch", "2",
        "--num_workers", "1",
        "--devices", "1",   # multi-device path is covered by the dryrun test
        "--loss", "pyramid", "ef",
        "--gan_k", "1",
        "--record_predictions", "1",
    ])
    lines = [json.loads(line) for line in
             open(tmp_path / "logs" / "smoke" / "metrics.jsonl")]
    train_lines = [x["train"] for x in lines if "train" in x]
    eval_lines = [x["eval"] for x in lines if "eval" in x]
    assert train_lines and eval_lines
    assert np.isfinite(train_lines[0]["loss"])
    assert "BinaryMatchF1_sum_c" in eval_lines[0]
    # checkpoints written
    assert (tmp_path / "logs" / "smoke" / "checkpoints" / "last").exists()
    # recorder dump written (stage-2 eval input)
    rec_dir = tmp_path / "logs" / "smoke" / "recorder"
    import os

    recs = os.listdir(rec_dir)
    assert recs
    import pickle

    rec = pickle.load(open(rec_dir / recs[0], "rb"))
    assert rec["pred_voxels"].shape == rec["gt_voxels"].shape
    # preview panels are written by default each eval epoch
    assert (tmp_path / "logs" / "smoke" / "previews" / "epoch0.png").exists()


def test_train_main_8_devices(tmp_path):
    """The full training driver end-to-end on the 8-device mesh: loader
    sharding, train step collectives, eval, and checkpointing all run under
    the mesh (round-2 gap: only dryrun_multichip exercised multi-device)."""
    import json

    import train_main
    from v2ce_toolbox_tpu.data.dummy_data_gen import generate

    data_dir = str(tmp_path / "data")
    log_dir = str(tmp_path / "logs")
    # 80 packets -> 8 val items: one full global batch of 8 for eval
    generate(data_dir, num_packets=80, height=32, width=40,
             events_per_frame=64)
    train_main.main([
        "--data_dir", data_dir,
        "--log_dir", log_dir,
        "--exp_name", "mesh8",
        "--batch_size", "8",
        "--seq_len", "2",
        "--max_epochs", "1",
        "--max_steps_per_epoch", "1",
        "--num_workers", "1",
        "--devices", "8",
        "--base_num_channels", "8",
        "--num_encoders", "2",
        "--loss", "pyramid",
        "--dump_previews", "false",
    ])
    lines = [json.loads(line) for line in
             open(tmp_path / "logs" / "mesh8" / "metrics.jsonl")]
    train_lines = [x["train"] for x in lines if "train" in x]
    eval_lines = [x["eval"] for x in lines if "eval" in x]
    assert train_lines and np.isfinite(train_lines[0]["loss"])
    assert eval_lines and "BinaryMatchF1_sum_c" in eval_lines[0]
    assert (tmp_path / "logs" / "mesh8" / "checkpoints" / "last").exists()


def test_train_main_resume_and_previews(tmp_path):
    """Resume from a checkpoint (--load_dir) and dump previews."""
    import json

    import train_main
    from v2ce_toolbox_tpu.data.dummy_data_gen import generate

    data_dir = str(tmp_path / "data")
    log_dir = str(tmp_path / "logs")
    generate(data_dir, num_packets=20, height=32, width=40,
             events_per_frame=64)
    base_args = [
        "--data_dir", data_dir, "--log_dir", log_dir,
        "--batch_size", "2", "--seq_len", "2", "--max_epochs", "1",
        "--max_steps_per_epoch", "1", "--num_workers", "1",
        "--devices", "1", "--loss", "pyramid",
    ]
    train_main.main(base_args + ["--exp_name", "first",
                                 "--record_predictions", "1",
                                 "--dump_previews", "true"])
    assert (tmp_path / "logs" / "first" / "previews" / "epoch0.png").exists()
    ckpt_dir = str(tmp_path / "logs" / "first" / "checkpoints")
    train_main.main(base_args + ["--exp_name", "resumed",
                                 "--load_dir", ckpt_dir])
    lines = [json.loads(line) for line in
             open(tmp_path / "logs" / "resumed" / "metrics.jsonl")]
    assert any("train" in x for x in lines)


def test_dryrun_multihost_2x4():
    """Multi-host data parallelism (reference capability: multi-node DDP,
    train/main.py:192-195): 2 Gloo-backed processes x 4 virtual CPU
    devices produce the same train-step loss as one 8-device process."""
    import __graft_entry__ as g

    g.dryrun_multihost(2, 4, port=23411)


def test_train_loss_descends_50_steps(tmp_path):
    """Convergence evidence for the composed optimization: 50 steps on
    dummy packets with the FULL default loss stack (pyramid + gan + ef +
    ef_splitp + compensation, train_main defaults mirroring the
    reference's run config) must show a descending train-loss trend
    (reference trains this stack for 100 epochs, train/main.py:191-195).
    Trend, not monotonicity: the GAN term injects per-step noise."""
    import json

    import train_main
    from v2ce_toolbox_tpu.data.dummy_data_gen import generate

    data_dir = str(tmp_path / "data")
    log_dir = str(tmp_path / "logs")
    # 128 packets -> ~102 train items -> 51 steps at batch 2 in one epoch
    generate(data_dir, num_packets=128, height=32, width=40,
             events_per_frame=64)
    train_main.main([
        "--data_dir", data_dir,
        "--log_dir", log_dir,
        "--exp_name", "descend",
        "--batch_size", "2",
        "--seq_len", "2",
        "--max_epochs", "1",
        "--max_steps_per_epoch", "50",
        "--log_frequency", "1",       # every step's loss
        "--num_workers", "1",
        "--devices", "1",
        "--base_num_channels", "8",   # CPU-host-sized model; losses default
        "--num_encoders", "2",
        "--gan_k", "1",
        "--dump_previews", "false",
    ])
    lines = [json.loads(line) for line in
             open(tmp_path / "logs" / "descend" / "metrics.jsonl")]
    losses = [x["train"]["loss"] for x in lines if "train" in x]
    assert len(losses) == 50
    assert np.isfinite(losses).all()
    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    # descending trend with real headroom, not noise
    assert last < 0.9 * first, (first, last)
