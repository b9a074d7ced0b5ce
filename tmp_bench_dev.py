"""Throwaway: bench.py device portion only (no CLI), for the capacity-clamp A/B."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp
from v2ce_toolbox_tpu.config import ModelConfig, SamplerConfig
from v2ce_toolbox_tpu.models import V2ce3d
from v2ce_toolbox_tpu.ops.ldati import sample_events
from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs
from v2ce_toolbox_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
print(f"devices: {jax.devices()}")
seq_len, h, w = 16, 260, 346
scfg = SamplerConfig()
model = V2ce3d(config=ModelConfig())
rng = np.random.RandomState(0)
frames0 = jnp.asarray(rng.rand(1, seq_len + 1, h, w).astype(np.float32))
variables = model.init(jax.random.key(0), frames0[:, :3, :, :, None].repeat(2, -1),
                       train=False)

@jax.jit
def fwd(frames):
    units = normalize_pairs(frames)
    return model.apply(variables, units, train=False)

from v2ce_toolbox_tpu.pipeline.driver import _flatten_chunk_stream

offsets_us = jnp.asarray((np.arange(seq_len) / 30 * 1e6).astype(np.int32))

@jax.jit
def sample(voxels, key):
    v = jnp.transpose(voxels[0], (0, 3, 1, 2)).reshape(seq_len, 2, 10, h, w)
    stream = sample_events(
        v, key, fps=30,
        additional_events_strategy=scfg.additional_events_strategy,
        max_events_per_voxel=scfg.max_events_per_voxel,
        capacity=scfg.event_capacity)
    words, kept, side_key, n_side, side_total = _flatten_chunk_stream(
        stream, offsets_us, seq_len)
    return ((words % 97).sum().astype(jnp.int32)
            + (side_key % 83).sum() + n_side + side_total
            + kept + stream.dropped.sum()).astype(jnp.float32)

n_iters = 20

def run(n, key):
    acc = jnp.zeros((), jnp.float32)
    for i in range(n):
        voxels = fwd(frames0 + acc * 1e-12)
        acc = acc + sample(voxels, jax.random.fold_in(key, i)) * 1e-20
    return float(np.asarray(acc))

key = jax.random.key(0)
_ = run(2, key)
t0 = time.time()
total = run(n_iters, key)
elapsed = max(time.time() - t0, 1e-9)
assert np.isfinite(total)
print(f"device e2e: {n_iters * seq_len / elapsed:.2f} fps/chip "
      f"({elapsed / n_iters * 1e3:.2f} ms/window)")
