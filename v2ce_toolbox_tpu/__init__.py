"""v2ce_toolbox_tpu — a TPU-native video→DVS-event simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ucsd-hdsi-dvs/V2CE-Toolbox (reference surveyed in /root/repo/SURVEY.md):

- Stage 1: a spectral-normalized 3D-UNet predicting per-pixel event-count
  voxel grids from pairs of consecutive video frames
  (reference: scripts/v2ce_3d.py, scripts/unet_2layer.py).
- Stage 2 ("LDATI"): a statistical sampler converting voxel counts into a
  timestamped (t, x, y, polarity) event stream
  (reference: scripts/LDATI.py).

Everything on the compute path is jit-compiled XLA with static shapes;
events live in fixed-capacity SoA buffers with validity masks instead of
ragged arrays; multi-chip scaling goes through jax.sharding meshes.
"""

__version__ = "0.1.0"

from v2ce_toolbox_tpu import config  # noqa: F401
