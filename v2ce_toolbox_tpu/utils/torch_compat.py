"""Torch checkpoint -> JAX variables conversion for the V2CE stage-1 models.

The released reference checkpoint is a bare ``state_dict`` for
``V2ce3d`` (reference: v2ce.py:30-43). This module maps those keys onto the
flax variable tree of :class:`v2ce_toolbox_tpu.models.V2ce3d`:

  torch                                   flax
  ------------------------------------    -------------------------------
  UNet.head.conv3d.weight                 params/unet/head/conv/kernel
  UNet.encoders.{i}.conv1.weight          params/unet/encoder_{i}/conv1/kernel
  UNet.encoders.{i}.bn1.weight            params/unet/encoder_{i}/bn1/bn/scale
  UNet.encoders.{i}.bn1.running_mean      batch_stats/.../bn1/bn/mean
  UNet.encoders.{i}.downsample.0.weight   params/.../downsample_conv/kernel
  UNet.encoders.{i}.downsample.1.*        .../downsample_bn/bn/*
  UNet.resblocks.{i}.conv1.module.weight_bar  params/.../conv1/kernel_bar
  UNet.resblocks.{i}.conv1.module.weight_u/_v sn/.../conv1/{u,v}
  UNet.decoders.{i}.*                     likewise (conv1/conv2 SN'd)
  UNet.pred.conv3d.weight                 params/unet/pred/conv/kernel

Conv weights transpose from torch (O, I, *S) to channels-last (*S, I, O).
Spectral-norm (u, v) vectors are kept verbatim: they index the torch-order
(O, I*prod(S)) flattening, which SNConv reproduces exactly.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t2j_conv(w: np.ndarray) -> np.ndarray:
    """torch (O, I, *spatial) -> flax (*spatial, I, O)."""
    nsp = w.ndim - 2
    perm = tuple(range(2, 2 + nsp)) + (1, 0)
    return np.ascontiguousarray(np.transpose(w, perm))


class _TreeBuilder:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}
        self.sn: Dict[str, Any] = {}

    @staticmethod
    def _set(tree: Dict[str, Any], path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, dtype=np.float32)

    def conv(self, sd: Mapping[str, np.ndarray], tkey: str, path, sn: bool):
        if sn:
            self._set(self.params, path + ("kernel_bar",),
                      _t2j_conv(sd[f"{tkey}.module.weight_bar"]))
            self._set(self.sn, path + ("u",), sd[f"{tkey}.module.weight_u"])
            self._set(self.sn, path + ("v",), sd[f"{tkey}.module.weight_v"])
            if f"{tkey}.module.bias" in sd:
                self._set(self.params, path + ("bias",), sd[f"{tkey}.module.bias"])
        else:
            self._set(self.params, path + ("kernel",), _t2j_conv(sd[f"{tkey}.weight"]))
            if f"{tkey}.bias" in sd:
                self._set(self.params, path + ("bias",), sd[f"{tkey}.bias"])

    def bn(self, sd: Mapping[str, np.ndarray], tkey: str, path):
        self._set(self.params, path + ("bn", "scale"), sd[f"{tkey}.weight"])
        self._set(self.params, path + ("bn", "bias"), sd[f"{tkey}.bias"])
        self._set(self.batch_stats, path + ("bn", "mean"), sd[f"{tkey}.running_mean"])
        self._set(self.batch_stats, path + ("bn", "var"), sd[f"{tkey}.running_var"])

    def residual_block(self, sd, tkey: str, path, sn: bool, norm: bool):
        self.conv(sd, f"{tkey}.conv1", path + ("conv1",), sn)
        self.conv(sd, f"{tkey}.conv2", path + ("conv2",), sn)
        if norm:
            self.bn(sd, f"{tkey}.bn1", path + ("bn1",))
            self.bn(sd, f"{tkey}.bn2", path + ("bn2",))
        # Every reference residual block carries a projection shortcut
        # (submodules.py:244-247 — its stride==1 guard never fires).
        self.conv(sd, f"{tkey}.downsample.0", path + ("downsample_conv",), False)
        self.bn(sd, f"{tkey}.downsample.1", path + ("downsample_bn",))


def convert_v2ce3d_state_dict(
    sd: Mapping[str, np.ndarray],
    num_encoders: int = 4,
    num_residual_blocks: int = 2,
) -> Dict[str, Any]:
    """Convert a torch V2ce3d state_dict (values as numpy arrays) to flax
    variables {'params', 'batch_stats', 'sn'} for models.V2ce3d."""
    tb = _TreeBuilder()
    tb.conv(sd, "UNet.head.conv3d", ("unet", "head", "conv"), False)
    for i in range(num_encoders):
        tb.residual_block(sd, f"UNet.encoders.{i}", ("unet", f"encoder_{i}"),
                          sn=False, norm=True)
    for i in range(num_residual_blocks):
        tb.residual_block(sd, f"UNet.resblocks.{i}", ("unet", f"resblock_{i}"),
                          sn=True, norm=True)
    for i in range(num_encoders):
        tb.residual_block(sd, f"UNet.decoders.{i}", ("unet", f"decoder_{i}"),
                          sn=True, norm=True)
    tb.conv(sd, "UNet.pred.conv3d", ("unet", "pred", "conv"), False)
    return {"params": tb.params, "batch_stats": tb.batch_stats, "sn": tb.sn}


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict to plain numpy (torch import stays local so
    the package has no hard torch dependency)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``v2ce_3d.pt`` checkpoint and convert it
    (reference: v2ce.py:40 loads it with torch.load)."""
    import torch  # local import: only needed when converting checkpoints

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_v2ce3d_state_dict(state_dict_to_numpy(sd))
