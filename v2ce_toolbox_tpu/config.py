"""Configuration dataclasses for the V2CE TPU pipeline.

Mirrors the CLI surface of the reference toolbox (reference: v2ce.py:283-301)
as typed, hashable configs so they can be closed over by jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

# DVS sensor geometry of the DAVIS346 the reference targets
# (reference: scripts/LDATI.py:329, v2ce.py:295-296).
SENSOR_HEIGHT = 260
SENSOR_WIDTH = 346
NUM_TIME_BINS = 10          # voxel channels predicted by stage 1 (per polarity)
NUM_POLARITIES = 2
SEQ_LEN = 16                # frames per model window (reference: v2ce.py:285)

# Normalization constants (reference: v2ce.py:53-54).
FRAME_MEAN = 0.153
FRAME_STD = 0.165


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Stage-1 3D-UNet hyperparameters (reference: scripts/v2ce_3d.py:12-24)."""

    in_channels: int = 2
    out_channels: int = NUM_POLARITIES * NUM_TIME_BINS
    num_encoders: int = 4
    base_num_channels: int = 32
    num_residual_blocks: int = 2
    skip_type: str = "concat"          # 'concat' | 'sum'
    norm: Optional[str] = "BN"
    spectral_norm: bool = True
    final_activation: str = "relu"
    # Compute dtype for conv FLOPs on TPU; params stay float32.
    compute_dtype: jnp.dtype = jnp.float32
    # 'pallas' routes the 3x3x3 stride-1 convs (91% of forward FLOPs)
    # through the implicit-GEMM Mosaic kernel (ops/conv3d_pallas.py);
    # 'xla' is the lax.conv path. 'd2'/'d2s' fold the depth taps into the
    # 2D conv's output channels (3*cout MXU lanes) with an L shift-add —
    # 'd2s' only on the cin>cout, cout<128 decoder layers (exact,
    # differentiable; measured per-layer in tools/perf_probe.py d2).
    # Training uses 'xla' (the Pallas kernel is forward-only — no custom
    # VJP yet).
    conv_impl: str = "xla"
    # Exact algebraic rewrite of the decoder conv1/projection over
    # concat(nearest_up2(x), skip): the upsampled branch is computed on
    # the coarse grid with folded sub-pixel kernels (4/9 branch FLOPs,
    # ~16% of the whole forward; ops/subpixel.py). Same parameters,
    # float-reassociation-level differences only. Default OFF: measured
    # 78 ms vs 51 ms per window on v5e — XLA lowers the small folded
    # (3,2,2) convs + parity interleave worse than one big conv despite
    # the FLOP cut (tools/perf_probe.py model, round 2).
    subpixel_decoder: bool = False
    # Which sub-pixel formulation the decoder blocks use when
    # subpixel_decoder is on (ops/subpixel.py): 'split' = four folded
    # (3,2,2) convs (4/9 FLOPs, 25% MXU lane fill — the round-2 loser),
    # 'wfold' = W parity in cout (2/3 FLOPs, 50% fill, free W
    # interleave), 'pfold' = both parities in cout (direct dot volume on
    # the coarse grid at FULL lane fill, no upsample/concat
    # materialization, interleave = one small transpose), 'pallas' =
    # the fused Mosaic kernel (ops/decoder_pallas.py: up + concat +
    # conv1 + residual projection in one coarse-grid kernel;
    # forward-only).
    subpixel_impl: str = "pfold"
    # How many decoder blocks (counted from the HIGHEST resolution, i.e.
    # the end of the decoder stack) use the sub-pixel rewrite when
    # subpixel_decoder is on; -1 = all. The deep decoder blocks already
    # run at 160-177 TF/s with the direct conv (PERF.md roofline) — only
    # the top-resolution, MXU-fill-bound blocks (decoder_2/decoder_3)
    # can gain from the coarse-grid reformulation, whose conv geometry
    # measures 57-78 TF/s (tools/perf_probe.py fused_geometry).
    subpixel_blocks: int = -1
    # Decoder blocks read (upsampled, skip) as two tensors and slice the
    # conv1/projection kernels across the halves instead of materializing
    # the 1.5x-channel concat (same parameter tree; float-reassociation
    # differences only). Measured in-model on v5e (tools/perf_probe.py
    # model_variants, round 3).
    decoder_split: bool = False
    # 'cm' emits the prediction in channel-major (B, L, 20, H, W) — the
    # layout stage 2 consumes — by running the 1x1 pred conv in NDCHW
    # form, replacing the driver's out-of-jit transpose (TPU tiling pads
    # the channels-minor (.., 20) f32 output 6.4x; W-minor pads 1.1x).
    out_layout: str = "cl"             # 'cl' | 'cm'
    # Rematerialize residual-block activations in the backward pass
    # (training memory saver; no effect on inference).
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Stage-2 LDATI sampler settings (reference: scripts/LDATI.py:126-214).

    The reference sizes its "additional events" buffer by the *global max*
    voxel count at runtime (LDATI.py:169-171) — a data-dependent shape. We
    use a static per-voxel cap plus overflow accounting so the whole sampler
    stays inside one XLA graph.
    """

    fps: int = 30
    additional_events_strategy: str = "slope"   # 'none' | 'random' | 'slope'
    pooling_type: str = "none"                   # 'none' | 'avg' | 'weighted'
    pooling_kernel_size: int = 3
    bidirectional: bool = False
    max_events_per_voxel: int = 32               # static cap replacing max(y)
    event_capacity: int = 1 << 19                # per-frame SoA buffer slots
    # v3-core capacity knobs (overflow lands in `dropped` exactly):
    cap_bin: int = 1 << 14        # chain events kept per (frame, bin) row
    multi_cap: int = 4096         # multi-event voxel pool per row
    sort_cap: Optional[int] = 1 << 14  # pre-sort row compaction width
    use_gen_compact: bool = True  # fuse generation + chain compaction

    def sample_kwargs(self, fps: Optional[int] = None) -> dict:
        """kwargs for ops.ldati.sample_events (everything but voxels/key).

        `fps` overrides the sampler-local default — pipeline call sites
        pass their PipelineConfig.fps so frame offsets and sampled
        timestamps can never disagree on the frame period."""
        return dict(
            fps=self.fps if fps is None else fps,
            additional_events_strategy=self.additional_events_strategy,
            pooling_type=self.pooling_type,
            pooling_kernel_size=self.pooling_kernel_size,
            bidirectional=self.bidirectional,
            max_events_per_voxel=self.max_events_per_voxel,
            capacity=self.event_capacity,
            cap_bin=self.cap_bin, multi_cap=self.multi_cap,
            sort_cap=self.sort_cap,
            use_gen_compact=self.use_gen_compact,
        )


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end inference settings (reference: v2ce.py:283-301)."""

    infer_type: str = "center"    # 'center' | 'pano'
    seq_len: int = SEQ_LEN
    height: int = SENSOR_HEIGHT
    width: int = SENSOR_WIDTH
    batch_size: int = 1
    fps: int = 30
    max_frame_num: int = 1800
    ceil: int = 10
    upper_bound_percentile: int = 98
    vis_keep_polarity: bool = True
    stage2_batch_size: int = 24
    write_event_frame_video: bool = True
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    sampler: SamplerConfig = dataclasses.field(default_factory=SamplerConfig)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: train/main.py:85-195)."""

    lr: float = 1e-3
    weight_decay: float = 1e-5
    lr_scheduler: Optional[str] = "step"   # 'step' | 'cosine' | None
    lr_decay_steps: int = 20
    lr_decay_rate: float = 0.5
    lr_decay_min_lr: float = 1e-5
    batch_size: int = 2
    max_epochs: int = 100
    seed: int = 1234
    loss: str = "ef+pyramid"
    ef_type: str = "c+cl"            # 'only_c' | 'cl' | 'c+cl'
    add_base_loss: bool = False      # pyramid loss includes the unpooled MSE
    metrics: Tuple[str, ...] = (
        "BinaryMatch_raw",
        "BinaryMatch_sum_c",
        "BinaryMatch_sum_cp",
        "BinaryMatchF1_raw",
        "BinaryMatchF1_sum_c",
        "BinaryMatchF1_sum_cp",
        "PoolMSE_2",
        "PoolMSE_4",
    )
