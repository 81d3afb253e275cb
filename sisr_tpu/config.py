"""Experiment configuration: frozen dataclasses mirroring every knob of the
reference's executable config module (reference config.py:18-73), without the
import-time side effects or interactive prompts (config.py:310, utils.py:91).

Every reference knob has a named field here; the five canonical workloads from
BASELINE.json are exposed as preset constructors at the bottom.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Dataset geometry (reference config.py:203-217)
# ---------------------------------------------------------------------------

#: dataset -> ((channels, height, width) of the native HR crop, max scale)
DATASET_GEOMETRY = {
    "celeba": ((3, 128, 128), 4),
    "flickr": ((3, 256, 256), 8),
    "mnist": ((1, 28, 28), 2),
    # synthetic procedural dataset for tests/benchmarks (no reference analog)
    "synthetic": ((3, 128, 128), 4),
    # minimal geometry for fast CPU tests
    "tiny": ((3, 16, 16), 2),
}


def resolve_geometry(dataset: str, scale_factor: int) -> Tuple[Tuple[int, int, int], Tuple[int, int, int]]:
    """HR/LR shapes for a dataset at a given total scale factor.

    Replicates reference config.py:215-217: ``reduce = scale_max // scale``
    shrinks the HR target so the LR size stays constant across scales.
    Returns ((C, Hh, Wh), (C, Hl, Wl)).
    """
    (c, h, w), scale_max = DATASET_GEOMETRY[dataset]
    reduce = max(1, scale_max // scale_factor)
    hr = (c, h // reduce, w // reduce)
    lr = (c, hr[1] // scale_factor, hr[2] // scale_factor)
    if hr[1] % scale_factor or hr[2] % scale_factor:
        raise ValueError(f"images too small for scale: hr={hr} lr={lr}")
    return hr, lr


# ---------------------------------------------------------------------------
# Loss-weight schedule windows (reference config.py:124-166)
# ---------------------------------------------------------------------------

INF = math.inf


@dataclasses.dataclass(frozen=True)
class LossWindows:
    """Epoch-windowed step functions gating each loss term.

    Each window is a half-open epoch interval [start, end). The reference
    implements these as closures over tuples (config.py:126-133); editing the
    windows between runs is how the "gradual adversarial weight ramp"
    (reference README.md:55) is driven.
    """

    adv_g: Tuple[float, float] = (0, INF)
    adv_d: Tuple[float, float] = (0, INF)
    content: Tuple[float, float] = (0, INF)   # VGG-feature content loss
    identity: Tuple[float, float] = (0, 0)     # plain pixel MSE

    def __post_init__(self):
        # reference config.py:154 asserts content/identity never both active
        lo = max(self.content[0], self.identity[0])
        hi = min(self.content[1], self.identity[1])
        if lo < hi:
            raise ValueError("content and identity windows must be disjoint")

    @staticmethod
    def _in(window: Tuple[float, float], epoch: int) -> bool:
        return window[0] <= epoch < window[1]

    def weights(self, epoch: int, content_loss_on_lr: bool):
        """(w_adv_g, w_adv_d, w_cont, cont_kind) for this epoch.

        cont_kind: 'vgg' | 'identity' | None. Constants replicate reference
        config.py:137-163 bit for bit (5e-2/5e-3 adv-G, 1.0 adv-D, and the
        x10 unsupervised factor on the content weight).
        """
        w_adv_g = 0.0
        if self._in(self.adv_g, epoch):
            w_adv_g = 5e-3 if content_loss_on_lr else 5e-2
        w_adv_d = 1.0 if self._in(self.adv_d, epoch) else 0.0
        f = 10.0 if content_loss_on_lr else 1.0
        if self._in(self.content, epoch):
            return w_adv_g, w_adv_d, 1.0 * f, "vgg"
        if self._in(self.identity, epoch):
            return w_adv_g, w_adv_d, 10.0 * f, "identity"
        return w_adv_g, w_adv_d, 0.0, None


# ---------------------------------------------------------------------------
# Model / training configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """SRGAN generator hyperparameters (reference model_generator.py:23-63,
    assembled with these exact values at config.py:79-81)."""

    n_blocks: int = 16
    n_features_block: int = 64
    n_features_last: int = 256
    list_scales: Tuple[int, ...] = (2,)
    use_sn: bool = True
    input_channels: int = 3
    # number of grown GeneratorSuffix stages stacked on top (each adds x2).
    n_suffixes: int = 0
    # jax.checkpoint (rematerialization) over each residual block: trades
    # FLOPs for HBM on large spatial sizes. No reference analog.
    remat: bool = False
    # train-mode trunk as one VMEM-resident pallas kernel with a custom VJP
    # (ops/pallas/trunk_train.py). Single-device train path only — the GSPMD
    # mesh path keeps the unfused trunk (a custom call cannot be
    # auto-partitioned over the batch axis). No reference analog.
    fused_trunk: bool = False

    def __post_init__(self):
        if self.n_features_last % 4 != 0:
            raise ValueError("n_features_last must be divisible by 4")

    @property
    def scale(self) -> int:
        s = 1
        for x in self.list_scales:
            s *= x
        return s * (2 ** self.n_suffixes)


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """SRGAN discriminator (reference model_discriminator.py:19-53, values
    from config.py:81-82)."""

    input_shape: Tuple[int, int, int] = (3, 128, 128)  # (C, H, W) of HR
    list_n_features: Tuple[int, ...] = (64, 64, 128, 128, 256, 256, 512, 512)
    list_stride: Tuple[int, ...] = (1, 2, 1, 2, 1, 2, 1, 2)

    def __post_init__(self):
        for s in self.list_stride:
            if s not in (1, 2):
                raise ValueError("strides must be 1 or 2 (SRGAN paper)")
        if len(self.list_n_features) != len(self.list_stride):
            raise ValueError("feature/stride lists must match")
        _, h, w = self.input_shape
        down = 4 ** (sum(self.list_stride) - len(self.list_stride))
        if (w * h) % down != 0:
            raise ValueError("input spatial size must divide by total stride")

    @property
    def fc_in(self) -> int:
        _, h, w = self.input_shape
        down = 4 ** (sum(self.list_stride) - len(self.list_stride))
        return w * h * self.list_n_features[-1] // down

    @property
    def fc_mid(self) -> int:
        return self.list_n_features[-1] * 2


@dataclasses.dataclass(frozen=True)
class ReplayConfig:
    """Experience-replay buffer of old generated batches
    (reference config.py:48-54)."""

    max_len: int = 1000      # dis_list_old_len
    save_freq: int = 1       # dis_list_old_freq
    sample_ratio: float = 0.01  # dis_list_old_ratio
    host_offload: bool = True   # dis_list_old_cpu
    persist: bool = True        # dis_list_old_save

    @property
    def max_samples(self) -> int:
        """Static upper bound of replay batches per step (jit-static shape)."""
        return int(self.max_len * self.sample_ratio)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    dataset: str = "celeba"
    data_root: Optional[str] = None
    write_root: str = "./checkpoints/"

    generator: GeneratorConfig = GeneratorConfig()
    batch_size: int = 16          # reference config.py:42
    n_batch: int = -1             # cap on batches/epoch; -1 = full epoch
    num_epochs: int = 3           # reference config.py:46
    lr: float = 1e-5              # reference config.py:38
    # 10x exponential decay over the run; restarts at full base LR on every
    # resume (the reference rebuilds LambdaLR per run, config.py:170-180)
    lr_decay: bool = True
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    content_loss_on_lr: bool = False  # unsupervised / AmbientGAN mode
    vgg_mask: int = 0b01111       # reference config.py:104
    windows: LossWindows = LossWindows()
    replay: ReplayConfig = ReplayConfig()
    seed: Optional[int] = None    # None => draw from [1, 10000] like reference

    # progressive growth knob, reference config.py:18-21:
    #   0: load x2          1: load x2, add a stage -> x4
    #   2: load x4          3: load x4, add a stage -> x8
    #   4: load x8
    # None: use generator.n_suffixes directly with a plain load.
    progressive_suffix: Optional[int] = None
    # freeze the transplanted prefix when growing (reference GeneratorSuffix
    # freeze_prefix / Generator.freeze kwargs, model_generator.py:103-131)
    freeze_prefix: bool = False
    freeze_upscale: bool = False
    freeze_end: bool = False

    # path to an .npz from tools/port_vgg_weights.py; None => fixed random
    # feature extractor (documented fallback, models/vgg.py)
    vgg_weights: Optional[str] = None

    # which learned extractor serves the CONTENT window (the reference's
    # perceptual loss role, model_content_extractor.py:33-60):
    #   "vgg"   — MaskedVGG (pretrained weights via vgg_weights, else the
    #             fixed-random fallback)
    #   "dfeat" — discriminator-feature matching: L2 on D's own
    #             intermediate activations (models/discriminator.py
    #             discriminator_features). Needs no external weights —
    #             the egress-free learned perceptual loss. Works for
    #             1-channel data too (D's input is 1-channel there), so
    #             the reference's identity substitution doesn't apply.
    content_extractor: str = "vgg"
    # ladder blocks tapped by the dfeat extractor (post-activation);
    # defaults to the stride-1 blocks after each of the first three
    # stride-2 blocks: 128/256/512 features at 1/2, 1/4, 1/8 resolution —
    # a multi-scale spread like MaskedVGG(0b01111)'s pool taps
    dfeat_taps: Tuple[int, ...] = (1, 3, 5)
    # extra multiplier on the dfeat content weight: D activations are
    # BN-normalized (O(1)) where raw VGG features are O(10..100), so the
    # window's reference weight (1.0*f) may need rescaling to exert the
    # same pull against the adversarial term
    dfeat_scale: float = 1.0

    # opt-in 8x dihedral data augmentation for small datasets (no reference
    # analog; leak-free vs the held-out-last-batch split —
    # data/pipeline.DihedralAugmentedDataset)
    augment_dihedral: bool = False

    # opt-in uint8 transport for file datasets: train batches upload as
    # raw post-resize uint8 and normalize on-device (ops.resize.
    # device_normalize, the host pipeline's exact /255*2-1) — 4x less h2d
    # than fp32 and 4x less of the relay's per-upload host-RSS retention
    # (BENCH_NOTES round 5). No effect on procedural (synthetic) data.
    uint8_transport: bool = False

    # opt-in device-resident corpus: upload the train range to HBM once
    # and feed the step int32 index batches gathered on device — steady-
    # state h2d drops to 4 bytes/image and the relay's per-upload host
    # retention stops growing with epochs. Budget the HBM: corpus bytes =
    # n_train * H * W * C * itemsize (uint8 with uint8_transport). The
    # deterministic synthetic dataset is index-stable, so one materialized
    # pass is value-identical to per-epoch regeneration.
    device_data: bool = False

    # discriminator ladder (reference Discriminator args,
    # model_discriminator.py:19-24; SRGAN defaults from config.py:81-82).
    # Datasets whose HR size doesn't divide by the total stride (e.g. mnist
    # 28x28) need a shorter ladder — the reference asserts identically.
    d_features: Tuple[int, ...] = (64, 64, 128, 128, 256, 256, 512, 512)
    d_strides: Tuple[int, ...] = (1, 2, 1, 2, 1, 2, 1, 2)

    # TPU-specific (no reference analog). Parallelism has no knob here:
    # pass a jax.sharding.Mesh to train() — under GSPMD the sharded batch
    # axis also makes BN statistics global (sync BN; parallel/mesh.py:11-15).
    compute_dtype: str = "bfloat16"  # matmul/conv dtype; state stays fp32
    # >0: run K train iterations per compiled call (lax.scan driver with the
    # HBM-resident replay ring) — amortizes host dispatch; 0 = per-step loop.
    fused_steps: int = 0

    @property
    def scale_factor(self) -> int:
        # reference config.py:60: scale = prod(list_scales) * (4 if
        # suffix>=3 else 2 if suffix>=1 else 1)
        if self.progressive_suffix is not None:
            ps = self.progressive_suffix
            mult = 4 if ps >= 3 else 2 if ps >= 1 else 1
            base = 1
            for x in self.generator.list_scales:
                base *= x
            return base * mult
        return self.generator.scale

    def geometry(self):
        return resolve_geometry(self.dataset, self.scale_factor)

    def epoch_weights(self, epoch: int):
        """windows.weights() plus the reference's 1-channel substitution:
        gen_modules builds the content extractor as identity for 1-channel
        data (reference config.py:100-104), so the content window's 'vgg'
        kind resolves to 'identity' at the *content* weight (1.0*f) — the
        identity-window weight (10.0*f) is untouched. With
        content_extractor='dfeat' the content window resolves to the
        D-feature-matching extractor instead (any channel count — no
        substitution needed) at w_cont * dfeat_scale."""
        w_ag, w_ad, w_c, ck = self.windows.weights(
            epoch, self.content_loss_on_lr)
        if ck == "vgg":
            if self.content_extractor == "dfeat":
                return w_ag, w_ad, w_c * self.dfeat_scale, "dfeat"
            if self.geometry()[0][0] == 1:
                ck = "identity"
        return w_ag, w_ad, w_c, ck

    def discriminator(self) -> DiscriminatorConfig:
        hr, _ = self.geometry()
        return DiscriminatorConfig(input_shape=hr,
                                   list_n_features=self.d_features,
                                   list_stride=self.d_strides)


# ---------------------------------------------------------------------------
# The five canonical workloads (BASELINE.json "configs")
# ---------------------------------------------------------------------------


def preset_x2_mse(dataset: str = "celeba", **kw) -> TrainConfig:
    """Config 1: x2 generator, MSE-only pretrain (identity extractor).

    Matches the reference recipe 'MSE pretrain' (README.md:43): D and adv-G
    gated off, identity window open.
    """
    return TrainConfig(
        dataset=dataset,
        generator=GeneratorConfig(list_scales=(2,), n_suffixes=0),
        windows=LossWindows(adv_g=(0, 0), adv_d=(0, 0), content=(0, 0), identity=(0, INF)),
        **kw,
    )


def preset_x2_gan(dataset: str = "celeba", pixel_content: bool = False,
                  **kw) -> TrainConfig:
    """Config 2: x2 full adversarial G + D + MaskedVGG content loss.

    `pixel_content=True` swaps the VGG content window for the identity
    (plain pixel MSE) window. NOTE this is deliberately NOT the
    reference's 1-channel substitution (config.py:100-104): that one
    keeps the CONTENT window open with an identity extractor, i.e. pixel
    MSE at weight 1.0*f — `epoch_weights` reproduces it for mnist. The
    identity window used here carries weight 10.0*f (reference
    config.py:146-152), so the pixel anchor is 10x heavier — the point,
    for adversarial finetuning without pretrained VGG19 weights (see
    BENCH_NOTES on the zero-egress environment), is a strong anchor.
    """
    windows = (
        LossWindows(content=(0, 0), identity=(0, INF))
        if pixel_content else LossWindows()
    )
    return TrainConfig(
        dataset=dataset,
        generator=GeneratorConfig(list_scales=(2,), n_suffixes=0),
        windows=windows,
        **kw,
    )


def preset_x4_ramp(dataset: str = "flickr", ramp_epoch: int = 1, **kw) -> TrainConfig:
    """Config 3: x4 SRGAN with gradual adversarial-weight ramp: identity-MSE
    first, adversarial + VGG content from `ramp_epoch` on (README.md:55)."""
    return TrainConfig(
        dataset=dataset,
        generator=GeneratorConfig(list_scales=(2,), n_suffixes=1),
        windows=LossWindows(
            adv_g=(ramp_epoch, INF), adv_d=(ramp_epoch, INF),
            content=(ramp_epoch, INF), identity=(0, ramp_epoch),
        ),
        **kw,
    )


def preset_progressive_x2_to_x4(dataset: str = "celeba",
                                pixel_content: bool = False,
                                **kw) -> TrainConfig:
    """Config 4: progressive growth — load an x2 checkpoint, add one suffix,
    finetune (reference progressive_gan_suffix=1, config.py:18-21,94-96).
    `pixel_content` as in preset_x2_gan."""
    windows = (
        LossWindows(content=(0, 0), identity=(0, INF))
        if pixel_content else LossWindows()
    )
    return TrainConfig(
        dataset=dataset,
        generator=GeneratorConfig(list_scales=(2,), n_suffixes=1),
        windows=windows,
        **kw,
    )


def preset_x8(dataset: str = "flickr", unsupervised: bool = False, **kw) -> TrainConfig:
    """Config 5: x8, supervised or unsupervised (no-HR / AmbientGAN,
    reference config.py:24,128-133)."""
    windows = (
        LossWindows(content=(0, 0), identity=(0, INF))
        if unsupervised else LossWindows()
    )
    return TrainConfig(
        dataset=dataset,
        generator=GeneratorConfig(list_scales=(2,), n_suffixes=2),
        content_loss_on_lr=unsupervised,
        windows=windows,
        **kw,
    )


PRESETS = {
    "x2_mse": preset_x2_mse,
    "x2_gan": preset_x2_gan,
    "x4_ramp": preset_x4_ramp,
    "progressive_x2_x4": preset_progressive_x2_to_x4,
    "x8": preset_x8,
}
