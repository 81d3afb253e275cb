"""CLI argument -> config mapping tests (the reference's knob surface,
config.py:18-73, as flags)."""
import dataclasses

from sisr_tpu.cli.train import build_parser, config_from_args
from sisr_tpu.config import INF


def _cfg(argv):
    return config_from_args(build_parser().parse_args(argv))


def test_defaults_match_reference_knobs():
    cfg = _cfg([])
    assert cfg.batch_size == 16 and cfg.num_epochs == 3
    assert cfg.lr == 1e-5 and cfg.lr_decay
    assert cfg.generator.use_sn
    assert cfg.replay.max_len == 1000 and cfg.replay.sample_ratio == 0.01
    assert cfg.scale_factor == 2


def test_progressive_and_freeze_flags():
    cfg = _cfg(["--progressive-suffix", "1", "--freeze-prefix",
                "--freeze-upscale"])
    assert cfg.progressive_suffix == 1
    assert cfg.freeze_prefix and cfg.freeze_upscale and not cfg.freeze_end
    assert cfg.scale_factor == 4


def test_unsupervised_preset():
    cfg = _cfg(["--preset", "x8", "--unsupervised", "--dataset", "flickr"])
    assert cfg.content_loss_on_lr
    assert cfg.scale_factor == 8
    assert cfg.windows.identity == (0, INF)
    assert cfg.windows.content == (0, 0)


def test_fused_steps_forces_device_replay():
    cfg = _cfg(["--fused-steps", "8"])
    assert cfg.fused_steps == 8
    assert not cfg.replay.host_offload


def test_ramp_preset_windows():
    cfg = _cfg(["--preset", "x4_ramp"])
    assert cfg.windows.identity == (0, 1)
    assert cfg.windows.adv_g == (1, INF)
    assert cfg.scale_factor == 4


def test_ramp_epoch_flag_moves_windows():
    cfg = _cfg(["--preset", "x4_ramp", "--ramp-epoch", "3"])
    assert cfg.windows.identity == (0, 3)
    assert cfg.windows.adv_g == (3, INF)
    assert cfg.windows.adv_d == (3, INF)
    assert cfg.windows.content == (3, INF)
    # the knob belongs to x4_ramp only; other presets ignore it
    cfg2 = _cfg(["--preset", "x2_mse", "--ramp-epoch", "3"])
    assert cfg2.windows.identity == (0, INF)


def test_pixel_content_flag_swaps_windows():
    cfg = _cfg(["--preset", "x2_gan", "--pixel-content"])
    assert cfg.windows.content == (0, 0)
    assert cfg.windows.identity == (0, INF)
    assert cfg.windows.adv_g == (0, INF)
    cfg2 = _cfg(["--preset", "progressive_x2_x4", "--pixel-content"])
    assert cfg2.windows.identity == (0, INF)


def test_content_extractor_flags():
    cfg = _cfg(["--content-extractor", "dfeat", "--dfeat-taps", "0,2",
                "--dfeat-scale", "2.5"])
    assert cfg.content_extractor == "dfeat"
    assert cfg.dfeat_taps == (0, 2)
    assert cfg.dfeat_scale == 2.5
    assert _cfg([]).content_extractor == "vgg"


def test_d_ladder_flags():
    cfg = _cfg(["--dataset", "mnist", "--d-features", "64,64,128,128",
                "--d-strides", "1,2,1,2"])
    assert cfg.d_features == (64, 64, 128, 128)
    assert cfg.d_strides == (1, 2, 1, 2)
    d = cfg.discriminator()  # mnist 28x28 passes the divisibility contract
    assert d.fc_in == (28 // 4) ** 2 * 128


def test_no_sn_flag():
    cfg = _cfg(["--no-sn"])
    assert not cfg.generator.use_sn
