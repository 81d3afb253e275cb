"""Training CLI — the non-interactive replacement for `python3 train.py`.

Every knob of the reference's executable config module (reference
config.py:18-73) is a flag here; the two interactive input() prompts
(checkpoint path config.py:310, save confirm utils.py:98) become
--checkpoint and --no-save.

Examples:
  python -m sisr_tpu.cli.train --preset x2_mse --dataset synthetic \
      --num-epochs 1 --n-batch 8 --batch-size 4
  python -m sisr_tpu.cli.train --preset x2_gan --dataset celeba \
      --data-root /data/celeba --checkpoint ./checkpoints/0
  python -m sisr_tpu.cli.train --progressive-suffix 1 --checkpoint ck_x2 \
      --freeze-prefix   # grow x2 -> x4, finetune the new stage
"""
from __future__ import annotations

import argparse
import dataclasses

from sisr_tpu import config as C
from sisr_tpu.checkpoint import load_checkpoint


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="sisr_tpu trainer")
    ap.add_argument("--preset", choices=sorted(C.PRESETS), default="x2_gan")
    ap.add_argument("--dataset", default=None,
                    help="celeba | flickr | mnist | synthetic")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--write-root", default="./checkpoints/")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debug / no-chip fallback)")
    ap.add_argument("--checkpoint", default=None,
                    help="path of a checkpoint to resume/transplant from")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--n-batch", type=int, default=None,
                    help="cap batches/epoch (-1 = full epoch)")
    ap.add_argument("--num-epochs", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--no-lr-decay", action="store_true")
    ap.add_argument("--augment-dihedral", action="store_true",
                    help="8x rotation/mirror augmentation (leak-free vs the "
                         "held-out split; for small datasets)")
    ap.add_argument("--uint8-transport", action="store_true",
                    help="upload file-dataset train batches as raw uint8 and "
                         "normalize on-device (4x less h2d + 4x less relay "
                         "host-RSS retention; no effect on synthetic data)")
    ap.add_argument("--device-data", action="store_true",
                    help="keep the train corpus resident in HBM and feed the "
                         "step index batches (h2d -> 4 bytes/image; budget "
                         "corpus bytes vs the 16 GB v5e HBM)")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--progressive-suffix", type=int, default=None,
                    choices=[0, 1, 2, 3, 4])
    ap.add_argument("--freeze-prefix", action="store_true")
    ap.add_argument("--freeze-upscale", action="store_true")
    ap.add_argument("--freeze-end", action="store_true")
    ap.add_argument("--unsupervised", action="store_true",
                    help="content loss on LR (AmbientGAN mode)")
    ap.add_argument("--pixel-content", action="store_true",
                    help="x2_gan/progressive presets: use the identity "
                         "(pixel-MSE) content window instead of VGG — the "
                         "reference's own extractor substitution "
                         "(config.py:100-104)")
    ap.add_argument("--ramp-epoch", type=int, default=None,
                    help="x4_ramp only: epoch at which the adversarial + "
                         "content windows open (identity-MSE before; the "
                         "reference's editable-window recipe, README.md:55). "
                         "NEGATIVE values are RELATIVE to the checkpoint's "
                         "epoch: -K means 'K identity epochs after resume, "
                         "then adversarial' — loss windows are absolute "
                         "epochs, so an absolute ramp below the resume "
                         "epoch silently never ramps (and one far above "
                         "it trains identity-only forever)")
    ap.add_argument("--vgg-weights", default=None,
                    help=".npz from tools/port_vgg_weights.py")
    ap.add_argument("--content-extractor", default=None,
                    choices=["vgg", "dfeat"],
                    help="extractor for the CONTENT window: vgg (default; "
                         "MaskedVGG) or dfeat — feature matching on the "
                         "discriminator's own activations, the egress-free "
                         "learned perceptual loss")
    ap.add_argument("--dfeat-taps", default=None,
                    help="comma-separated D ladder block indices the dfeat "
                         "extractor taps (default 1,3,5)")
    ap.add_argument("--dfeat-scale", type=float, default=None,
                    help="extra multiplier on the dfeat content weight")
    ap.add_argument("--d-features", default=None,
                    help="comma-separated discriminator ladder features "
                         "(default SRGAN 64,64,128,128,256,256,512,512); "
                         "datasets whose HR size doesn't divide the total "
                         "stride (mnist 28x28) need a shorter ladder, e.g. "
                         "--d-features 64,64,128,128 --d-strides 1,2,1,2")
    ap.add_argument("--d-strides", default=None,
                    help="comma-separated discriminator ladder strides")
    ap.add_argument("--compute-dtype", default=None,
                    choices=["bfloat16", "float32"])
    ap.add_argument("--no-sn", action="store_true",
                    help="disable spectral norm on the generator")
    ap.add_argument("--no-save", action="store_true")
    ap.add_argument("--no-plot-first", action="store_true",
                    help="skip the before-training snapshot (reference "
                         "plot_first, config.py:65)")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard the batch over all visible devices")
    ap.add_argument("--fused-steps", type=int, default=None,
                    help="run K iterations per compiled call (HBM replay "
                         "ring; fastest single-chip path)")
    ap.add_argument("--device-replay", action="store_true",
                    help="HBM-resident replay ring (dis_list_old_cpu=False)")
    ap.add_argument("--synthetic-len", type=int, default=512)
    return ap


def config_from_args(args) -> C.TrainConfig:
    kw = {}
    if args.dataset:
        kw["dataset"] = args.dataset
    if args.preset == "x8":
        cfg = C.PRESETS[args.preset](unsupervised=args.unsupervised, **kw)
    elif args.preset == "x4_ramp" and args.ramp_epoch is not None:
        cfg = C.PRESETS[args.preset](ramp_epoch=args.ramp_epoch, **kw)
    elif args.preset in ("x2_gan", "progressive_x2_x4") and args.pixel_content:
        cfg = C.PRESETS[args.preset](pixel_content=True, **kw)
    else:
        cfg = C.PRESETS[args.preset](**kw)

    updates = {}
    for field, val in [
        ("data_root", args.data_root), ("write_root", args.write_root),
        ("batch_size", args.batch_size), ("n_batch", args.n_batch),
        ("num_epochs", args.num_epochs), ("lr", args.lr),
        ("seed", args.seed), ("progressive_suffix", args.progressive_suffix),
        ("vgg_weights", args.vgg_weights),
        ("content_extractor", args.content_extractor),
        ("dfeat_scale", args.dfeat_scale),
        ("compute_dtype", args.compute_dtype),
    ]:
        if val is not None:
            updates[field] = val
    if args.dfeat_taps is not None:
        updates["dfeat_taps"] = tuple(
            int(t) for t in args.dfeat_taps.split(","))
    if args.d_features is not None:
        updates["d_features"] = tuple(
            int(t) for t in args.d_features.split(","))
    if args.d_strides is not None:
        updates["d_strides"] = tuple(
            int(t) for t in args.d_strides.split(","))
    if args.no_lr_decay:
        updates["lr_decay"] = False
    if args.augment_dihedral:
        updates["augment_dihedral"] = True
    if args.uint8_transport:
        updates["uint8_transport"] = True
    if args.device_data:
        updates["device_data"] = True
    if args.freeze_prefix:
        updates["freeze_prefix"] = True
    if args.freeze_upscale:
        updates["freeze_upscale"] = True
    if args.freeze_end:
        updates["freeze_end"] = True
    if args.unsupervised and args.preset != "x8":
        updates["content_loss_on_lr"] = True
    if args.no_sn:
        updates["generator"] = dataclasses.replace(cfg.generator, use_sn=False)
    if args.device_replay or args.fused_steps:
        updates["replay"] = dataclasses.replace(cfg.replay, host_offload=False)
    if args.fused_steps:
        updates["fused_steps"] = args.fused_steps
    return dataclasses.replace(cfg, **updates)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        # debugging / chip-less fallback: force the CPU backend (the
        # site hook pins JAX_PLATFORMS=axon, so env vars don't work)
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        # fail loudly within bounded time when the relay is dead instead of
        # wedging in jax backend init (which a dead relay parks in a futex
        # forever) — same probe as bench.py's pre-flight
        from sisr_tpu.profiling import preflight_tpu
        if not preflight_tpu():
            # exit 75 (EX_TEMPFAIL): an ENVIRONMENT failure, distinct from a
            # real training error (rc=1) so queue chains can re-queue this
            # leg instead of permanently cancelling it (round-3 failure
            # mode: an outage-rc=1 leg was treated as "prereq missing" and
            # every downstream leg was skipped forever).
            print("TPU relay unreachable (pre-flight probe timed out). "
                  "Arm tools/tpu_watchdog.sh to relaunch when it returns, "
                  "or pass --cpu to train on the host backend.",
                  file=__import__("sys").stderr)
            raise SystemExit(75)
    checkpoint = {}
    if args.ramp_epoch is not None and args.ramp_epoch < 0:
        # relative ramp: resolve against the checkpoint's epoch BEFORE the
        # config freezes the loss windows (absolute-epoch semantics)
        checkpoint = load_checkpoint(args.checkpoint) if args.checkpoint else {}
        start = int(checkpoint.get("epoch", 0)) if checkpoint else 0
        args.ramp_epoch = start + (-args.ramp_epoch)
        print(f"ramp_epoch resolved: {args.ramp_epoch} "
              f"(relative to checkpoint epoch {start})")
    cfg = config_from_args(args)
    print("write_root:", cfg.write_root)
    print("progressive_suffix:", cfg.progressive_suffix,
          " content_loss_on_lr:", cfg.content_loss_on_lr)
    print("lr_decay:", cfg.lr_decay, " use_sn:", cfg.generator.use_sn,
          " list_scales:", list(cfg.generator.list_scales),
          " scale_factor:", cfg.scale_factor)

    if not checkpoint:
        checkpoint = load_checkpoint(args.checkpoint) if args.checkpoint else {}
    if checkpoint:
        print("checkpoint loaded, starting_epoch", checkpoint.get("epoch", 0))

    mesh = None
    if args.data_parallel:
        from sisr_tpu.parallel import make_mesh
        mesh = make_mesh()
        print("mesh:", mesh)

    from sisr_tpu.train.loop import train
    result = train(cfg, checkpoint=checkpoint, mesh=mesh,
                   save=not args.no_save, plot_first=not args.no_plot_first,
                   synthetic_len=args.synthetic_len)
    print("final metrics:", result.metrics)

    # end-of-run figures (reference save_and_show, utils.py:83-94:
    # loss curves + LR/SR/HR/USR panel + training animation) — written to
    # files next to the checkpoint instead of blocking on plt.show()
    if result.write_path and result.img_list:
        from sisr_tpu import viz
        test_hr, test_lr = result.test_batch
        outs = [viz.save_loss_curves(result.losses, result.write_path),
                viz.save_quad_panel(test_lr, test_hr, result.img_list,
                                    result.write_path),
                viz.save_animation(result.img_list, result.write_path)]
        print("figures:", [o for o in outs if o])
    return result


def cli(argv=None) -> int:
    """Console-script entry point: `main` returns the TrainResult for
    programmatic use, which `sys.exit` would misinterpret as an error
    message — swallow it here."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
