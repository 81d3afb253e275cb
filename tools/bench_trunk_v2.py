"""Design-point bench for the v2 batch-tiled/bf16 pallas deploy trunk
(VERDICT r3 next #6: serving is bandwidth-bound at 60-68% HBM SoL; the
pallas trunk's 515 MB/batch schedule has SoL 417 MP/s but ran at 29% of it
because its per-image M=1024 dots + fp32 scratches starve the MXU).

Measures, at the celeba-x4 serving geometry (LR 32x32, nf=64, 16 blocks):
  - trunk-only: XLA conv chain, pallas v1 (tile_b=1), v2 (tile_b 2/4/8/16)
  - full deploy: XLA vs pallas v1 vs pallas v2-best, b16 + b64

Chained-dispatch methodology per CLAUDE.md (tools/_bench_util.chain_timed).
Appends one JSON line per row; run:
  python tools/bench_trunk_v2.py | tee -a quality_runs/perf_r4/trunk_v2.jsonl
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._bench_util import chain_timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sisr_tpu.config import GeneratorConfig
    from sisr_tpu.infer import deploy_apply, fold_generator
    from sisr_tpu.models.generator import generator_init
    from sisr_tpu.nn.layers import conv2d_apply, prelu_apply
    from sisr_tpu.ops.pallas.trunk import fused_trunk

    gcfg = GeneratorConfig(n_suffixes=1)  # x4: two native stages + suffix
    p, s = generator_init(jax.random.PRNGKey(0), gcfg)
    fp, _ = fold_generator(p, s, gcfg)
    base = fp["base"] if "base" in fp else fp
    nf = gcfg.n_features_block
    H = W = 32
    rng = np.random.default_rng(0)

    def xla_trunk(x):
        h = x
        for bp in base["blocks"]:
            y = conv2d_apply(bp["conv1"], h, padding=1,
                             compute_dtype=jnp.bfloat16)
            y = prelu_apply(bp["prelu"], y)
            y = conv2d_apply(bp["conv2"], y, padding=1,
                             compute_dtype=jnp.bfloat16)
            h = h + y
        return conv2d_apply(base["block_end"]["conv"], h, padding=1,
                            compute_dtype=jnp.bfloat16) + x

    rows = []

    # Resume support: a prior attempt's partial capture (the chain snapshots
    # the tee'd .tmp before tool() deletes it on rc=124) seeds `rows`, its
    # lines are re-printed so the final artifact is complete, and measured
    # (variant, batch) pairs are skipped — the retry only runs what's left.
    partial = os.environ.get("SISR_TRUNK_V2_RESUME",
                             "quality_runs/perf_r4/trunk_v2.partial.jsonl")
    if os.path.isfile(partial):
        with open(partial) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if "variant" in r and "ms" in r:
                    rows.append(r)
                    print(json.dumps(r), flush=True)

    def done(variant, batch):
        return any(r.get("variant") == variant and r.get("batch") == batch
                   and "ms" in r for r in rows)

    def emit(**kw):
        mp = kw.pop("mp")
        kw["mps"] = round(mp / kw["ms"] * 1e3, 1)
        rows.append(kw)
        print(json.dumps(kw), flush=True)

    for B in (16, 64):
        x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, nf)).astype(np.float32))
        mp_out = B * (H * 4) * (W * 4) / 1e6  # end-to-end MP at x4

        if not done("trunk_xla", B):
            dt = chain_timed(xla_trunk, x, iters=50)
            emit(variant="trunk_xla", batch=B, ms=round(dt * 1e3, 3), mp=mp_out)
        if not done("trunk_v1", B):
            dt = chain_timed(lambda a: fused_trunk(a, base, tile_b=1),
                             x, iters=50)
            emit(variant="trunk_v1", batch=B, ms=round(dt * 1e3, 3), mp=mp_out)
        # t8/t16 are compile-time explosions: Mosaic unrolls the per-image
        # block chain per grid step, and both round-5 chain attempts wedged
        # >60 min server-side compiling t8 with ~0 client CPU. t2/t4 compile
        # in seconds and already bracket the schedule (larger tiles only add
        # VMEM pressure at fixed MXU shape), so the sweep stops at 4.
        for t in (2, 4):
            if B % t or done(f"trunk_v2_t{t}", B):
                continue
            if B == 64 and t == 4:
                # t4@b64 is another Mosaic compile explosion (two round-5
                # attempts spent 14 and 22+ min inside it server-side,
                # blocking the relay's compile queue). t2@b64 already shows
                # the v2 schedule losing at this batch (276.7 vs v1 348.5
                # vs XLA 382.4 MP/s) — nothing left to learn from t4.
                print(json.dumps({"variant": "trunk_v2_t4", "batch": B,
                                  "skipped": "mosaic-compile-explosion"}),
                      flush=True)
                continue
            try:
                dt = chain_timed(lambda a, t=t: fused_trunk(a, base, tile_b=t),
                                 x, iters=50)
                emit(variant=f"trunk_v2_t{t}", batch=B,
                     ms=round(dt * 1e3, 3), mp=mp_out)
            except Exception as e:
                print(json.dumps({"variant": f"trunk_v2_t{t}", "batch": B,
                                  "error": repr(e)[:200]}), flush=True)

        # full deploy comparison (lr input is 3-channel)
        lr = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32))
        for name, kw in (("deploy_xla", {}),
                         ("deploy_pallas_v1", {"use_pallas_trunk": True}),
                         ("deploy_xla_ct",
                          {"use_transposed_upscale": True})):
            if done(name, B):
                continue
            dt = chain_timed(
                lambda a, kw=kw: deploy_apply(fp, a, gcfg,
                                              compute_dtype=jnp.bfloat16,
                                              **kw),
                lr, iters=30)
            emit(variant=name, batch=B, ms=round(dt * 1e3, 3), mp=mp_out)

        # best measured v2 tile for this batch (fused_trunk's default is now
        # tile_b=1 per ADVICE r4, so the v2 schedule must be pinned here)
        v2_rows = [r for r in rows if r.get("batch") == B and "ms" in r
                   and r["variant"].startswith("trunk_v2_t")]
        best_t = (int(min(v2_rows, key=lambda r: r["ms"])
                      ["variant"].rsplit("t", 1)[-1]) if v2_rows else 2)

        def make_deploy_v2(ct_upscale):
            from sisr_tpu.infer import upscale_transposed
            from sisr_tpu.nn.layers import pixel_shuffle

            def deploy_v2(a):
                levels = []
                node = fp
                while "base" in node:
                    levels.append(node)
                    node = node["base"]
                bb = node
                h = conv2d_apply(bb["first_layers"]["conv"], a, padding=4,
                                 compute_dtype=jnp.bfloat16)
                h = prelu_apply(bb["first_layers"]["prelu"], h)
                h = fused_trunk(h, bb, tile_b=best_t)
                stages = ([(bb["upscale"][i], gcfg.list_scales[i])
                           for i in range(len(bb["upscale"]))]
                          + [(lvl["upscale"], 2) for lvl in reversed(levels)])
                for stage, r in stages:
                    if ct_upscale:
                        h = upscale_transposed(h, stage, r,
                                               compute_dtype=jnp.bfloat16)
                    else:
                        y = conv2d_apply(stage["conv"], h, padding=1,
                                         compute_dtype=jnp.bfloat16)
                        y = pixel_shuffle(y, r)
                        h = prelu_apply(stage["prelu"], y)
                h = conv2d_apply(bb["end"]["conv"], h, padding=1,
                                 compute_dtype=jnp.bfloat16)
                return jnp.tanh(h.astype(jnp.float32))

            return deploy_v2

        for name, ct in (("deploy_pallas_v2", False),
                         ("deploy_pallas_v2_ct", True)):
            if done(name, B):
                continue
            if B == 64:
                # The deploy-wrapped fused_trunk at b64 is another Mosaic
                # compile explosion (a round-5 attempt sat 65+ min in it
                # server-side with ~0 client CPU). The standalone trunk rows
                # already show v2 losing at b64 (t2 276.7 / t4 279.2 vs v1
                # 348.5 vs XLA 382.4 MP/s) and the b16 deploy rows show the
                # v2 wrapper losing end-to-end — nothing left to learn.
                print(json.dumps({"variant": name, "batch": B,
                                  "skipped": "mosaic-compile-explosion"}),
                      flush=True)
                continue
            try:
                dt = chain_timed(make_deploy_v2(ct), lr, iters=30)
                emit(variant=name, batch=B, ms=round(dt * 1e3, 3), mp=mp_out)
            except Exception as e:
                print(json.dumps({"variant": name, "batch": B,
                                  "error": repr(e)[:200]}), flush=True)

    print(json.dumps({"summary": rows}), flush=True)


if __name__ == "__main__":
    main()
