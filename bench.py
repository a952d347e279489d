"""End-to-end generation throughput benchmark (BEAT configuration).

Reproduces the reference RTF measurement method — generated frames divided by
total pipeline time (mel frontend + HuBERT speech features + sampler), per
trainers/ddpm_beat_trainer.py:1243-1315 — on one TPU chip, using the
fast-inference configuration from inference_custom_audio_beat.sh:15-28
(DDIM-25, overlap 4, jump_n_sample 2), whose A100 baseline is 55 FPS.

All three stages the baseline pays are timed: mel (18 kHz, hop 1200, 128
bins), HuBERT-large inference over the chunked 16 kHz waveform (random-init
weights — throughput only), and the fused windowed DDIM+RePaint sampler.
The timed path is the serving configuration: all three stages traced into
ONE compiled program (sampling/pipeline.py), bfloat16 matmuls, the
timestep-level cache and the whole-layer Pallas kernel.  Set BENCH_STAGED=1
for the per-stage breakdown (extra compiles).  Timing notes go to stderr;
stdout is ONE JSON line.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 55.0  # A100, inference_custom_audio_beat.sh:15


def check():
    """On-device fast-path numerics assertion (--check).

    Compares the Mosaic-compiled serving path (whole-layer Pallas kernel +
    fused linear attention + level cache) against the plain Flax/XLA
    composition ON THE CURRENT BACKEND, with identical weights and rng:

      - f32 fast vs f32 plain: the kernels implement identical math, so
        the outputs must agree to float tolerance (rel RMS < 5e-3);
      - bf16 fast vs f32 plain: bounded reduced-precision drift
        (rel RMS < 2.5e-2 — measured ~0.4-1%).

    Exits non-zero on violation so TPU-only Mosaic regressions fail loudly
    instead of shipping as silent quality drift.  Prints one JSON line.
    """
    import dataclasses

    from diffsheg_tpu.config import beat_config
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.sampling.generator import WindowGenerator
    from diffsheg_tpu.sampling.streamer import StreamingGenerator

    base = beat_config()
    base = base.replace(diffusion=dataclasses.replace(
        base.diffusion, jump_n_sample=2))
    _, variables = init_unidiffuser(base.model, base.data.n_poses,
                                    jax.random.PRNGKey(0))

    # ~5 s of frames: a first window + one RePaint continuation window,
    # exercising both compiled programs without the full-stream compile
    T = base.data.n_poses * 2  # 68 frames
    rs = np.random.RandomState(0)
    mel = jnp.asarray(rs.randn(1, T, base.model.audio_dim), jnp.float32)
    hubert = jnp.zeros((1, T, base.model.hubert_dim), jnp.float32)
    pid = jax.nn.one_hot(jnp.array([1]), base.model.style_dim)
    key = jax.random.PRNGKey(7)

    def run(cfg, no_pallas=False, vs=None):
        if no_pallas:
            os.environ["DIFFSHEG_NO_PALLAS"] = "1"
        try:
            out = StreamingGenerator(
                WindowGenerator(cfg, vs if vs is not None else variables)
            ).generate(mel, pid, key, hubert=hubert)
            return np.asarray(out, np.float64)
        finally:
            os.environ.pop("DIFFSHEG_NO_PALLAS", None)

    def variant(dtype, fast):
        cfg = base.replace(model=dataclasses.replace(
            base.model, compute_dtype=dtype))
        if not fast:
            cfg = cfg.replace(diffusion=dataclasses.replace(
                cfg.diffusion, fused_layer="off", level_cache=False))
        return cfg

    plain32 = run(variant("float32", fast=False), no_pallas=True)
    fast32 = run(variant("float32", fast=True))
    fast16 = run(variant("bfloat16", fast=True))
    # int8 weight-only serving (diffusion.quantize): approximate by design;
    # asserted against its measured on-device band so a Mosaic regression
    # on the int8 kernel path still fails loudly.  fused_layer='on' (not
    # 'auto'): quantize requires the fast path, and 'on' keeps this row
    # runnable off-TPU (interpret mode) where 'auto' would disable it
    int8cfg = variant("bfloat16", fast=True)
    int8cfg = int8cfg.replace(diffusion=dataclasses.replace(
        int8cfg.diffusion, quantize="int8", fused_layer="on"))
    fast8 = run(int8cfg)
    # the default serving configuration (chain kernel, bf16): asserted at
    # the same tight tolerance as the per-layer bf16 row — this is the
    # config bench.py main ships, so it must not hide behind the loose
    # int8 band
    chain16cfg = variant("bfloat16", fast=True)
    chain16cfg = chain16cfg.replace(diffusion=dataclasses.replace(
        chain16cfg.diffusion, fused_layer="chain"))
    fast16c = run(chain16cfg)
    # PERF.md ladder step 8: chain kernel + int8 weights
    chaincfg = int8cfg.replace(diffusion=dataclasses.replace(
        int8cfg.diffusion, fused_layer="chain"))
    fast8c = run(chaincfg)
    # chain kernel + nibble-packed int4 weights: the loosest rung — the
    # tolerance only asserts "compiles on Mosaic, finite, in the 4-bit
    # drift class" (the shift/concat unpack is the TPU-specific surface)
    chain4cfg = chaincfg.replace(diffusion=dataclasses.replace(
        chaincfg.diffusion, quantize="int4"))
    fast4c = run(chain4cfg)
    # classifier-free guidance through the chain kernel (the SHOW serving
    # shape): exercises the null-substitution branch on real Mosaic,
    # which the BEAT rows (classifier_free=False) never reach
    cfg_model = dataclasses.replace(base.model, classifier_free=True,
                                    cond_scale=1.15)
    _, cfg_vars = init_unidiffuser(cfg_model, base.data.n_poses,
                                   jax.random.PRNGKey(1))
    def cfg_variant(dtype, **diff_over):
        c = base.replace(model=dataclasses.replace(
            cfg_model, compute_dtype=dtype))
        return c.replace(diffusion=dataclasses.replace(
            c.diffusion, **diff_over))
    plain32g = run(cfg_variant("float32", fused_layer="off",
                               level_cache=False),
                   no_pallas=True, vs=cfg_vars)
    fast8cg = run(cfg_variant("bfloat16", fused_layer="chain",
                              quantize="int8"), vs=cfg_vars)

    def rel_rms(a, b):
        return float(np.sqrt(((a - b) ** 2).mean()) /
                     np.sqrt((b ** 2).mean()))

    r32 = rel_rms(fast32, plain32)
    r16 = rel_rms(fast16, plain32)
    r16c = rel_rms(fast16c, plain32)
    r8 = rel_rms(fast8, plain32)
    r8c = rel_rms(fast8c, plain32)
    r8cg = rel_rms(fast8cg, plain32g)
    r4c = rel_rms(fast4c, plain32)
    ok = (r32 < 5e-3 and r16 < 2.5e-2 and r16c < 2.5e-2
          and r8 < 1e-1 and r8c < 1e-1 and r8cg < 1e-1 and r4c < 5e-1)
    print(f"check[{jax.default_backend()}]: "
          f"f32 fast-vs-plain rel_rms={r32:.2e} (tol 5e-3)  "
          f"bf16 fast-vs-plain rel_rms={r16:.2e} (tol 2.5e-2)  "
          f"chain-bf16 rel_rms={r16c:.2e} (tol 2.5e-2)  "
          f"int8 fast-vs-plain rel_rms={r8:.2e} (tol 1e-1)  "
          f"chain-int8 rel_rms={r8c:.2e} (tol 1e-1)  "
          f"chain-int8-cfg rel_rms={r8cg:.2e} (tol 1e-1)  "
          f"chain-int4 rel_rms={r4c:.2e} (tol 5e-1)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "fastpath_rel_rms",
        "value": round(r32, 6),
        "unit": "rel_rms_f32",
        "bf16_rel_rms": round(r16, 6),
        "chain_bf16_rel_rms": round(r16c, 6),
        "int8_rel_rms": round(r8, 6),
        "chain_int8_rel_rms": round(r8c, 6),
        "chain_int8_cfg_rel_rms": round(r8cg, 6),
        "chain_int4_rel_rms": round(r4c, 6),
        "backend": jax.default_backend(),
        "ok": ok,
    }))
    if not ok:
        sys.exit(1)


def main():
    import dataclasses

    from diffsheg_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    # Calibration preamble: refuse to certify a degraded backend.  Round 4
    # shipped a 0.46x headline with rc=0 because the axon plugin silently
    # served XLA:CPU AOT executables while default_backend() said "tpu";
    # block_until_ready() returned without executing and readbacks hung.
    # calibrate() times real compute with a forced host readback (bounded
    # wait) and checks the achieved TFLOP/s against the device kind's
    # physical envelope — see diffsheg_tpu/utils/calibration.py.
    from diffsheg_tpu.utils.calibration import calibrate
    calib = calibrate(allow_cpu=bool(os.environ.get("BENCH_ALLOW_CPU")))
    print(f"calibration[{calib.backend}/{calib.device_kind}]: "
          f"{calib.calib_tflops:.1f} TFLOP/s sustained, "
          f"dispatch {calib.dispatch_ms:.1f} ms"
          + ("" if calib.ok else f"  INVALID: {calib.reason}"),
          file=sys.stderr)
    if not calib.ok:
        print(json.dumps({
            "metric": "beat_generation_fps",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            **calib.json_fields(),
        }))
        sys.exit(1)

    from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
    from diffsheg_tpu.audio.mel import MelFrontend
    from diffsheg_tpu.config import beat_config
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.sampling.generator import WindowGenerator
    from diffsheg_tpu.sampling.streamer import StreamingGenerator

    # BENCH_JN=5 benches the reference's DEFAULT (slow) configuration —
    # jump_n_sample 5, A100 baseline 25 FPS
    # (inference_custom_audio_beat.sh:1-13); default is the fast config
    # (jn=2, 55 FPS baseline, :15-28)
    from diffsheg_tpu.utils.benchcfg import jump_config_baseline
    jn, baseline = jump_config_baseline({2: BASELINE_FPS, 5: 25.0})

    def make_cfg(mode):
        # mode: '<fused_layer>' for the single-dispatch fused pipeline, or
        # 'staged:<fused_layer>' for the host-window-loop rung (three
        # smaller compiled programs: mel, HuBERT, per-window sampler —
        # the reference's own stage structure, for days when the compile
        # service rejects every large program)
        layer = mode.split(":")[-1]
        cfg = beat_config()
        cfg = cfg.replace(diffusion=dataclasses.replace(
            cfg.diffusion, jump_n_sample=jn,
            fused_step=os.environ.get("BENCH_FUSED_STEP", "auto"),
            # serving config: the whole-branch chain kernel (exact same
            # numerics class as the per-layer kernel — bench.py --check —
            # at ~25% higher throughput; BENCH_FUSED_LAYER=auto for the
            # per-layer rung)
            fused_layer=layer,
            # BENCH_QUANT=int8: weight-only int8 serving (approximate —
            # quality drift measured by --check; PERF.md)
            quantize=os.environ.get("BENCH_QUANT", "none")))
        # TPU serving configuration: bfloat16 weights + compute in the
        # sampler (MXU-native; measured 1.47x over f32 with ~0.4% relative
        # output RMS deviation — see examples/perf_probe.py).  The
        # frontend stays f32.
        return cfg.replace(model=dataclasses.replace(
            cfg.model, compute_dtype="bfloat16"))

    staged_mode = False
    cfg = make_cfg(os.environ.get("BENCH_FUSED_LAYER", "chain"))

    def build_and_warm():
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(0))
        gen = WindowGenerator(cfg, variables)
        stream = StreamingGenerator(gen)
        frontend = MelFrontend(sr=cfg.data.mel_sr, hop=cfg.data.mel_hop,
                               n_mels=cfg.data.n_mels)
        # serving precision for the speech frontend too: HuBERT-large in
        # bfloat16 halves the dominant matmul stage on the MXU
        from diffsheg_tpu.models.hubert import HubertConfig
        hubert_fe = HubertFeatureExtractor(HubertConfig(dtype="bfloat16"))

        # 60 s of synthetic speech-band audio -> 900 frames @ 15 fps.
        # The reference pipeline reads the 16 kHz waveform for HuBERT and
        # resamples to 18 kHz for mel (ddpm_beat_trainer.py:1236-1265);
        # synthesize both rates from one analytic signal.  BENCH_SECS
        # shrinks the stream for logic smoke runs (NOT the headline).
        secs = int(os.environ.get("BENCH_SECS", "60"))

        def synth(sr):
            t = np.arange(secs * sr) / sr
            noise = np.random.RandomState(1).randn(secs * sr)
            return (0.3 * np.sin(2 * np.pi * 220 * t)
                    + 0.1 * noise).astype(np.float32)[None]

        audio_18k = jnp.asarray(synth(cfg.data.mel_sr))
        audio_16k = jnp.asarray(synth(16000))
        pid = jax.nn.one_hot(jnp.array([1]), cfg.model.style_dim)

        # optional staged run (reference-style per-stage accounting);
        # costs three extra compiles, so it is diagnostics-only
        if os.environ.get("BENCH_STAGED"):
            mel = frontend(audio_18k)
            n_frames = mel.shape[1]
            hub = hubert_fe(audio_16k, target_frames=n_frames)
            stream.generate_fused(mel, pid, jax.random.PRNGKey(0),
                                  hubert=hub).block_until_ready()
            t0 = time.perf_counter()
            mel = frontend(audio_18k)
            mel.block_until_ready(); t1 = time.perf_counter()
            hub = hubert_fe(audio_16k, target_frames=n_frames)
            hub.block_until_ready(); t2 = time.perf_counter()
            out = stream.generate_fused(mel, pid, jax.random.PRNGKey(1),
                                        hubert=hub)
            out.block_until_ready(); t3 = time.perf_counter()
            print(f"staged: mel={t1-t0:.3f}s hubert={t2-t1:.3f}s "
                  f"sampler={t3-t2:.3f}s total={t3-t0:.3f}s",
                  file=sys.stderr)

        if staged_mode:
            # host-window-loop rung: mel, HuBERT and the per-window
            # sampler stay three SEPARATE compiled programs and the
            # window loop runs on the host (the reference's own stage
            # structure, ddpm_beat_trainer.py:1236-1315).  Slower than
            # the fused pipeline by ~1 dispatch per stage + window
            # (~25-30 ms each here), but each program is small enough
            # for a compile service that rejects the fused one.
            class StagedPipe:
                def __call__(self, a18, a16, pid, key):
                    mel = frontend(a18)
                    hub = hubert_fe(a16, target_frames=mel.shape[1])
                    return stream.generate(mel, pid, key, hubert=hub)

            pipe = StagedPipe()
        else:
            # the serving path: the SAME three stages traced into ONE
            # program — a 60 s clip costs a single device dispatch
            from diffsheg_tpu.sampling.pipeline import FusedPipeline
            pipe = FusedPipeline(stream, frontend, hubert_fe)
        out = pipe(audio_18k, audio_16k, pid, jax.random.PRNGKey(0))
        out.block_until_ready()
        return pipe, audio_18k, audio_16k, pid

    # Per-program fallback detection (wraps the WHOLE build + warmup):
    # the calibration preamble certifies the BACKEND, but any executable
    # in the benched process can still land on the host CPU — either
    # compiled by a degraded service right now, or replayed from a
    # persistent-cache entry POISONED by a past degraded run (observed:
    # calibration 114 TFLOP/s while the pipeline ran at 26 FPS from
    # round-4 cache entries, with the loader warnings appearing already
    # at model init).  Two independent signals, either one trips:
    #   1. load-time: XLA's cpu_aot_loader.cc warning on fd 2 (scan_stderr
    #      tees it live) — fires when the AOT entry's machine features
    #      mismatch this host;
    #   2. run-time: host_cpu_fraction of one timed pipeline call — a TPU
    #      program leaves this process ~idle (measured 0.02) while host
    #      execution burns ~all of wall (0.99+).  Needed because a FRESH
    #      degraded compile for the matching host prints NO loader warning
    #      (observed 2026-08-20: zero warnings, calibration 109 TFLOP/s,
    #      pipeline at 25 FPS = the round-4 CPU number, valid:true).
    from diffsheg_tpu.utils.calibration import (CPU_AOT_SIGNATURE,
                                                HOST_EXEC_FRAC_LIMIT,
                                                host_cpu_fraction,
                                                scan_stderr)

    # Plausibility floor for a "tpu"-labelled measurement: the SLOWEST
    # serving rung ever measured on this chip (f32, no kernels, no cache)
    # is ~950 FPS; the A100 reference is 55.  A per-call rate below 100
    # FPS on a TPU backend is not a slow configuration — it is execution
    # that is not on the TPU at all.  This catches the remote-side CPU
    # fallback (observed 2026-08-20 pm): no local loader warning AND a
    # low local host_cpu_frac (the fallback executes in the remote
    # service's host, so THIS process just blocks), ~35 s per 900-frame
    # call — the only local evidence is the impossible rate.
    MIN_PLAUSIBLE_TPU_FPS = 100.0

    def degraded_reason(scan, pipe_args):
        if calib.backend == "cpu":
            return None  # honest-CPU run (BENCH_ALLOW_CPU): host execution
        if scan.found(CPU_AOT_SIGNATURE):
            return (f"XLA:CPU AOT loader signature at executable load "
                    f"({scan.count(CPU_AOT_SIGNATURE)} loads)")
        audio_18k, audio_16k, pid = pipe_args
        wall, frac = host_cpu_fraction(
            lambda: pipe(audio_18k, audio_16k, pid,
                         jax.random.PRNGKey(999)).block_until_ready())
        n_frames = audio_18k.shape[1] // 1200  # mel hop -> 15 fps frames
        print(f"execution-locality probe: wall={wall:.3f}s "
              f"host_cpu_frac={frac:.3f} (limit {HOST_EXEC_FRAC_LIMIT}) "
              f"rate={n_frames / wall:.0f} FPS "
              f"(floor {MIN_PLAUSIBLE_TPU_FPS:.0f})", file=sys.stderr)
        if frac > HOST_EXEC_FRAC_LIMIT:
            return (f"pipeline executes on the host CPU "
                    f"(host_cpu_frac={frac:.2f} over a {wall:.2f}s call)")
        if n_frames / wall < MIN_PLAUSIBLE_TPU_FPS:
            return (f"pipeline rate {n_frames / wall:.0f} FPS is "
                    f"implausible for any TPU rung (slowest ~950) — "
                    f"remote-side CPU fallback")
        return None

    # Kernel-mode ladder: when the degraded compile service lands the
    # DEFAULT chain-kernel pipeline on the host even after a purge and a
    # fresh in-process recompile (observed 2026-08-20: the service
    # compiled the small calibration program to genuine TPU code at 116
    # TFLOP/s while every fresh compile of the large Mosaic-heavy
    # pipeline fell back to CPU), step down to smaller compiled programs
    # that the service still handles: per-layer Pallas kernels ('auto',
    # ~2700 FPS class), then pure XLA + level cache ('off', ~1600 FPS
    # class) — both still far above the 55-FPS baseline and honestly
    # labeled in the artifact ('fused_layer' field + metric suffix).
    # BENCH_FUSED_LAYER pins a single mode (no ladder).  The purge/
    # clear_caches retry stays in-process: an execve re-exec tears down
    # the axon tunnel state without C++ cleanup and the child's first
    # readback hangs (observed SIGABRT after the probe timeout).
    from diffsheg_tpu.utils.compile_cache import purge_persistent_cache
    pinned = os.environ.get("BENCH_FUSED_LAYER")
    mode_ladder = ([pinned] if pinned else
                   ["chain", "auto", "off", "staged:chain", "staged:off"])
    pipe = None
    reasons = []
    layer_mode = mode_ladder[0]
    for mode in mode_ladder:
        cfg = make_cfg(mode)
        staged_mode = mode.startswith("staged")
        reason = None
        for attempt in (0, 1):
            with scan_stderr() as scan:
                pipe, audio_18k, audio_16k, pid = build_and_warm()
            reason = degraded_reason(scan, (audio_18k, audio_16k, pid))
            if reason is None:
                break
            n = purge_persistent_cache()
            # a same-rung retry only helps when the failure came from a
            # POISONED CACHE entry (the load signature): the purge fixes
            # exactly that.  A locality/plausibility breach on what was
            # already a fresh compile means the service is degrading THIS
            # rung right now — rebuilding it again just re-measures the
            # same degradation (observed 8/8 identical retry outcomes),
            # so step down the ladder immediately.
            fresh_failure = CPU_AOT_SIGNATURE not in reason \
                and "loader signature" not in reason
            print(f"CPU fallback detected at warmup "
                  f"(fused_layer={mode}, {reason}) — purged {n} cache "
                  f"entries; clearing in-memory executables and "
                  + ("stepping down the kernel-mode ladder"
                     if (attempt == 1 or fresh_failure)
                     else "recompiling fresh in-process"),
                  file=sys.stderr)
            pipe = None
            jax.clear_caches()
            if fresh_failure:
                break
        if reason is None:
            layer_mode = mode
            break
        reasons.append(f"{mode}: {reason}")
    if reason is not None:
        # every rung landed on the host: the service is degraded NOW
        print(json.dumps({
            "metric": "beat_generation_fps",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            **calib.json_fields(),
            "valid": False,
            "invalid_reason": "benched program runs on the host CPU at "
                              "every kernel-mode rung after fresh "
                              "compiles — remote compile service is "
                              "serving CPU fallbacks (round-4 degraded "
                              "mode): " + "; ".join(reasons),
        }))
        sys.exit(1)
    if layer_mode != mode_ladder[0]:
        print(f"NOTE: headline measured at fused_layer={layer_mode} "
              f"(degraded compile service rejected the larger rungs: "
              + "; ".join(reasons) + ")", file=sys.stderr)

    # best-of-12: each rep is one ~0.33 s device dispatch; a dozen reps
    # costs ~4 s and de-noises the remote-tunnel timing jitter (observed
    # +-2% run-to-run at best-of-6)
    def measure(seed0):
        totals = []
        c0 = time.process_time()
        w0 = time.perf_counter()
        for i in range(12):
            t0 = time.perf_counter()
            out = pipe(audio_18k, audio_16k, pid,
                       jax.random.PRNGKey(seed0 + i))
            out.block_until_ready()
            totals.append(time.perf_counter() - t0)
        # execution-locality accounting over the WHOLE measured block: the
        # same physical discriminator as the warmup probe, re-asserted on
        # the reps the headline is computed from
        frac = ((time.process_time() - c0)
                / max(time.perf_counter() - w0, 1e-9))
        return out, totals, frac

    # spread guard: within one run the tunnel jitter is ~+-2%; a spread
    # above 30% means the timing path itself is unstable (round 4's
    # degraded mode measured 38-1274%) and the headline is not a
    # measurement.  One retry forgives a single network hiccup; a second
    # breach invalidates the artifact (nonzero rc).
    SPREAD_LIMIT = 0.30
    out, totals, host_frac = measure(1)
    spread = (max(totals) - min(totals)) / float(np.median(totals))
    if spread > SPREAD_LIMIT:
        print(f"spread {spread:.1%} > {SPREAD_LIMIT:.0%} — retrying once",
              file=sys.stderr)
        out, totals, host_frac = measure(101)
        spread = (max(totals) - min(totals)) / float(np.median(totals))

    frames = int(out.shape[1])
    best = int(np.argmin(totals))
    fps = frames / totals[best]
    # best-of-N stays the headline (de-noises within-run tunnel jitter),
    # but the JSON also carries the median and spread so a single
    # favorable draw is visible as such (PERF.md documents ~4%/day
    # across-run drift through the remote-TPU tunnel)
    median_fps = frames / float(np.median(totals))
    print(f"fused pipeline (best of {len(totals)}): "
          f"total={totals[best]:.3f}s frames={frames} "
          f"median_fps={median_fps:.1f} spread={spread:.1%}",
          file=sys.stderr)

    quant = os.environ.get("BENCH_QUANT", "none")
    spread_ok = spread <= SPREAD_LIMIT
    locality_ok = (host_frac <= HOST_EXEC_FRAC_LIMIT
                   or calib.backend == "cpu")
    plausible = (calib.backend == "cpu"
                 or median_fps >= MIN_PLAUSIBLE_TPU_FPS)
    ok = spread_ok and locality_ok and plausible
    record = {
        "metric": "beat_generation_fps" + (f"_jn{jn}" if jn != 2 else "")
        + (f"_{quant}" if quant != "none" else "")
        + (f"_{layer_mode.replace(':', '_')}"
           if layer_mode != "chain" else ""),
        "value": round(fps, 2) if ok else 0.0,
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 3) if ok else 0.0,
        "median": round(median_fps, 2),
        "median_vs_baseline": round(median_fps / baseline, 3),
        "spread_pct": round(100 * spread, 2),
        "host_cpu_frac": round(host_frac, 3),
        "reps": len(totals),
        "fused_layer": layer_mode,
        **calib.json_fields(),
    }
    if not pinned and layer_mode != "chain":
        record["kernel_mode_note"] = (
            "measured at a smaller kernel-mode rung; the degraded compile "
            "service landed the larger rung(s) on the host CPU: "
            + "; ".join(reasons))
    if not ok:
        record["valid"] = False
        if not spread_ok:
            record["invalid_reason"] = (
                f"timing spread {100 * spread:.1f}% > "
                f"{100 * SPREAD_LIMIT:.0f}% after retry — unstable timing "
                f"path (measured best-of {round(fps, 2)} FPS not certified)")
        elif not locality_ok:
            record["invalid_reason"] = (
                f"measured reps executed on the host CPU "
                f"(host_cpu_frac={host_frac:.2f}) — CPU fallback, not a "
                f"TPU measurement")
        else:
            record["invalid_reason"] = (
                f"median {round(median_fps, 2)} FPS is implausible for "
                f"any TPU rung (slowest ~950) — remote-side CPU fallback, "
                f"not a TPU measurement")
    print(json.dumps(record))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    else:
        main()
