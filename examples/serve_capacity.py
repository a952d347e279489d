"""Serving-capacity probe: N concurrent real-time sessions on one chip.

Answers the deployment question the daemon docs estimate analytically
(docs/serving.md "~20 concurrent real-time sessions per chip"): spin up
the real `serving.MotionServer` in-process, connect N `MotionClient`s,
and have each push 100 ms audio chunks at real-time pace for --secs
seconds.  XLA serializes device dispatches, so sessions share the chip at
window granularity; capacity is reached when queueing makes sessions fall
behind real time.

Per row (N sessions) this prints one JSON line:
  - ``rt_factor``: aggregate audio-seconds processed per wall-second
    (N when everyone keeps up; < N when the chip saturates),
  - ``push_p95_ms``/``push_max_ms``: per-push service time across all
    sessions (a push that completes a window blocks for that window's
    compute + queueing; the rest are ~network-only),
  - ``rt_ok``: every session finished its stream within 5% of real time.

Usage: python examples/serve_capacity.py [--secs 16] [--sessions 1,4,8,16]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def run_row(n_sessions: int, secs: int, chunk_s: float, port: int,
            sr: int, style_dim: int):
    from diffsheg_tpu.serving.server import MotionClient

    chunk = int(sr * chunk_s)
    n_chunks = int(secs / chunk_s)
    rng = np.random.RandomState(0)
    audio = (0.1 * rng.randn(n_chunks, chunk)).astype(np.float32)

    results = [None] * n_sessions

    def worker(idx: int):
        services = []
        try:
            with MotionClient("127.0.0.1", port) as cli:
                cli.start(speakers=[idx % style_dim], seed=idx)
                t_start = time.perf_counter()
                for k in range(n_chunks):
                    target = t_start + k * chunk_s
                    now = time.perf_counter()
                    if now < target:
                        time.sleep(target - now)
                    t0 = time.perf_counter()
                    cli.push(audio[k])
                    services.append(time.perf_counter() - t0)
                push_wall = time.perf_counter() - t_start
                t0 = time.perf_counter()
                cli.finish()
                drain = time.perf_counter() - t0
            results[idx] = (push_wall, drain, services)
        except Exception as e:  # surface the root cause, don't mask it
            results[idx] = e

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_sessions)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    errors = [r for r in results if isinstance(r, Exception)]
    if errors:
        raise RuntimeError(
            f"{len(errors)}/{n_sessions} sessions failed; first: "
            f"{errors[0]!r}")

    # a session keeps up when the paced push loop never falls behind the
    # capture cadence: its wall equals the stream length (+ margin); the
    # final drain (tail windows at finish) is reported separately
    walls = [r[0] for r in results]
    drains = [r[1] for r in results]
    services = np.array([s for r in results for s in r[2]])
    audio_secs = n_sessions * secs
    row = {
        "sessions": n_sessions,
        "stream_secs": secs,
        "rt_factor": round(audio_secs / max(walls), 2),
        "push_p50_ms": round(float(np.percentile(services, 50)) * 1e3, 1),
        "push_p95_ms": round(float(np.percentile(services, 95)) * 1e3, 1),
        "push_max_ms": round(float(services.max()) * 1e3, 1),
        "drain_max_ms": round(max(drains) * 1e3, 1),
        "rt_ok": bool(max(walls) <= secs * 1.05),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=int, default=16)
    ap.add_argument("--sessions", default="1,4,8,16")
    ap.add_argument("--chunk-ms", type=int, default=100)
    args = ap.parse_args()

    from diffsheg_tpu.config import beat_config
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser
    from diffsheg_tpu.serving.server import MotionServer
    from diffsheg_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = beat_config()
    cfg = cfg.replace(
        diffusion=dataclasses.replace(cfg.diffusion, jump_n_sample=2),
        # per-window live dispatches are latency-bound; the per-layer
        # kernel is the right serving config here (see live_latency.py)
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                  add_hubert=False),
    )
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    sizes = [int(s) for s in args.sessions.split(",")]
    server = MotionServer(cfg, variables, max_sessions=max(sizes) + 1,
                          log=lambda *a, **k: None)
    server.start_background()
    port = server.address[1]
    sr = cfg.data.mel_sr

    try:
        # full-length warmup session: compiles every program a measured
        # session will hit (window, continuation AND the finish/tail
        # drain), so the rows time steady-state serving only
        run_row(1, args.secs, args.chunk_ms / 1e3, port, sr,
                cfg.model.style_dim)
        print("# warmup row above (includes compiles); measured rows:",
              flush=True)

        for n in sizes:
            run_row(n, args.secs, args.chunk_ms / 1e3, port, sr,
                    cfg.model.style_dim)
    finally:
        server.shutdown()


if __name__ == "__main__":
    main()
