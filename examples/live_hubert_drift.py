"""Quantify the live-mode HuBERT approximation (PERF.md live section).

Live sessions extract HuBERT features with WINDOW-LOCAL context
(sampling/live.py:_window_hubert): per 34-frame window, the window's own
~2.27 s of 16 kHz audio is normalized and encoded on its own.  The
offline path (audio/hubert_runner.py, matching the reference's
extract_hubert.py) normalizes the WHOLE stream, attends over 20 s
chunks, and resamples whole-stream features to the motion rate before
windowing.  Three divergence sources: normalization statistics,
attention context truncation, and per-window vs whole-stream resampling.

This script measures the per-window feature drift (relative RMS against
the offline features) for:
  (a) the shipped window-local live path, and
  (b) a LEFT-CONTEXT variant that prepends the previous ``ctx_s`` seconds
      of already-captured audio before encoding and slices the window's
      frames back out — the candidate fix (live audio BEFORE the window
      is always available; audio after it never is).

Weights are the random-init encoder unless --hubert-checkpoint points at
converted HF weights — with random weights the number is an indicator of
architectural sensitivity, not of perceptual quality.

Run:  python examples/live_hubert_drift.py [--seconds 24] [--ctx 1,2,4]
(``--ctx`` accepts a comma-separated sweep; each value costs one extra
encoder compile but the offline oracle and the window-local rows are
shared across the sweep.)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAV = "/root/reference/audios/2_scott_0_3_3.wav"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=24.0)
    ap.add_argument("--ctx", default="4.0",
                    help="left context seconds for variant (b); "
                         "comma-separated values sweep the table")
    ap.add_argument("--wav", default=WAV)
    ap.add_argument("--hubert-checkpoint", default=None)
    ap.add_argument("--fps", type=int, default=15)
    ap.add_argument("--window", type=int, default=34)
    ap.add_argument("--step", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from diffsheg_tpu.audio.hubert_runner import (
        STRIDE, HubertFeatureExtractor, expected_frames, linear_resample)
    from diffsheg_tpu.audio.wav import load_wav, resample_poly

    y, sr = load_wav(args.wav)
    audio = resample_poly(y, sr, 16000)[: int(args.seconds * 16000)]
    T_total = int(len(audio) / 16000 * args.fps)

    variables = None
    if args.hubert_checkpoint:
        from diffsheg_tpu.compat.hubert_ckpt import load_hf_hubert
        variables = load_hf_hubert(args.hubert_checkpoint)
    ex = HubertFeatureExtractor(variables=variables)
    # scanned encoder: identical math (tests pin it), ~24x smaller HLO —
    # the unrolled 24-layer program compiles pathologically slowly on
    # this environment's compile service
    from diffsheg_tpu.models.hubert import HubertModel, stack_layer_params
    ex.model = HubertModel(ex.cfg, scan_layers=True)
    ex.variables = stack_layer_params(ex.variables, ex.cfg.num_layers)

    # offline oracle: whole-stream chunked extraction at the motion rate
    offline = np.asarray(ex(jnp.asarray(audio), target_frames=T_total))[0]

    # window starts (streamer semantics: fixed step, left-shifted tail)
    starts = list(range(0, T_total - args.window + 1, args.step))
    if starts[-1] != T_total - args.window:
        starts.append(T_total - args.window)

    n = int(args.window / args.fps * 16000)
    ctx_sweep = [float(c) for c in str(args.ctx).split(",") if c.strip()]

    def rel_rms(a, b):
        return float(np.sqrt(((a - b) ** 2).mean())
                     / max(np.sqrt((b ** 2).mean()), 1e-12))

    model, mvars = ex.model, ex.variables

    # (a) shipped live path: window-local context — shared across the sweep
    rows_local = []
    for s in starts:
        lo = min(int(s / args.fps * 16000), max(0, len(audio) - n))
        seg = audio[lo:lo + n]
        if len(seg) < n:
            seg = np.pad(seg, (0, n - len(seg)))
        live = np.asarray(ex(jnp.asarray(seg)[None],
                             target_frames=args.window))[0]
        rows_local.append(rel_rms(live, offline[s:s + args.window]))

    result = {
        "metric": "live_hubert_feature_drift",
        "unit": "rel_rms_vs_offline",
        "windows": len(starts),
        "weights": "converted" if variables is not None else "random-init",
        "window_local_mean": round(float(np.mean(rows_local)), 4),
        "window_local_max": round(float(np.max(rows_local)), 4),
    }

    for ctx_s in ctx_sweep:
        # Round to a whole encoder stride — same rule LiveSession applies
        # (sampling/live.py) so the measured drift matches the shipped knob
        ctx = (int(ctx_s * 16000) // STRIDE) * STRIDE

        # ONE static signature per ctx: every window is encoded as a
        # (1, ctx+n) segment, left-zero-padded when the stream is younger
        # than ctx, with a frame mask excluding frames whose receptive
        # field touches the pad (models/hubert.py frame_mask)
        ext_len = ctx + n
        ext_frames = expected_frames(ext_len)

        @jax.jit
        def encode_ext(seg, first_valid_frame, ext_frames=ext_frames):
            mask = (jnp.arange(ext_frames)[None, :] >= first_valid_frame)
            return model.apply(mvars, seg, mask)

        rows_ctx = []
        for s in starts:
            lo = min(int(s / args.fps * 16000), max(0, len(audio) - n))
            # (b) left-context variant: encode [lo-ctx, lo+n), slice the
            # window's conv frames, resample those to the window length
            lo_ext = lo - ctx
            pad_left = max(0, -lo_ext)
            ext = audio[max(0, lo_ext):lo + n]
            ext = np.pad(ext, (pad_left, ext_len - pad_left - len(ext)))
            # normalize over the REAL samples only, then pad with zeros
            valid = ext[pad_left:]
            valid = (valid - valid.mean()) / np.sqrt(valid.var() + 1e-7)
            ext = np.concatenate([np.zeros(pad_left, np.float32),
                                  valid.astype(np.float32)])
            first_valid = -(-pad_left // STRIDE)  # ceil: RF clear of pad
            feats = encode_ext(jnp.asarray(ext)[None], first_valid)
            f0 = (lo - lo_ext) // STRIDE
            want = expected_frames(n)
            w = feats[:, f0:f0 + want]
            if w.shape[1] < want:
                w = jnp.pad(w, ((0, 0), (0, want - w.shape[1]), (0, 0)))
            wr = np.asarray(linear_resample(w, args.window))[0]
            rows_ctx.append(rel_rms(wr, offline[s:s + args.window]))
        tag = (f"{ctx_s:g}")
        result[f"left_ctx_{tag}s_mean"] = round(float(np.mean(rows_ctx)), 4)
        result[f"left_ctx_{tag}s_max"] = round(float(np.max(rows_ctx)), 4)
        print(f"ctx={ctx_s:g}s: mean={result[f'left_ctx_{tag}s_mean']} "
              f"max={result[f'left_ctx_{tag}s_max']}", file=sys.stderr)

    import json
    print(json.dumps(result))


if __name__ == "__main__":
    main()
