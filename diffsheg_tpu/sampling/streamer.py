"""Arbitrary-length streaming generation via windowed outpainting.

Reference behaviour (trainers/ddpm_beat_trainer.py:1123-1346): slice the
conditioning into ``n_poses``-frame windows advancing by ``n_poses -
overlap_len``; for each window after the first, pin the first ``overlap_len``
frames toward the previous window's tail with RePaint-in-DDIM; emit
``window_step`` new frames per window.

TPU-native differences:
  - Every window has the same static shape.  The reference's shorter tail
    window (:946-949) would trigger a recompile, so the final window is
    *shifted left* to end exactly at the sequence end; its pinned head comes
    from already-emitted frames, which is the same RePaint mechanism, and only
    the genuinely new frames are emitted.
  - The window loop carries only the (B, overlap, C) tail between device
    calls — conditioning is pre-sliced host-side, sampling runs fully
    on-device per window.
  - Batch across speakers/styles: the B axis is free, so one session can
    generate all styles at once (the reference loops styles serially,
    :1189).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffsheg_tpu.models.factory import denoised_channels
from diffsheg_tpu.models.level_cache import AudioCache, combine
from diffsheg_tpu.sampling.generator import WindowGenerator


def get_windows(x: np.ndarray, size: int, step: int) -> List[np.ndarray]:
    """Reference-compatible window slicing over axis 1
    (trainers/ddpm_beat_trainer.py:1147-1165), kept for dataset tooling and
    parity tests.  The streamer itself uses :func:`window_starts`."""
    seq_len = x.shape[1]
    if seq_len <= size:
        return [x]
    win_num = (seq_len - (size - step)) / float(step)
    out = [x[:, m * step: m * step + size] for m in range(int(win_num))]
    if win_num != int(win_num):
        out.append(x[:, int(win_num) * step:])
    return out


def window_starts(seq_len: int, size: int, step: int) -> List[int]:
    """Static-shape window plan: full windows every ``step`` frames, plus a
    final left-shifted window ending at ``seq_len`` when frames remain."""
    if seq_len <= size:
        return [0]
    starts = []
    s = 0
    while s + size <= seq_len:
        starts.append(s)
        s += step
    if starts[-1] + size < seq_len:
        starts.append(seq_len - size)
    return starts


class StreamingGenerator:
    """Drives a :class:`WindowGenerator` over arbitrary-length conditioning.

    Two execution modes:
      - :meth:`generate` — host window loop, one compiled call per window
        (general: supports ``same_overlap_noisy`` tail reuse);
      - :meth:`generate_fused` — the ENTIRE stream as one jit: window 0, a
        ``lax.scan`` over the uniform middle windows (carry = previous
        window's sample), and the final (possibly left-shifted) window, with
        output assembly on device.  Zero host round-trips per window — the
        sequential RePaint dependency stays, but dispatch latency vanishes.
    """

    def __init__(self, gen: WindowGenerator):
        self.gen = gen
        self.cfg = gen.cfg
        self._fused_cache = {}

    def generate(
        self,
        mel: jax.Array,                      # (B, T, n_mels)
        person_id: jax.Array,                # (B, style_dim)
        rng: jax.Array,
        hubert: Optional[jax.Array] = None,  # (B, T, hubert_dim)
    ) -> jax.Array:
        """Generate (B, T, motion_dim) for the full sequence length."""
        cfg = self.cfg
        size = cfg.data.n_poses
        overlap = cfg.stream.overlap_len
        step = size - overlap
        B, T = mel.shape[0], mel.shape[1]

        if T <= size:
            return self._short_sequence(mel, person_id, rng, hubert, T)

        starts = window_starts(T, size, step)
        chunks: List[jax.Array] = []
        emitted = 0
        gt_head: Optional[jax.Array] = None
        prev_tails = None

        for ii, s in enumerate(starts):
            rng, k = jax.random.split(rng)
            mel_w = jax.lax.dynamic_slice_in_dim(mel, s, size, axis=1)
            hub_w = (
                jax.lax.dynamic_slice_in_dim(hubert, s, size, axis=1)
                if hubert is not None else None
            )
            if ii == 0:
                if cfg.stream.fix_very_first and overlap > 0:
                    zeros = jnp.zeros((B, overlap, denoised_channels(cfg.model)))
                    out = self.gen.generate(mel_w, person_id, k, hub_w,
                                            gt_head=zeros)
                else:
                    out = self.gen.generate(mel_w, person_id, k, hub_w)
            else:
                out = self.gen.generate(
                    mel_w, person_id, k, hub_w, gt_head=gt_head,
                    prev_saved_tails=prev_tails,
                )
            if cfg.stream.same_overlap_noisy and isinstance(out, tuple):
                out, prev_tails = out

            is_last = ii == len(starts) - 1
            new_from = emitted - s           # frames of this window already emitted
            keep_to = size if is_last else step
            chunks.append(out[:, new_from:keep_to])
            emitted = s + keep_to
            if not is_last:
                next_s = starts[ii + 1]
                # head of next window must match output frames [next_s, next_s+overlap)
                tail_from = next_s - s
                gt_head = out[:, tail_from: tail_from + overlap]

        result = jnp.concatenate(chunks, axis=1)
        assert result.shape[1] == T, (result.shape, T)
        return result

    # -- fully-fused path --------------------------------------------------
    def generate_fused(
        self,
        mel: jax.Array,                      # (B, T, n_mels)
        person_id: jax.Array,                # (B, style_dim)
        rng: jax.Array,
        hubert: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Whole-stream generation as ONE compiled program.

        ``same_overlap_noisy`` is supported: the per-level saved-tail stack
        (reference gaussian_diffusion.py:1040-1042,1058-1060) rides the
        window scan's carry, with a validity flag so the first continuation
        window (which has no saved tails yet) shares the compiled body.
        """
        cfg = self.cfg
        size = cfg.data.n_poses
        overlap = cfg.stream.overlap_len
        step = size - overlap
        B, T = mel.shape[0], mel.shape[1]
        if T <= size:
            return self._short_sequence(mel, person_id, rng, hubert, T)

        starts = window_starts(T, size, step)
        keys = []
        for _ in starts:
            rng, k = jax.random.split(rng)
            keys.append(k)
        keys = jnp.stack(keys)

        sig = (B, T, hubert is not None)
        fn = self._fused_cache.get(sig)
        if fn is None:
            fn = jax.jit(self._build_fused(starts, size, step, overlap, T,
                                           hubert is not None))
            self._fused_cache[sig] = fn
        return fn(self.gen.variables, mel, person_id, hubert, keys)

    def _build_fused(self, starts, size, step, overlap, T, has_hubert):
        cfg = self.cfg
        C = denoised_channels(cfg.model)
        gen = self.gen
        K = len(starts)
        track_tails = cfg.stream.same_overlap_noisy
        n_levels = gen.schedule.num_steps + 1
        # static layout facts (starts are uniform except a possibly
        # left-shifted final window)
        last_s = starts[-1]
        emitted_before_last = starts[-2] + step if K > 1 else 0
        last_new_from = emitted_before_last - last_s  # >= 0, static

        def slice_w(x, s):
            return jax.lax.dynamic_slice_in_dim(x, s, size, axis=1) \
                if x is not None else None

        def with_head(gt_head):
            B = gt_head.shape[0]
            gt = jnp.zeros((B, size, C), dtype=jnp.float32)
            return gt.at[:, :overlap].set(gt_head)

        use_cache = getattr(gen, "_use_level_cache", False)

        def fused(variables, mel, person_id, hubert, keys):
            B = mel.shape[0]
            tails0 = jnp.zeros((n_levels, B, overlap or 1, C))
            valid0 = jnp.asarray(False)

            # Conditioning cache (models/level_cache.py), paid at the right
            # cadence: the static part (stylization mods) once per stream;
            # the audio part for ALL windows in one batched frontend pass
            # (K*B*L rows — MXU-shaped, unlike 25-row per-window matmuls).
            # fast-path weights (pad/cast of every layer) once per stream
            fast = gen.make_fast_fn(variables, size, has_hubert) \
                if hasattr(gen, "make_fast_fn") else None
            if use_cache:
                static = gen.cache_static_fn(variables, person_id)
                mel_all = jnp.stack([slice_w(mel, s) for s in starts])
                hub_all = (jnp.stack([slice_w(hubert, s) for s in starts])
                           if has_hubert else None)
                ac = gen.cache_audio_fn(
                    variables, mel_all.reshape(K * B, size, -1),
                    None if hub_all is None
                    else hub_all.reshape(K * B, size, -1))
                # unfold the window axis back out: leveled fields
                # (L, K*B, T, .) -> (K, L, B, T, .); per-window fields
                # (K*B, T, .) -> (K, B, T, .)
                ac = AudioCache(
                    *(a.reshape(a.shape[0], K, B, *a.shape[2:]).swapaxes(0, 1)
                      for a in (ac.exp_audio, ac.ges_audio)),
                    *(None if a is None else a.reshape(K, B, *a.shape[1:])
                      for a in (ac.exp_hub, ac.ges_hub)),
                )

                def cache_at(idx):  # static python index
                    return combine(static,
                                   jax.tree.map(lambda a: a[idx], ac))
            else:
                static, ac = None, None
                cache_at = lambda idx: None  # noqa: E731

            # window 0
            mel0, hub0 = slice_w(mel, 0), slice_w(hubert, 0)
            if cfg.stream.fix_very_first and overlap > 0:
                out0, t0 = gen.sample_repaint_fn(
                    variables, mel0, person_id, hub0,
                    jnp.zeros((B, size, C)), None, keys[0],
                    cache=cache_at(0), fast=fast)
                if track_tails:
                    tails0, valid0 = t0, jnp.asarray(True)
            else:
                out0 = gen.sample_plain_fn(variables, mel0, person_id, hub0,
                                           keys[0], cache=cache_at(0),
                                           fast=fast)

            # ALL continuation windows — the uniform mids AND the possibly
            # left-shifted final window — share ONE scan body (one sampler
            # program to compile instead of two): the only per-window
            # variation, the offset of the pinned head inside the previous
            # window, rides the scan xs as a dynamic-slice start.
            conts = starts[1:]
            mel_c = jnp.stack([slice_w(mel, s) for s in conts])
            hub_c = (jnp.stack([slice_w(hubert, s) for s in conts])
                     if has_hubert else jnp.zeros((len(conts),)))
            ac_c = (jax.tree.map(lambda a: a[1:], ac)
                    if use_cache else None)
            tail_from = jnp.asarray(
                [conts[j] - starts[j] for j in range(len(conts))],
                dtype=jnp.int32)

            def body(carry, inp):
                prev_out, tails, valid = carry
                mel_w, hub_w, key, ac_w, tf = inp
                gt = with_head(jax.lax.dynamic_slice_in_dim(
                    prev_out, tf, overlap, axis=1))
                out, new_tails = gen.sample_repaint_fn(
                    variables, mel_w,
                    person_id, hub_w if has_hubert else None,
                    gt, tails if track_tails else None, key,
                    prev_tails_valid=valid if track_tails else None,
                    cache=None if ac_w is None else combine(static, ac_w),
                    fast=fast)
                if not track_tails:
                    new_tails = tails
                return ((out, new_tails, jnp.asarray(True)), out)

            _, outs = jax.lax.scan(
                body, (out0, tails0, valid0),
                (mel_c, hub_c, keys[1:], ac_c, tail_from))

            # on-device assembly
            res = jnp.zeros((B, T, C), dtype=jnp.float32)
            res = jax.lax.dynamic_update_slice_in_dim(
                res, out0[:, :step], 0, axis=1)
            if K > 2:  # uniform mids: one bulk write of their new frames
                flat = jnp.moveaxis(outs[:-1, :, :step], 0, 1).reshape(
                    B, (K - 2) * step, C)
                res = jax.lax.dynamic_update_slice_in_dim(
                    res, flat, step, axis=1)
            res = jax.lax.dynamic_update_slice_in_dim(
                res, outs[-1][:, last_new_from:],
                last_s + last_new_from, axis=1)
            return res

        return fused

    def _short_sequence(self, mel, person_id, rng, hubert, T):
        """Sequence no longer than one window: pad to the static window size
        and trim (the reference would run a variable-length window,
        ddpm_beat_trainer.py:1157-1159)."""
        size = self.cfg.data.n_poses
        pad = size - T
        if pad:
            mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="edge")
            if hubert is not None:
                hubert = jnp.pad(hubert, ((0, 0), (0, pad), (0, 0)), mode="edge")
        out = self.gen.generate(mel, person_id, rng, hubert)
        return out[:, :T]
