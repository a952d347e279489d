"""Test-set streaming generation (arbitrary-length clips).

Equivalent of the reference's ``test_arbitrary_len`` mode
(reference trainers/ddpm_beat_trainer.py:849-1121): iterate the test split's
whole-clip samples, run windowed-outpainting generation conditioned on the
clip's own audio features, save per-clip outputs, and score against ground
truth.  The reference ends by shelling out to an external eval harness
(:1100-1119); here the metrics (MSE / PCK / diversity / FGD when a feature
net is given / beat-align) are computed natively.
"""

from __future__ import annotations

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from diffsheg_tpu.config import Config


def generate_testset(
    cfg: Config,
    variables,
    dataset,                      # BeatDataset/ShowDataset over a test cache
    out_dir: str,
    rng: jax.Array,
    fgd_variables=None,
    max_clips: int = 0,
    output_gt: bool = False,
    exporter=None,
    srgr_avg_weight: float | None = None,
    log=print,
) -> Dict[str, float]:
    """Run streaming generation over every test clip; returns metrics.

    ``output_gt`` skips the sampler and writes the ground truth instead,
    into an ``_GT``-suffixed directory (reference --output_gt,
    base_options.py:119, ddpm_beat_trainer.py:711,789) — the GT baseline
    for external evaluation.

    ``exporter`` (a :class:`diffsheg_tpu.sampling.export.BeatMotionExporter`)
    additionally writes the denormalized npy + vis-template BVH + face JSON
    per clip, like the reference's result writing at
    ddpm_beat_trainer.py:1044-1089; without it, the normalized model output
    is saved as npy.
    """
    from diffsheg_tpu.eval.metrics import (frechet_from_activations,
                                           mse_pck_channels)
    from diffsheg_tpu.sampling.generator import WindowGenerator
    from diffsheg_tpu.sampling.streamer import StreamingGenerator

    if output_gt:
        out_dir = out_dir.rstrip("/") + "_GT"
    os.makedirs(out_dir, exist_ok=True)
    gen = StreamingGenerator(WindowGenerator(cfg, variables))

    fgd_embed = None
    if fgd_variables is not None:
        from diffsheg_tpu.eval.fgd_net import FgdFeatureNet, FgdNetConfig
        net = FgdFeatureNet(FgdNetConfig(
            n_frames=cfg.data.n_poses, pose_dim=cfg.model.motion_dim))
        fgd_embed = jax.jit(lambda x: net.apply(fgd_variables, x))

    mses, pcks, aligns, srgrs = [], [], [], []
    gen_lat, real_lat = [], []
    total_frames = 0
    t_start = time.perf_counter()

    n = len(dataset)
    if max_clips:
        n = min(n, max_clips)
    # multi-process: stride the clips across processes and tag each file
    # with its writer, like the reference's per-rank result shards
    # (ddpm_beat_trainer.py:825 ``*_rankN.npy``); metrics are reduced
    # across processes below
    pcount, pidx = jax.process_count(), jax.process_index()
    rank_sfx = f"_rank{pidx}" if pcount > 1 else ""
    for i in range(pidx, n, pcount):
        # key by clip index, not by draw order, so clip i's output is
        # identical no matter how many processes share the split
        k = jax.random.fold_in(rng, i)
        s = dataset[i]
        mel = jnp.asarray(s["mel"], dtype=jnp.float32)[None]
        gt = np.asarray(s["motion"], dtype=np.float32)
        T = min(mel.shape[1], gt.shape[0])
        mel = mel[:, :T]
        if "hubert" in s:
            hubert = jnp.asarray(s["hubert"], dtype=jnp.float32)[None, :T]
        elif cfg.model.add_hubert:
            hubert = jnp.zeros((1, T, cfg.model.hubert_dim))
        else:
            hubert = None
        sid = int(np.asarray(s.get("id", [0])).reshape(-1)[0])
        pid = jax.nn.one_hot(jnp.asarray([sid]), cfg.model.style_dim)

        if output_gt:
            out = gt[:T]
        else:
            out = np.asarray(gen.generate(mel, pid, k, hubert=hubert))[0]
        if exporter is not None:
            exporter.export(out, out_dir, f"clip_{i:05d}{rank_sfx}")
        else:
            np.save(os.path.join(out_dir, f"clip_{i:05d}{rank_sfx}.npy"),
                    out)
        total_frames += T

        # windowed metrics over the common length
        C = out.shape[-1]
        m, p = mse_pck_channels(out[None, :T], gt[None, :T])
        mses.append(m); pcks.append(p)
        if "audio" in s:
            from diffsheg_tpu.audio.onsets import audio_onset_times
            from diffsheg_tpu.eval.metrics import beat_alignment
            beats = audio_onset_times(
                np.asarray(s["audio"], dtype=np.float32), cfg.data.audio_sr)
            pose_ch = out[:T, :cfg.model.pose_dim]
            aligns.append(beat_alignment(pose_ch, beats, cfg.data.fps))
        # SRGR (the harness triad's third metric) on clips that carry the
        # BEAT per-frame semantic annotation; scored on the gesture block
        # like the harness's pose test (47 joints x 3 channels)
        # ``srgr_avg_weight``: None self-normalizes on the provided sem
        # track; pass 0.165 (the harness's hard-coded BEAT test-split mean)
        # for numbers comparable to published harness results on that
        # exact split — see eval/metrics.py::srgr.
        if "sem" in s and cfg.model.pose_dim % 3 == 0 and not output_gt:
            from diffsheg_tpu.eval.metrics import srgr as srgr_metric
            sem = np.asarray(s["sem"], dtype=np.float32).reshape(-1)[:T]
            srgrs.append(srgr_metric(out[:T, :cfg.model.pose_dim],
                                     gt[:T, :cfg.model.pose_dim], sem,
                                     avg_weight=srgr_avg_weight))
        if fgd_embed is not None:
            W = cfg.data.n_poses
            nwin = T // W
            if nwin:
                wins_g = out[:nwin * W].reshape(nwin, W, C)
                wins_r = gt[:nwin * W].reshape(nwin, W, C)
                gen_lat.append(np.asarray(fgd_embed(jnp.asarray(wins_g))))
                real_lat.append(np.asarray(fgd_embed(jnp.asarray(wins_r))))
        log(f"[test-stream] clip {i}: {T} frames "
            f"mse={m:.4f} pck={p:.4f}")

    wall = time.perf_counter() - t_start
    metrics = {
        "mse": float(np.mean(mses)) if mses else float("nan"),
        "pck": float(np.mean(pcks)) if pcks else float("nan"),
        "beat_align": float(np.mean(aligns)) if aligns else float("nan"),
        "srgr": float(np.mean(srgrs)) if srgrs else float("nan"),
        # record which normalizer produced the srgr number: the harness
        # constant makes it comparable to published BEAT results; the
        # self-normalizing default is only equivalent in expectation on
        # the exact BEAT test split
        "srgr_norm": (srgr_avg_weight if srgr_avg_weight is not None
                      else "self"),
        "fps": total_frames / max(wall, 1e-9),
        "clips": float(len(mses)),
    }
    if pcount > 1:
        # clip-weighted metric reduction + cross-process activation gather
        # (the reference's AverageMeter dist.all_reduce + per-rank shards,
        # ddpm_beat_trainer.py:1504-1533).  The nanmean form keeps a rank
        # with no clips (n < pcount) or no audio from poisoning the mean.
        from diffsheg_tpu.parallel import collectives as col
        metrics.update(col.all_reduce_nanmean_metrics(
            {m: metrics[m] for m in ("mse", "pck")},
            weight=metrics["clips"]))
        # beat-align is measured only on clips that carry raw audio, so its
        # weight is the rank's AUDIO-clip count — weighting by total clips
        # would skew the mean whenever a rank holds a mix
        metrics.update(col.all_reduce_nanmean_metrics(
            {"beat_align": metrics["beat_align"]}, weight=float(len(aligns))))
        # srgr is measured only on semantically annotated clips — weight by
        # this rank's annotated-clip count, same rationale as beat-align
        metrics.update(col.all_reduce_nanmean_metrics(
            {"srgr": metrics["srgr"]}, weight=float(len(srgrs))))
        # clips becomes the global count; fps the aggregate throughput
        # (ranks generate concurrently, so global rate = sum of local rates)
        sums = col.gather_arrays(np.asarray(
            [[metrics["clips"], metrics["fps"]]], dtype=np.float64)).sum(0)
        metrics["clips"], metrics["fps"] = float(sums[0]), float(sums[1])
        if fgd_embed is not None:
            # a rank whose shard had no full window contributes 0 rows
            lat = (np.concatenate(gen_lat) if gen_lat
                   else np.zeros((0, _fgd_dim(fgd_embed, cfg)), np.float32))
            rlat = (np.concatenate(real_lat) if real_lat
                    else np.zeros_like(lat))
            gen_lat = [col.gather_arrays_ragged(lat)]
            real_lat = [col.gather_arrays_ragged(rlat)]
    if gen_lat and sum(a.shape[0] for a in gen_lat) >= 2:
        metrics["fgd"] = frechet_from_activations(
            np.concatenate(gen_lat), np.concatenate(real_lat))
    return metrics


def _fgd_dim(fgd_embed, cfg: Config) -> int:
    """Latent width of the FGD feature net (for an empty shard's
    zero-row placeholder — every rank must gather the same trailing dim)."""
    probe = jnp.zeros((1, cfg.data.n_poses, cfg.model.motion_dim))
    return int(np.asarray(fgd_embed(probe)).shape[-1])
