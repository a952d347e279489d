"""Command-line entry points.

Mirrors the reference's runner modes (reference runner.py:298-324:
train / test / test_arbitrary_len / test_custom_audio) plus cache building,
over the typed Config presets instead of ~90 loose argparse flags
(options/base_options.py).  Any config field remains reachable through
``--set section.field=value`` overrides.

Usage:
  python -m diffsheg_tpu.cli train --dataset beat --workdir runs/beat
  python -m diffsheg_tpu.cli generate --dataset beat --audio clip.wav \\
      --checkpoint runs/beat/ckpt --speakers 1,3,5,7
  python -m diffsheg_tpu.cli build-cache --dataset beat --data-root data/BEAT
  python -m diffsheg_tpu.cli eval --dataset beat --checkpoint runs/beat/ckpt
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import List, Optional

import numpy as np

from diffsheg_tpu.config import Config, beat_config, show_config


def _override_error(kind: str, name: str, valid, item: str) -> SystemExit:
    """Friendly --set failure: name the typo and list what is valid
    (the reference prints the full opt namespace on parse instead,
    options/base_options.py:158-165)."""
    choices = ", ".join(sorted(valid))
    return SystemExit(
        f"--set {item!r}: unknown {kind} {name!r}. Valid {kind}s: {choices}")


def _apply_overrides(cfg: Config, sets: List[str]) -> Config:
    """--set model.latent_dim=256 style dotted overrides."""
    for item in sets:
        path, eq, raw = item.partition("=")
        section, dot, field = path.partition(".")
        if not eq or not dot:
            raise SystemExit(
                f"--set {item!r}: expected section.field=value "
                "(e.g. --set model.latent_dim=256)")
        sections = [f.name for f in dataclasses.fields(cfg)
                    if dataclasses.is_dataclass(getattr(cfg, f.name))]
        if section not in sections:
            raise _override_error("section", section, sections, item)
        sub = getattr(cfg, section)
        fields = {f.name for f in dataclasses.fields(sub)}
        if field not in fields:
            raise _override_error("field", f"{section}.{field}", fields, item)
        old = getattr(sub, field)
        try:
            val = _coerce(old, raw)
        except ValueError:
            raise SystemExit(
                f"--set {item!r}: cannot parse {raw!r} as "
                f"{type(old).__name__} (current value: {old!r})")
        cfg = cfg.replace(**{section: dataclasses.replace(sub,
                                                          **{field: val})})
    return cfg


def _coerce(old, raw: str):
    if isinstance(old, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(old, int):
        return int(raw)
    if isinstance(old, float):
        return float(raw)
    return raw


def _base_config(args) -> Config:
    from diffsheg_tpu.config import resolve

    cfg = beat_config() if args.dataset == "beat" else show_config()
    if getattr(args, "set", None):
        cfg = _apply_overrides(cfg, args.set)
    # cross-field dims (remove_hand / audio_feat), like runner.py:124-225
    return resolve(cfg)


def _open_dataset(args, cfg, cache_path, hubert_cache=None):
    if args.dataset == "show":
        from diffsheg_tpu.data.show import ShowDataset, ShowStats
        assert args.stats_dir, "--stats-dir required for show " \
            "(a talkshow_mean_std.npy file or its directory)"
        path = args.stats_dir
        if not path.endswith(".npy"):
            path = os.path.join(path, "talkshow_mean_std.npy")
        return ShowDataset(cache_path, ShowStats.load(path),
                           hubert_cache_dir=hubert_cache,
                           remove_hand=cfg.data.remove_hand,
                           audio_feat=cfg.data.audio_feat,
                           n_mfcc=cfg.data.n_mfcc)
    from diffsheg_tpu.data.beat import BeatDataset, BeatStats
    stats = BeatStats.load(args.stats_dir) if args.stats_dir else None
    return BeatDataset(cache_path, stats, hubert_cache_dir=hubert_cache,
                       remove_hand=cfg.data.remove_hand,
                       include_audio=cfg.train.on_device_frontend)


def cmd_train(args) -> int:
    import jax
    from diffsheg_tpu.data.loader import ShardedBatchLoader
    from diffsheg_tpu.train.trainer import Trainer

    cfg = _base_config(args)
    train_ds = _open_dataset(args, cfg, args.train_cache,
                             hubert_cache=args.hubert_cache)
    val_ds = (_open_dataset(args, cfg, args.val_cache)
              if args.val_cache else None)

    batch = min(cfg.train.batch_size, len(train_ds))
    n_dev = len(jax.devices())
    batch = max(n_dev, batch - batch % n_dev)
    mk = lambda ds: ShardedBatchLoader(
        ds, global_batch_size=batch, seed=cfg.train.seed,
        process_index=jax.process_index(), process_count=jax.process_count())
    hubert_variables = None
    if cfg.train.on_device_frontend and cfg.model.add_hubert:
        if getattr(args, "hubert_checkpoint", None):
            from diffsheg_tpu.compat.hubert_ckpt import load_hf_hubert
            hubert_variables = load_hf_hubert(args.hubert_checkpoint)
        else:
            print("WARNING: train.on_device_frontend with model.add_hubert "
                  "but no --hubert-checkpoint — speech features come from a "
                  "RANDOM-INIT encoder.", file=sys.stderr)
    trainer = Trainer(cfg, args.workdir,
                      fgd_variables=_load_fgd_variables(args, cfg),
                      hubert_variables=hubert_variables)
    if args.resume:
        trainer.try_resume()
    trainer.fit(mk(train_ds), mk(val_ds) if val_ds else None,
                num_epochs=args.epochs or None)
    return 0


def _load_fgd_variables(args, cfg):
    """Convert the reference's frozen FGD autoencoder checkpoint
    (ae_300.bin / gesture_expression.pth.tar, reference runner.py:136-147)
    so reported FGD is anchored to the paper's feature space."""
    path = getattr(args, "fgd_checkpoint", None)
    if not path:
        return None
    from diffsheg_tpu.compat.fgd_ckpt import load_torch_fgd_checkpoint
    from diffsheg_tpu.eval.fgd_net import FgdNetConfig
    return load_torch_fgd_checkpoint(path, FgdNetConfig(
        n_frames=cfg.data.n_poses, pose_dim=cfg.model.motion_dim))


def _load_stats(args):
    """Dataset-appropriate normalization stats (or None)."""
    if not args.stats_dir:
        return None
    if args.dataset == "show":
        from diffsheg_tpu.data.show import ShowStats
        path = args.stats_dir
        if not path.endswith(".npy"):
            path = os.path.join(path, "talkshow_mean_std.npy")
        return ShowStats.load(path)
    from diffsheg_tpu.data.beat import BeatStats
    return BeatStats.load(args.stats_dir)


def cmd_generate(args) -> int:
    import jax
    from diffsheg_tpu.cli.generate import CustomAudioPipeline

    cfg = _base_config(args)
    variables = _load_variables(cfg, args.checkpoint)
    stats = _load_stats(args)
    mean = stats.motion_mean if stats is not None else None
    std = stats.motion_std if stats is not None else None

    hubert_variables = None
    if args.hubert_checkpoint and cfg.model.add_hubert:
        from diffsheg_tpu.compat.hubert_ckpt import load_hf_hubert
        hubert_variables = load_hf_hubert(args.hubert_checkpoint)

    pipe = CustomAudioPipeline(cfg, variables,
                               hubert_variables=hubert_variables,
                               motion_mean=mean, motion_std=std)
    speakers = [int(s) for s in args.speakers.split(",")]
    bad = [s for s in speakers if not 0 <= s < cfg.model.style_dim]
    if bad:
        raise SystemExit(
            f"speaker ids {bad} out of range for style_dim="
            f"{cfg.model.style_dim} ({args.dataset}); pass --speakers "
            f"in [0, {cfg.model.style_dim - 1}]")
    if args.warmup:
        from diffsheg_tpu.audio.wav import load_wav
        y, sr = load_wav(args.audio)
        pipe.warmup(len(y) / sr, num_speakers=len(speakers))
    res = pipe.generate(args.audio, speakers, seed=args.seed)
    print(f"generated {res.motion.shape} | {res.fps:.1f} FPS "
          f"({res.rtf:.2f}x real-time) | stages: "
          + " ".join(f"{k}={v:.3f}s" for k, v in res.stages.items()))
    name = os.path.splitext(os.path.basename(args.audio))[0]
    if args.dataset == "beat" and mean is not None:
        files = pipe.export_beat(res.motion, args.out_dir, name,
                                 template_bvh=args.template_bvh,
                                 player=args.player)
    else:
        files = pipe.export_show(res.motion, args.out_dir, name,
                                 stats=stats)
    print("\n".join(files))
    return 0


def _load_variables(cfg: Config, checkpoint: Optional[str]):
    import jax
    from diffsheg_tpu.models.factory import init_denoiser

    model, variables = init_denoiser(cfg.model, cfg.data.n_poses,
                                     jax.random.PRNGKey(0))
    if not checkpoint:
        print("WARNING: no checkpoint given, using random init",
              file=sys.stderr)
        return variables
    if checkpoint.endswith(".tar") or checkpoint.endswith(".pt"):
        from diffsheg_tpu.compat.torch_ckpt import load_reference_checkpoint
        return load_reference_checkpoint(checkpoint, cfg.model)
    from diffsheg_tpu.train.checkpoint import CheckpointManager
    from diffsheg_tpu.train.step import create_train_state
    import numpy as np
    state = create_train_state(cfg, variables)
    mngr = CheckpointManager(checkpoint)
    restored = mngr.restore_latest(jax.tree.map(np.asarray, state))
    assert restored is not None, f"no checkpoint under {checkpoint}"
    st = restored[0]
    return {"params": st.params, "batch_stats": st.batch_stats}


def cmd_build_cache(args) -> int:
    from diffsheg_tpu.data.beat import (BeatBuildConfig, BeatStats,
                                        build_beat_cache, compute_beat_stats)

    cfg = _base_config(args)
    if args.dataset == "show":
        from diffsheg_tpu.data.show_cache import (ShowBuildConfig,
                                                  build_show_cache,
                                                  compute_show_stats,
                                                  iter_npz_dir)
        import numpy as np
        split_dir = os.path.join(args.data_root, args.split)
        sc = ShowBuildConfig(n_poses=cfg.data.n_poses,
                             stride=cfg.data.stride,
                             pose_fps=cfg.data.fps, mel_sr=cfg.data.mel_sr,
                             mel_hop=cfg.data.mel_hop, n_mels=cfg.data.n_mels)
        if args.stats_dir:
            os.makedirs(args.stats_dir, exist_ok=True)
            stats_path = os.path.join(args.stats_dir,
                                      "talkshow_mean_std.npy")
            if not os.path.exists(stats_path):
                print("computing show statistics...")
                np.save(stats_path,
                        compute_show_stats(iter_npz_dir(split_dir)))
        out = args.out or os.path.join(args.data_root,
                                       f"cache_{args.split}")
        n = build_show_cache(iter_npz_dir(split_dir), out, sc,
                             is_test=args.split == "test")
        print(f"show cache: {n} samples -> {out}")
        return 0
    bc = BeatBuildConfig(n_poses=cfg.data.n_poses, stride=cfg.data.stride,
                         pose_fps=cfg.data.fps, mel_sr=cfg.data.mel_sr,
                         mel_hop=cfg.data.mel_hop, n_mels=cfg.data.n_mels)
    split_dir = os.path.join(args.data_root, args.split)
    if args.stats_dir and os.path.exists(
            os.path.join(args.stats_dir, "axis_angle_mean.npy")):
        stats = BeatStats.load(args.stats_dir)
    else:
        print("computing dataset statistics...")
        stats = compute_beat_stats(split_dir, bc)
        if args.stats_dir:
            stats.save(args.stats_dir)
    out = args.out or os.path.join(args.data_root,
                                   f"cache_{args.split}")
    n = build_beat_cache(split_dir, out, stats, bc,
                         is_test=args.split == "test")
    print(f"cache: {n} samples -> {out}")
    return 0


def cmd_eval(args) -> int:
    import jax
    from diffsheg_tpu.data.loader import ShardedBatchLoader
    from diffsheg_tpu.train.trainer import Trainer

    cfg = _base_config(args)
    ds = _open_dataset(args, cfg, args.val_cache)
    trainer = Trainer(cfg, args.workdir or "/tmp/diffsheg_eval",
                      fgd_variables=_load_fgd_variables(args, cfg))
    if args.checkpoint:
        variables = _load_variables(cfg, args.checkpoint)
        trainer.state = trainer.state._replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}))
    loader = ShardedBatchLoader(ds, global_batch_size=min(32, len(ds)),
                                shuffle=False)
    res = trainer.evaluate(loader, jax.random.PRNGKey(args.seed))
    print(json.dumps(res.as_dict(), indent=2))
    return 0


def cmd_test_stream(args) -> int:
    """test_arbitrary_len equivalent (reference ddpm_beat_trainer.py:849)."""
    import jax
    from diffsheg_tpu.sampling.testset import generate_testset

    cfg = _base_config(args)
    ds = _open_dataset(args, cfg, args.test_cache)
    variables = _load_variables(cfg, args.checkpoint)
    exporter = None
    if args.dataset == "beat" and args.stats_dir:
        from diffsheg_tpu.sampling.export import BeatMotionExporter
        st = _load_stats(args)
        exporter = BeatMotionExporter(
            cfg.model.pose_dim, cfg.data.fps,
            st.motion_mean, st.motion_std,
            template_bvh=args.template_bvh,
            player=args.player)
    metrics = generate_testset(cfg, variables, ds, args.out_dir,
                               jax.random.PRNGKey(args.seed),
                               fgd_variables=_load_fgd_variables(args, cfg),
                               max_clips=args.max_clips,
                               output_gt=args.output_gt,
                               exporter=exporter,
                               srgr_avg_weight=args.srgr_avg_weight)
    print(json.dumps(metrics, indent=2))
    return 0


def cmd_export_ckpt(args) -> int:
    """Export trained weights as a reference-format ``.tar`` so they can be
    evaluated / fine-tuned in the upstream torch harness (which loads
    {'encoder': state_dict, ...}, trainers/ddpm_beat_trainer.py:282-318)."""
    from diffsheg_tpu.compat.torch_ckpt import save_reference_checkpoint

    cfg = _base_config(args)
    variables = _load_variables(cfg, args.checkpoint)
    path = save_reference_checkpoint(variables, args.out,
                                     epoch=args.epoch)
    print(f"exported: {path}")
    return 0


def cmd_serve(args) -> int:
    """Streaming serving daemon: one TCP connection = one live session
    (push audio chunks, pull motion as windows complete).  The deployment
    surface the reference lacks — its inference is batch scripts
    (trainers/ddpm_beat_trainer.py:1123-1346)."""
    cfg = _base_config(args)
    variables = _load_variables(cfg, args.checkpoint)

    hubert_fe = None
    if cfg.model.add_hubert:
        from diffsheg_tpu.audio.hubert_runner import HubertFeatureExtractor
        hubert_variables = None
        if args.hubert_checkpoint:
            from diffsheg_tpu.compat.hubert_ckpt import load_hf_hubert
            hubert_variables = load_hf_hubert(args.hubert_checkpoint)
        else:
            print("WARNING: model.add_hubert is on but no "
                  "--hubert-checkpoint was given — speech features come "
                  "from a RANDOM-INIT encoder.", file=sys.stderr)
        hubert_fe = HubertFeatureExtractor(variables=hubert_variables)

    from diffsheg_tpu.serving.server import MotionServer
    server = MotionServer(cfg, variables, hubert_extractor=hubert_fe,
                          host=args.host, port=args.port,
                          max_sessions=args.max_sessions,
                          max_batch=args.max_batch,
                          idle_timeout=args.idle_timeout,
                          client_geometry=args.client_geometry,
                          max_stream_seconds=args.max_stream_seconds)
    if args.prewarm:
        try:
            sizes = tuple(int(x) for x in args.prewarm.split(","))
        except ValueError:
            raise SystemExit(f"--prewarm {args.prewarm!r}: expected "
                             "comma-separated batch sizes, e.g. 1,2,4")
        server.prewarm(sizes)
    # SIGTERM (systemd/container stop) drains like Ctrl-C: stop accepting,
    # wait shutdown()'s bounded grace for in-flight sessions (handler
    # threads are daemons and would otherwise die mid-frame), then close
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("[serve] shutting down")
        server.shutdown()
    return 0


def cmd_doctor(args) -> int:
    """Environment diagnostics: versions, device reachability (bounded —
    a dead remote-attach tunnel otherwise hangs forever), dispatch
    latency, Pallas/Mosaic availability, the native data plane build,
    and the persistent compile cache."""
    from diffsheg_tpu.cli.doctor import run_doctor

    return run_doctor(device_timeout=args.device_timeout,
                      platform=args.platform or "",
                      calibrate=args.calibrate)


def cmd_view(args) -> int:
    """Write the self-contained HTML player for an exported BVH (+ face
    JSON) — the reference's vendored pymo mocap web player
    (datasets/pymo/mocapplayer/), redesigned as one dependency-free file."""
    from diffsheg_tpu.viz.player import export_bvh_player

    if args.stride < 1:
        raise SystemExit(f"--stride must be >= 1, got {args.stride}")
    out = args.out or (os.path.splitext(args.bvh)[0] + "_player.html")
    path = export_bvh_player(args.bvh, out, face_json=args.face,
                             stride=args.stride)
    print(f"player: {path}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="diffsheg_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--dataset", choices=["beat", "show"],
                        default="beat")
        sp.add_argument("--set", action="append", default=[],
                        help="config override section.field=value")
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--platform", choices=["tpu", "cpu"],
                        help="force a jax platform (some TPU plugins ignore "
                             "the JAX_PLATFORMS env var)")

    sp = sub.add_parser("train", help="train a model")
    common(sp)
    sp.add_argument("--workdir", required=True)
    sp.add_argument("--train-cache", required=True)
    sp.add_argument("--val-cache")
    sp.add_argument("--hubert-cache")
    sp.add_argument("--stats-dir")
    sp.add_argument("--resume", action="store_true")
    sp.add_argument("--epochs", type=int, default=0)
    sp.add_argument("--fgd-checkpoint",
                    help="reference FGD autoencoder (ae_300.bin / "
                         "gesture_expression.pth.tar) for eval FGD")
    sp.add_argument("--hubert-checkpoint",
                    help="HF HuBERT weights for the on-device speech "
                         "frontend (--set train.on_device_frontend=true)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("generate", help="custom-audio generation")
    common(sp)
    sp.add_argument("--audio", required=True)
    sp.add_argument("--checkpoint")
    sp.add_argument("--stats-dir")
    sp.add_argument("--out-dir", default="outputs")
    sp.add_argument("--speakers", default="1,3,5,7",
                    help="comma-separated speaker indices")
    sp.add_argument("--template-bvh")
    sp.add_argument("--player", action="store_true",
                    help="also write a self-contained HTML player per clip "
                         "(needs --template-bvh)")
    sp.add_argument("--warmup", action="store_true",
                    help="compile first so the reported RTF is steady-state")
    sp.add_argument("--hubert-checkpoint",
                    help="HF HuBERT model dir/name for speech features "
                         "(required for faithful output when "
                         "model.add_hubert is on)")
    sp.set_defaults(fn=cmd_generate)

    sp = sub.add_parser("build-cache", help="build a dataset cache")
    common(sp)
    sp.add_argument("--data-root", required=True)
    sp.add_argument("--split", default="train")
    sp.add_argument("--stats-dir")
    sp.add_argument("--out")
    sp.set_defaults(fn=cmd_build_cache)

    sp = sub.add_parser("eval", help="run validation metrics")
    common(sp)
    sp.add_argument("--val-cache", required=True)
    sp.add_argument("--checkpoint")
    sp.add_argument("--stats-dir")
    sp.add_argument("--workdir")
    sp.add_argument("--fgd-checkpoint",
                    help="reference FGD autoencoder checkpoint")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser(
        "test-stream",
        help="arbitrary-length streaming generation over the test split")
    common(sp)
    sp.add_argument("--test-cache", required=True)
    sp.add_argument("--checkpoint")
    sp.add_argument("--stats-dir")
    sp.add_argument("--out-dir", default="outputs/test_stream")
    sp.add_argument("--max-clips", type=int, default=0)
    sp.add_argument("--fgd-checkpoint",
                    help="reference FGD autoencoder checkpoint")
    sp.add_argument("--output-gt", action="store_true",
                    help="write ground truth instead of generating "
                         "(reference --output_gt)")
    sp.add_argument("--template-bvh",
                    help="full-skeleton vis template; with --stats-dir, "
                         "per-clip BVH + face JSON are exported like the "
                         "reference's test result writing")
    sp.add_argument("--player", action="store_true",
                    help="also write a self-contained HTML player per clip "
                         "(needs --template-bvh)")
    sp.add_argument("--srgr-avg-weight", type=float, default=None,
                    help="SRGR semantic-weight normalizer; pass 0.165 (the "
                         "external harness's hard-coded BEAT test-split "
                         "mean) for harness-comparable numbers; default "
                         "self-normalizes on the provided sem track")
    sp.set_defaults(fn=cmd_test_stream)

    sp = sub.add_parser(
        "export-ckpt", help="export weights as a reference-format .tar "
                            "(run them in the upstream torch harness)")
    common(sp)
    sp.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir (or a reference .tar to "
                         "re-export)")
    sp.add_argument("--out", required=True, help="output .tar path")
    sp.add_argument("--epoch", type=int, default=0,
                    help="epoch number recorded in the tar")
    sp.set_defaults(fn=cmd_export_ckpt)

    sp = sub.add_parser(
        "serve", help="streaming speech-to-motion serving daemon (TCP; one "
                      "connection = one live session)")
    common(sp)
    sp.add_argument("--checkpoint")
    sp.add_argument("--hubert-checkpoint",
                    help="HF HuBERT weights (torch .bin/.safetensors dir)")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=7431)
    sp.add_argument("--max-sessions", type=int, default=8,
                    help="bound on concurrent live sessions")
    sp.add_argument("--max-batch", type=int, default=64,
                    help="bound on speakers (= device batch) per session")
    sp.add_argument("--idle-timeout", type=float, default=600.0,
                    help="seconds of client silence before a session is "
                         "reaped and its slot freed")
    sp.add_argument("--prewarm",
                    help="comma-separated batch sizes to compile at "
                         "startup (e.g. 1,2) so the first client at that "
                         "size skips the XLA compile")
    sp.add_argument("--client-geometry", action="store_true",
                    help="let clients request custom window_frames/overlap "
                         "(each novel geometry is a fresh XLA compile; off "
                         "by default so the network cannot mint compiles)")
    sp.add_argument("--max-stream-seconds", type=float, default=3600.0,
                    help="per-session audio cap (a live session retains "
                         "its stream until finish; this bounds its memory)")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser(
        "doctor", help="check the environment: devices (bounded probe), "
                       "dispatch latency, pallas, native data plane, "
                       "compile cache")
    sp.add_argument("--platform", choices=["tpu", "cpu"],
                    help="force a jax platform before probing")
    sp.add_argument("--device-timeout", type=float, default=20.0,
                    help="seconds to wait for device enumeration before "
                         "declaring the backend unreachable")
    sp.add_argument("--calibrate", action="store_true",
                    help="run the execution-sanity probes: sustained matmul "
                         "TFLOP/s vs the device kind's physical envelope, "
                         "dispatch round-trip, host<->device bandwidth — "
                         "distinguishes 'slow model' from 'broken backend' "
                         "(e.g. a CPU fallback behind a TPU label)")
    sp.set_defaults(fn=cmd_doctor)

    sp = sub.add_parser(
        "view", help="self-contained HTML motion player for an exported BVH")
    sp.add_argument("--bvh", required=True)
    sp.add_argument("--face", help="matching face JSON (blendshape bars)")
    sp.add_argument("--out", help="output .html (default: <bvh>_player.html)")
    sp.add_argument("--stride", type=int, default=1,
                    help="frame subsampling for long clips")
    sp.set_defaults(fn=cmd_view)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)
    from diffsheg_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
