"""Real multi-process distributed execution: lockstep harness.

The reference actually spawns one process per GPU and exchanges gradients
over NCCL (reference runner.py:86 ``mp.spawn``, :107
``dist.init_process_group('nccl', tcp://...)``).  This module is the
JAX-native equivalent *actually executed*, not simulated: ``run_lockstep``
spawns N worker processes, each calls ``jax.distributed.initialize`` against
a shared coordinator, builds the global mesh over N x D virtual CPU devices,
runs the production sharded train step on its loader shard, and exercises
every ``multihost_utils`` branch in :mod:`diffsheg_tpu.parallel.collectives`
(barrier, metric all-reduce, array gather).  The parent then runs the same
step single-process over the same global device count and asserts the loss
and updated parameters agree — gradient ``psum`` across real process
boundaries must reproduce the single-controller result exactly.

Used by ``tests/test_multiprocess.py`` and by ``__graft_entry__.
dryrun_multichip``.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from typing import Dict, List, Optional

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# -- shared payload ---------------------------------------------------------

GLOBAL_BATCH = 16
T_FRAMES = 6
DS_LEN = 64


def tiny_config():
    """A small-but-real joint model config shared by workers and parent."""
    from diffsheg_tpu.config import Config, DiffusionConfig, ModelConfig, TrainConfig
    return Config(
        model=ModelConfig(
            pose_dim=8, expression_dim=4, latent_dim=32, num_layers=2,
            num_heads=4, ff_size=64, audio_dim=16, aud_latent_dim=16,
            style_dim=4, add_hubert=False, encode_hubert=False),
        diffusion=DiffusionConfig(num_steps=50, respacing=""),
        train=TrainConfig(batch_size=GLOBAL_BATCH, use_sem_weighting=False,
                          seed=0),
    )


class SynthDataset:
    """Deterministic indexable dataset — identical on every process."""

    def __init__(self, cfg):
        self.C = cfg.model.motion_dim
        self.A = cfg.model.audio_dim
        self.S = cfg.model.style_dim

    def __len__(self):
        return DS_LEN

    def batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        idx = np.asarray(indices)
        t = np.arange(T_FRAMES)[None, :, None]
        base = idx[:, None, None].astype(np.float32)
        motion = np.sin(0.1 * base * (t + 1)
                        + 0.05 * np.arange(self.C)[None, None, :])
        mel = np.cos(0.07 * base * (t + 1)
                     + 0.03 * np.arange(self.A)[None, None, :])
        pid = np.eye(self.S, dtype=np.float32)[idx % self.S]
        return {"motion": motion.astype(np.float32),
                "mel": mel.astype(np.float32), "pid": pid}


def injected_randoms(cfg):
    """Seeded (t, noise) for the injected-randoms step — position-keyed so
    1-process and N-process runs see identical randomness per global row."""
    rng = np.random.RandomState(42)
    t = rng.randint(0, cfg.diffusion.num_steps, size=(GLOBAL_BATCH,))
    noise = rng.randn(GLOBAL_BATCH, T_FRAMES,
                      cfg.model.motion_dim).astype(np.float32)
    return t.astype(np.int32), noise


# -- the computation under test --------------------------------------------

def compute_lockstep(n_steps: int = 3) -> Dict[str, float]:
    """Run ``n_steps`` production train steps over the current (possibly
    multi-process) device set; returns {loss_k, pnorm} floats.

    Must be called after jax.distributed.initialize (or single-process with
    the same global device count).
    """
    import jax
    import jax.numpy as jnp

    from diffsheg_tpu.data.loader import ShardedBatchLoader
    from diffsheg_tpu.diffusion.schedule import (
        get_named_beta_schedule, make_schedule)
    from diffsheg_tpu.models.factory import init_denoiser
    from diffsheg_tpu.parallel.mesh import make_mesh, shard_batch
    from diffsheg_tpu.train.step import create_train_state, make_train_step

    cfg = tiny_config()
    mesh = make_mesh(cfg.mesh)
    sched = make_schedule(get_named_beta_schedule(
        cfg.diffusion.beta_schedule, cfg.diffusion.num_steps))
    _, variables = init_denoiser(cfg.model, T_FRAMES,
                                 jax.random.PRNGKey(cfg.train.seed))
    state = create_train_state(cfg, variables, mesh=mesh)
    step = make_train_step(cfg, sched, mesh=mesh, inject_randoms=True)

    loader = ShardedBatchLoader(
        SynthDataset(cfg), global_batch_size=GLOBAL_BATCH,
        seed=cfg.train.seed, process_index=jax.process_index(),
        process_count=jax.process_count(), prefetch=0)
    t_np, noise_np = injected_randoms(cfg)

    out: Dict[str, float] = {}
    it = iter(loader)
    for k in range(n_steps):
        batch = shard_batch(mesh, next(it))
        t = jnp.asarray(t_np)
        noise = jnp.asarray(noise_np)
        state, terms = step(state, batch, t, noise)
        out[f"loss_{k}"] = float(terms.total)

    pnorm = jax.jit(lambda p: sum(
        jnp.abs(leaf).sum() for leaf in jax.tree.leaves(p)))(state.params)
    out["pnorm"] = float(pnorm)
    return out


def check_collectives() -> Dict[str, float]:
    """Exercise every multihost branch in parallel/collectives.py."""
    import jax
    from diffsheg_tpu.parallel import collectives as col

    col.barrier("mp_lockstep_start")
    p = col.process_index()
    n = col.process_count()
    # weighted metric mean: process p contributes value (p+1) with weight
    # (p+1) -> expected sum((p+1)^2) / sum(p+1)
    reduced = col.all_reduce_mean_metrics({"m": float(p + 1)},
                                          weight=float(p + 1))
    expect = sum((i + 1) ** 2 for i in range(n)) / sum(i + 1 for i in range(n))
    gathered = col.gather_arrays(np.asarray([p * 10.0, p * 10.0 + 1.0]))
    want = np.concatenate([[i * 10.0, i * 10.0 + 1.0] for i in range(n)])
    # ragged gather: process p contributes p+1 rows (unequal leading dims,
    # the eval-latents case in sampling/testset.py)
    rag = col.gather_arrays_ragged(
        np.full((p + 1, 2), float(p), dtype=np.float32))
    rag_want = np.concatenate(
        [np.full((i + 1, 2), float(i), dtype=np.float32) for i in range(n)])
    # NaN-safe mean: only rank 0 measured "nm"; everyone measured nothing
    # for "none" (stays NaN instead of raising / poisoning)
    nm = col.all_reduce_nanmean_metrics(
        {"nm": 7.5 if p == 0 else float("nan"), "none": float("nan")},
        weight=float(p + 1))
    col.barrier("mp_lockstep_end")
    return {
        # f32 tolerance: process_allgather downcasts under JAX_ENABLE_X64=0
        "metric_ok": float(abs(reduced["m"] - expect) < 1e-5),
        "gather_ok": float(np.array_equal(gathered, want)),
        "ragged_ok": float(np.array_equal(rag, rag_want)),
        "nanmean_ok": float(abs(nm["nm"] - 7.5) < 1e-9
                            and np.isnan(nm["none"])),
    }


class TestsetSynthClips:
    """Four deterministic whole-clip samples for the testset-shard check.

    Every clip is two windows long (same length -> one window-plan compile).
    Only clips 0-2 carry raw audio: under a 2-process stride rank0 (clips
    0,2) is all-audio while rank1 (clips 1,3) holds a MIX — its local
    beat-align mean covers 1 of its 2 clips, so the reduction must weight
    by audio-clip count, not total clips, to match the single-process mean.
    """

    N_CLIPS = 4

    def __init__(self, cfg):
        self.cfg = cfg

    def __len__(self):
        return self.N_CLIPS

    def __getitem__(self, i):
        rs = np.random.RandomState(100 + i)
        c = self.cfg
        T = 2 * c.data.n_poses
        s = {
            "motion": rs.randn(T, c.model.motion_dim).astype(np.float32),
            "mel": (rs.randn(T, c.model.audio_dim) * 0.1).astype(np.float32),
            "id": np.asarray([i % c.model.style_dim]),
        }
        if i < 3:
            sr = c.data.audio_sr
            t = np.arange(int(T / c.data.fps * sr)) / sr
            s["audio"] = (0.1 * np.sin(2 * np.pi * 220 * t)
                          * (np.sin(2 * np.pi * 2.0 * t) > 0)
                          ).astype(np.float32)
        return s


def testset_payload():
    """Tiny-but-real streaming config + converted-size FGD net, identical
    on every process (seeded init)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from diffsheg_tpu.config import beat_config
    from diffsheg_tpu.eval.fgd_net import FgdFeatureNet, FgdNetConfig
    from diffsheg_tpu.models.unidiffuser import init_unidiffuser

    cfg = beat_config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, latent_dim=16, num_layers=1, num_heads=2, ff_size=32,
        add_hubert=False))
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(11))
    net = FgdFeatureNet(FgdNetConfig(n_frames=cfg.data.n_poses,
                                     pose_dim=cfg.model.motion_dim))
    fgd_vars = net.init(
        jax.random.PRNGKey(5),
        jnp.zeros((1, cfg.data.n_poses, cfg.model.motion_dim)))
    return cfg, variables, fgd_vars, TestsetSynthClips(cfg)


def check_testset_shard(out_dir: str) -> Dict:
    """REAL multi-process ``generate_testset``: strided clips, per-rank
    result files, per-metric-weighted NaN-safe reduction, ragged FGD
    latent gather (sampling/testset.py).  With 4 clips over 2 processes
    rank1's shard mixes one audio and one audio-less clip — its local
    beat-align covers half its clips, so only audio-count weighting
    reproduces the single-process mean."""
    import glob

    import jax

    from diffsheg_tpu.sampling.testset import generate_testset

    cfg, variables, fgd_vars, ds = testset_payload()
    metrics = generate_testset(cfg, variables, ds, out_dir,
                               jax.random.PRNGKey(123),
                               fgd_variables=fgd_vars, log=lambda *a: None)
    sfx = (f"_rank{jax.process_index()}.npy"
           if jax.process_count() > 1 else ".npy")
    files = sorted(os.path.basename(f)
                   for f in glob.glob(os.path.join(out_dir, "*.npy"))
                   if f.endswith(sfx))
    sums = {}
    for f in files:
        arr = np.load(os.path.join(out_dir, f)).astype(np.float64)
        sums[f.split("_rank")[0].replace(".npy", "")] = float(arr.sum())
    return {"testset_metrics": {k: metrics[k] for k in
                                ("mse", "pck", "beat_align", "fgd", "clips")},
            "testset_files": files,
            "testset_sums": sums}


def check_loader_partition() -> Dict[str, float]:
    """The per-process loader shards must tile the global epoch order."""
    import jax
    from diffsheg_tpu.data.loader import ShardedBatchLoader
    from diffsheg_tpu.parallel import collectives as col

    cfg = tiny_config()
    ds = SynthDataset(cfg)

    class _IndexDs:
        def __len__(self):
            return len(ds)

        def batch(self, indices):
            return {"i": np.asarray(indices)}

    ld = ShardedBatchLoader(
        _IndexDs(), global_batch_size=GLOBAL_BATCH, seed=3,
        process_index=jax.process_index(),
        process_count=jax.process_count(), prefetch=0)
    local = np.concatenate([b["i"] for b in ld])
    world = col.gather_arrays(local)
    # disjoint across processes and covering the epoch
    n_batches = DS_LEN // GLOBAL_BATCH
    ok_cover = len(np.unique(world)) == n_batches * GLOBAL_BATCH \
        and len(world) == n_batches * GLOBAL_BATCH
    return {"loader_ok": float(ok_cover)}


# -- worker entry -----------------------------------------------------------

def worker_main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, required=True)
    ap.add_argument("--testset-dir", default="",
                    help="if set, also run the multi-process "
                         "generate_testset check writing here")
    args = ap.parse_args(argv)

    # must run before any jax computation; the axon TPU plugin ignores the
    # env var, so force through jax.config as well
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == args.local_devices, (
        jax.local_device_count(), args.local_devices)

    result = {"process_id": args.process_id,
              "global_devices": jax.device_count()}
    result.update(check_collectives())
    result.update(check_loader_partition())
    result.update(compute_lockstep())
    if args.testset_dir:
        result.update(check_testset_shard(args.testset_dir))
    print("MP_RESULT " + json.dumps(result), flush=True)
    return 0


# -- parent harness ---------------------------------------------------------

def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def spawn_workers(num_processes: int, local_devices: int,
                  timeout: float = 600.0,
                  testset_dir: str = "") -> List[Dict]:
    """Spawn the distributed workers and collect their result dicts."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "diffsheg_tpu.parallel.mp_lockstep",
             "--coordinator", f"localhost:{port}",
             "--num-processes", str(num_processes),
             "--process-id", str(pid),
             "--local-devices", str(local_devices),
             "--testset-dir", testset_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env, cwd=REPO_ROOT, text=True))
    results = []
    errs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError("multi-process lockstep worker timed out")
        errs.append(err)
        for line in out.splitlines():
            if line.startswith("MP_RESULT "):
                results.append(json.loads(line[len("MP_RESULT "):]))
                break
        else:
            raise RuntimeError(
                f"worker rc={p.returncode} produced no result.\n"
                f"stdout:\n{out}\nstderr:\n{err[-4000:]}")
    return results


def run_lockstep(num_processes: int = 2, local_devices: int = 4,
                 timeout: float = 600.0, testset: bool = False) -> Dict:
    """Spawn workers, compute the single-process reference in-process, and
    verify agreement.  The calling process must already have
    ``num_processes * local_devices`` devices (virtual CPU mesh).

    Returns {"workers": [...], "reference": {...}} after asserting:
      - every collectives / loader check passed on every worker,
      - worker losses and updated-parameter norms agree across processes,
      - they match the single-process result to float tolerance.
    """
    import shutil
    import tempfile
    testset_dir = tempfile.mkdtemp(prefix="mp_testset_") if testset else ""
    try:
        return _run_lockstep_inner(num_processes, local_devices, timeout,
                                   testset_dir)
    finally:
        if testset_dir:
            shutil.rmtree(testset_dir, ignore_errors=True)


def _run_lockstep_inner(num_processes: int, local_devices: int,
                        timeout: float, testset_dir: str) -> Dict:
    import jax
    n_global = num_processes * local_devices
    assert jax.device_count() == n_global, (
        f"parent needs {n_global} devices for the reference run, "
        f"has {jax.device_count()}")
    workers = spawn_workers(num_processes, local_devices, timeout,
                            testset_dir=testset_dir)
    assert len(workers) == num_processes
    for w in workers:
        assert w["global_devices"] == n_global, w
        assert w["metric_ok"] == 1.0, w
        assert w["gather_ok"] == 1.0, w
        assert w["ragged_ok"] == 1.0, w
        assert w["nanmean_ok"] == 1.0, w
        assert w["loader_ok"] == 1.0, w

    reference = compute_lockstep()
    for key, want in reference.items():
        got = [w[key] for w in workers]
        # processes must agree with each other bit-for-bit (replicated
        # results of the same global computation)
        assert max(got) == min(got), (key, got)
        np.testing.assert_allclose(
            got[0], want, rtol=2e-5, atol=1e-6,
            err_msg=f"{key}: multi-process != single-process")

    if testset_dir:
        _verify_testset(workers, num_processes)
    return {"workers": workers, "reference": reference}


def _verify_testset(workers: List[Dict], num_processes: int) -> None:
    """Assert the multi-process generate_testset run against the parent's
    single-process run: file-shard coverage, replicated reduced metrics,
    per-clip bitwise-keyed outputs, per-metric weighting semantics."""
    import shutil
    import tempfile

    # every clip written exactly once, tagged by its striding rank
    n_clips = TestsetSynthClips.N_CLIPS
    all_files = sorted(f for w in workers for f in w["testset_files"])
    want = sorted(f"clip_{i:05d}_rank{i % num_processes}.npy"
                  for i in range(n_clips))
    assert all_files == want, (all_files, want)

    # reduced metrics are replicated across processes
    for key in ("mse", "pck", "beat_align", "fgd", "clips"):
        got = [w["testset_metrics"][key] for w in workers]
        assert max(got) == min(got), (key, got)

    # single-process reference in THIS process (process_count()==1 here)
    single_dir = tempfile.mkdtemp(prefix="mp_testset_single_")
    try:
        single = check_testset_shard(single_dir)
    finally:
        shutil.rmtree(single_dir, ignore_errors=True)
    sm, wm = single["testset_metrics"], workers[0]["testset_metrics"]
    assert wm["clips"] == sm["clips"] == float(n_clips), (wm, sm)
    for key in ("mse", "pck", "fgd"):
        np.testing.assert_allclose(
            wm[key], sm[key], rtol=1e-4,
            err_msg=f"testset {key}: multi-process != single-process")
    # beat-align: only clips 0-2 carry audio (rank1's shard is a mix), so
    # agreement here proves the reduction weights by audio-clip count
    np.testing.assert_allclose(wm["beat_align"], sm["beat_align"],
                               rtol=1e-4, err_msg="testset beat_align")
    # per-clip outputs are keyed by clip index -> identical in both layouts
    for base, s in single["testset_sums"].items():
        ws = [w["testset_sums"][base] for w in workers
              if base in w["testset_sums"]]
        assert len(ws) == 1, (base, ws)
        np.testing.assert_allclose(ws[0], s, rtol=1e-5,
                                   err_msg=f"testset clip {base}")


if __name__ == "__main__":
    sys.exit(worker_main())
