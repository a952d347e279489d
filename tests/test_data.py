"""Data-layer tests: cache round-trips, windowing semantics, SMPL-X
carpentry, loader sharding."""

import json
import os

import numpy as np
import pytest

from diffsheg_tpu.data.cache import ArrayCache, CacheWriter, cache_exists
from diffsheg_tpu.data import show as show_mod
from diffsheg_tpu.data.beat import (
    BeatBuildConfig,
    BeatStats,
    build_beat_cache,
    BeatDataset,
    motion_window_passes_filter,
    semantic_scores_per_frame,
    session_time_offset,
    _interp_frames,
)
from diffsheg_tpu.data.loader import ShardedBatchLoader


class TestArrayCache:
    def test_fixed_roundtrip(self, tmp_path):
        w = CacheWriter(str(tmp_path / "c"))
        for i in range(5):
            w.add({"x": np.full((3, 2), i, dtype=np.float32),
                   "y": np.asarray([i], dtype=np.int32)})
        w.finalize()
        c = ArrayCache(str(tmp_path / "c"))
        assert len(c) == 5
        np.testing.assert_array_equal(c[2]["x"], np.full((3, 2), 2))
        got = c.batch(np.asarray([0, 3]))
        np.testing.assert_array_equal(got["y"][:, 0], [0, 3])

    def test_ragged_roundtrip(self, tmp_path):
        w = CacheWriter(str(tmp_path / "r"))
        lens = [4, 7, 2]
        for i, L in enumerate(lens):
            w.add({"seq": np.full((L, 3), i, dtype=np.float32)})
        w.finalize()
        c = ArrayCache(str(tmp_path / "r"))
        for i, L in enumerate(lens):
            assert c[i]["seq"].shape == (L, 3)
            assert (c[i]["seq"] == i).all()

    def test_meta(self, tmp_path):
        w = CacheWriter(str(tmp_path / "m"), meta={"fps": 15})
        w.add({"x": np.zeros(2)})
        w.finalize()
        assert cache_exists(str(tmp_path / "m"))
        assert ArrayCache(str(tmp_path / "m")).meta["fps"] == 15


class TestBeatSemantics:
    def test_sem_scores(self, tmp_path):
        p = tmp_path / "sem.txt"
        p.write_text("w\t0.0\t1.0\t1.0\t0.5\thello\n"
                     "w\t2.0\t3.0\t1.0\t0.9\tworld\n")
        s = semantic_scores_per_frame(str(p), n_frames=60, fps=15.0)
        assert s[0] == 0.5          # t=0 in [0,1]
        assert s[15] == 0.5         # t=1.0 boundary inclusive
        assert s[20] == 0.0         # t=1.33 in gap
        assert s[30] == 0.9         # t=2.0
        assert s[50] == 0.0         # t=3.33 past end

    def test_sem_offset(self, tmp_path):
        p = tmp_path / "sem.txt"
        p.write_text("w\t30.0\t31.0\t1.0\t0.7\they\n")
        s = semantic_scores_per_frame(str(p), n_frames=30, fps=15.0,
                                      time_offset=30.0)
        assert s[0] == 0.7

    def test_session_offset_rule(self):
        # offset keys on the [-3] filename field's parity (beat.py:211-215)
        assert session_time_offset("1_wayne_0_1_1") == 0.0
        assert session_time_offset("1_wayne_0_2_b") == 30.0
        assert session_time_offset("1_wayne_1_3_b") == 300.0

    def test_motion_filter(self):
        mean = np.zeros(141)
        flat = np.zeros((34, 141)) + 0.001
        lively = np.random.RandomState(0).randn(34, 141)
        assert not motion_window_passes_filter(flat, mean)
        assert motion_window_passes_filter(lively, mean)

    def test_interp_frames_endpoints(self):
        x = np.arange(10, dtype=np.float64)[:, None]
        y = _interp_frames(x, 19)
        assert y[0, 0] == 0.0 and y[-1, 0] == 9.0
        assert abs(y[9, 0] - 4.5) < 1e-9


def _write_toy_beat_split(root, n_clips=2, secs=4, fps=15, sr=16000):
    """Synthesize a tiny BEAT-format split directory."""
    from diffsheg_tpu.geometry.face import write_face_json
    os.makedirs(root / "bvh_rot", exist_ok=True)
    os.makedirs(root / "wave16k", exist_ok=True)
    os.makedirs(root / "facial52", exist_ok=True)
    os.makedirs(root / "sem", exist_ok=True)
    rng = np.random.RandomState(0)
    T = secs * fps
    for c in range(n_clips):
        cid = f"{c + 2}_speaker_0_1_1"
        pose = rng.randn(T, 141) * 20.0
        np.savetxt(root / "bvh_rot" / f"{cid}.bvh", pose, fmt="%.6f")
        wav = rng.randn(secs * sr).astype(np.float32) * 0.1
        np.save(root / "wave16k" / f"{cid}.npy", wav)
        write_face_json(rng.rand(T, 51), str(root / "facial52" / f"{cid}.json"),
                        fps=fps)
        (root / "sem" / f"{cid}.txt").write_text(
            "w\t0.0\t2.0\t2.0\t0.6\thi\n")
    return T


class TestBeatCacheBuild:
    def test_build_and_read(self, tmp_path):
        T = _write_toy_beat_split(tmp_path)
        stats = BeatStats(
            mean_pose=np.zeros(141), std_pose=np.ones(141),
            mean_axis_angle=np.zeros(141), std_axis_angle=np.ones(141),
            mean_facial=np.zeros(51), std_facial=np.ones(51),
        )
        cfg = BeatBuildConfig(n_poses=34, stride=10)
        n = build_beat_cache(str(tmp_path), str(tmp_path / "cache"), stats,
                             cfg, log=lambda *a: None)
        # 60 frames usable, (60-34)//10+1 = 3 windows per clip x 2 clips
        assert n == 6
        ds = BeatDataset(str(tmp_path / "cache"), stats)
        assert len(ds) == 6
        s = ds[0]
        assert s["pose"].shape == (34, 141)
        assert s["pose_axis_angle"].shape == (34, 141)
        assert s["mel"].shape == (34, 128)
        assert s["facial"].shape == (34, 51)
        assert s["motion"].shape == (34, 192)
        assert s["sem"].shape == (34,)
        assert s["id"][0] in (1, 2)  # filename prefix - 1
        assert s["sem"][0] == pytest.approx(0.6)
        b = ds.batch(np.asarray([0, 1, 2]))
        assert b["motion"].shape == (3, 34, 192)

    def test_test_split_whole_clip(self, tmp_path):
        _write_toy_beat_split(tmp_path, n_clips=1)
        stats = BeatStats(
            mean_pose=np.zeros(141), std_pose=np.ones(141),
            mean_axis_angle=np.zeros(141), std_axis_angle=np.ones(141),
            mean_facial=np.zeros(51), std_facial=np.ones(51),
        )
        n = build_beat_cache(str(tmp_path), str(tmp_path / "tc"), stats,
                             BeatBuildConfig(), is_test=True,
                             log=lambda *a: None)
        assert n == 1
        ds = BeatDataset(str(tmp_path / "tc"), stats)
        assert ds[0]["pose"].shape == (60, 141)  # whole 4s clip @ 15fps


class TestShowCarpentry:
    def test_extract_dims(self):
        pose = np.arange(165.0)
        g = show_mod.extract_gesture(pose)
        assert g.shape == (129,)
        # up1 starts after jaw(3)+eyes(6)+global(3)+low1(6) = channel 18
        np.testing.assert_array_equal(g[:3], [18, 19, 20])
        # hands are the last 90 channels of the full vector
        np.testing.assert_array_equal(g[-90:], np.arange(75.0, 165.0))

    def test_combine_expression(self):
        pose = np.arange(165.0)
        expr = np.arange(100.0) + 1000.0
        e = show_mod.combine_expression(pose, expr)
        assert e.shape == (103,)
        np.testing.assert_array_equal(e[:3], [0, 1, 2])
        np.testing.assert_array_equal(e[3:], expr)

    def test_reassemble_roundtrip(self):
        rng = np.random.RandomState(0)
        full = rng.randn(4, 165)
        g = show_mod.extract_gesture(full)
        e = show_mod.combine_expression(full, rng.randn(4, 100))
        rebuilt = show_mod.reassemble_smplx(g, e)
        np.testing.assert_allclose(show_mod.extract_gesture(rebuilt), g)
        np.testing.assert_allclose(rebuilt[..., :3], full[..., :3])  # jaw

    def test_stats_quirk(self):
        d = {"pose_mean": np.arange(165.0),
             "pose_std": np.ones(165) * 2.0,
             "expression_mean": np.zeros(100),
             "expression_std": np.ones(100) * 3.0}
        st = show_mod.ShowStats.from_raw_dict(d)
        assert st.pose_mean.shape == (129,)
        # expression std jaw slot carries pose MEAN values (show.py:47)
        np.testing.assert_array_equal(st.expression_std[:3], [0, 1, 2])
        np.testing.assert_array_equal(st.expression_std[3:], np.full(100, 3.0))
        assert st.motion_mean.shape == (232,)

    def test_standardize_inverse(self):
        x = np.random.RandomState(1).randn(5, 7)
        m, s = x.mean(0), x.std(0) + 0.1
        z = show_mod.standardize(x, m, s)
        np.testing.assert_allclose(show_mod.inv_standardize(z, m, s), x,
                                   atol=1e-12)


class _CountingDs:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def batch(self, idx):
        return {"i": np.asarray(idx)}


class TestLoader:
    def test_epoch_coverage_and_determinism(self):
        ds = _CountingDs(103)
        ld = ShardedBatchLoader(ds, global_batch_size=10, seed=1, prefetch=0)
        seen = np.concatenate([b["i"] for b in ld])
        assert len(seen) == 100  # drop_last
        assert len(np.unique(seen)) == 100
        again = np.concatenate([b["i"] for b in ld])
        np.testing.assert_array_equal(seen, again)
        ld.set_epoch(1)
        third = np.concatenate([b["i"] for b in ld])
        assert not np.array_equal(seen, third)

    def test_sharding_partition(self):
        ds = _CountingDs(40)
        shards = []
        for p in range(4):
            ld = ShardedBatchLoader(ds, global_batch_size=8, seed=0,
                                    process_index=p, process_count=4,
                                    prefetch=0)
            rows = [b["i"] for b in ld]
            assert all(len(r) == 2 for r in rows)  # local batch = 8/4
            shards.append(np.concatenate(rows))
        union = np.concatenate(shards)
        assert len(np.unique(union)) == 40


class TestShowCacheBuild:
    def _seqs(self, n=2, T=200, fps=30, sr=16000):
        rng = np.random.RandomState(0)
        for i in range(n):
            yield {
                "pose": rng.randn(T, 165).astype(np.float32),
                "expression": rng.randn(T, 100).astype(np.float32),
                "audio": rng.randn(int(T / fps * sr)).astype(np.float32) * .1,
                "speaker": 20 + i,
            }

    def test_build_and_dataset(self, tmp_path):
        from diffsheg_tpu.data.show_cache import (ShowBuildConfig,
                                                  build_show_cache,
                                                  compute_show_stats)
        stats_raw = compute_show_stats(self._seqs())
        assert stats_raw["pose_mean"].shape == (165,)
        n = build_show_cache(self._seqs(), str(tmp_path / "sc"),
                             ShowBuildConfig(n_poses=88, stride=40),
                             log=lambda *a: None)
        # (200-88)//40+1 = 3 windows x 2 seqs
        assert n == 6
        st = show_mod.ShowStats.from_raw_dict(stats_raw)
        ds = show_mod.ShowDataset(str(tmp_path / "sc"), st)
        s = ds[0]
        assert s["gesture"].shape == (88, 129)
        assert s["expression"].shape == (88, 103)
        assert s["motion"].shape == (88, 232)
        assert s["mel"].shape == (88, 128)
        assert s["speaker"].shape == (4,)
        b = ds.batch(np.asarray([0, 3]))
        assert b["motion"].shape == (2, 88, 232)
        # speakers 20,21 -> one-hot 0,1
        assert b["speaker"][0][0] == 1.0 and b["speaker"][1][1] == 1.0


class TestBeatPreprocess:
    def _full_bvh(self, tmp_path, frames=16, fps=120):
        """Synthesize a full 75-joint BEAT-layout BVH."""
        from diffsheg_tpu.geometry.joints import BEAT_JOINT_ORDER
        lines = ["HIERARCHY"]

        def emit(name, depth, root=False):
            pad = "  " * depth
            lines.append(f"{pad}{'ROOT' if root else 'JOINT'} {name}")
            lines.append(f"{pad}{{")
            lines.append(f"{pad}  OFFSET 0.0 1.0 0.0")
            ch = ("CHANNELS 6 Xposition Yposition Zposition "
                  "Zrotation Xrotation Yrotation" if root else
                  "CHANNELS 3 Zrotation Xrotation Yrotation")
            lines.append(f"{pad}  {ch}")

        emit(BEAT_JOINT_ORDER[0], 0, root=True)
        for j, name in enumerate(BEAT_JOINT_ORDER[1:]):
            emit(name, j + 1)
        lines.append("  " * len(BEAT_JOINT_ORDER) + "End Site")
        lines.append("  " * len(BEAT_JOINT_ORDER) + "{")
        lines.append("  " * len(BEAT_JOINT_ORDER) + "  OFFSET 0 0.1 0")
        lines.append("  " * len(BEAT_JOINT_ORDER) + "}")
        for d in range(len(BEAT_JOINT_ORDER), 0, -1):
            lines.append("  " * (d - 1) + "}")
        lines.append("MOTION")
        lines.append(f"Frames: {frames}")
        lines.append(f"Frame Time: {1.0 / fps:.8f}")
        rng = np.random.RandomState(0)
        rows = rng.randn(frames, 228) * 10
        rows[:, 228 - 228] = 0
        for r in rows:
            lines.append(" ".join("%.4f" % v for v in r))
        p = tmp_path / "full.bvh"
        p.write_text("\n".join(lines))
        return str(p), rows

    def test_subselect_downsample(self, tmp_path):
        from diffsheg_tpu.data.beat_preprocess import subselect_and_downsample
        from diffsheg_tpu.geometry.joints import SPINE_NECK_141_IN_BEAT
        path, rows = self._full_bvh(tmp_path, frames=16, fps=120)
        rot, fps = subselect_and_downsample(path, target_fps=15.0)
        assert fps == 15.0
        assert rot.shape == (2, 141)  # 16 frames / factor 8
        np.testing.assert_allclose(rot[0], rows[0][SPINE_NECK_141_IN_BEAT],
                                   atol=1e-3)
        np.testing.assert_allclose(rot[1], rows[8][SPINE_NECK_141_IN_BEAT],
                                   atol=1e-3)

    def test_vis_template_roundtrip(self, tmp_path):
        from diffsheg_tpu.data.beat_preprocess import make_vis_template
        from diffsheg_tpu.geometry.bvh import rewrite_template
        path, rows = self._full_bvh(tmp_path, frames=4, fps=15)
        tmpl_path = tmp_path / "template.bvh"
        make_vis_template(path, str(tmpl_path))
        text = tmpl_path.read_text()
        lines = text.splitlines()
        header_n = next(i for i, ln in enumerate(lines)
                        if ln.startswith("Frame Time")) + 1
        rest = np.fromstring(lines[header_n], dtype=float, sep=" ")
        assert rest.shape == (228,)
        np.testing.assert_allclose(rest[3:], 0.0)  # rotations zeroed
        # the template feeds the generated-motion rewriter
        gen = np.full((3, 141), 5.0)
        out = rewrite_template(text, gen, header_lines=header_n)
        body = np.loadtxt(out.splitlines()[header_n:])
        from diffsheg_tpu.geometry.joints import SPINE_NECK_141_IN_BEAT
        np.testing.assert_allclose(body[:, SPINE_NECK_141_IN_BEAT], 5.0)

    def test_channel_stats(self, tmp_path):
        from diffsheg_tpu.data.beat_preprocess import channel_stats
        rng = np.random.RandomState(1)
        d = tmp_path / "rot"
        d.mkdir()
        all_rows = []
        for i in range(2):
            rows = rng.randn(10, 6) + i
            all_rows.append(rows)
            np.savetxt(d / f"c{i}.bvh", rows, fmt="%.8f")
        st = channel_stats(str(d))
        cat = np.concatenate(all_rows)
        np.testing.assert_allclose(st["mean"], cat.mean(0), atol=1e-6)
        np.testing.assert_allclose(st["std"], cat.std(0), atol=1e-6)


class TestLoaderEarlyExit:
    def test_abandoned_iterator_releases_worker(self):
        import threading
        ds = _CountingDs(64)
        ld = ShardedBatchLoader(ds, global_batch_size=4, prefetch=2)
        before = threading.active_count()
        for _ in range(3):
            it = iter(ld)
            next(it)
            it.close()  # abandon mid-epoch
        import time
        time.sleep(1.0)  # workers notice abandonment within 0.25s
        after = threading.active_count()
        assert after <= before + 1, (before, after)
