"""Eval-stack tests: Frechet math vs scipy oracle, pose metrics vs brute
force, FGD net shapes."""

import numpy as np
import pytest

from diffsheg_tpu.eval import metrics as M
from diffsheg_tpu.eval.fgd_net import FgdNetConfig, init_fgd_net


def _rand_gaussians(seed, d=8):
    rng = np.random.RandomState(seed)
    a = rng.randn(d, d)
    b = rng.randn(d, d)
    return (rng.randn(d), a @ a.T + np.eye(d) * 0.1,
            rng.randn(d), b @ b.T + np.eye(d) * 0.1)


class TestFrechet:
    def test_zero_for_identical(self):
        mu, s, _, _ = _rand_gaussians(0)
        assert abs(M.frechet_distance(mu, s, mu, s)) < 1e-8

    def test_matches_scipy_sqrtm(self):
        for seed in range(3):
            mu1, s1, mu2, s2 = _rand_gaussians(seed)
            ours = M.frechet_distance(mu1, s1, mu2, s2)
            ref = M.frechet_distance_scipy(mu1, s1, mu2, s2)
            assert abs(ours - ref) < 1e-6 * max(1.0, abs(ref))

    def test_mean_shift_only(self):
        d = 5
        mu1, s = np.zeros(d), np.eye(d)
        mu2 = np.ones(d) * 2.0
        # identical covariances -> distance = ||mu1-mu2||^2
        assert abs(M.frechet_distance(mu1, s, mu2, s) - 4.0 * d) < 1e-8

    def test_from_activations(self):
        rng = np.random.RandomState(1)
        a = rng.randn(400, 6)
        b = rng.randn(400, 6) + 3.0
        near = M.frechet_from_activations(a, a[::-1])
        far = M.frechet_from_activations(a, b)
        assert near < 0.5 < far


class TestPoseMetrics:
    def test_mse_pck(self):
        B, T, J = 2, 4, 3
        out = np.zeros((B, T, J, 3))
        tgt = np.zeros((B, T, J, 3))
        tgt[..., 0] = 0.1  # every joint off by 0.1 -> dist 0.1 < 0.5
        mse, pck = M.mse_pck(out, tgt)
        assert abs(mse - 0.01 / 3) < 1e-9
        assert pck == 1.0
        tgt[..., 0] = 1.0  # dist 1.0 > 0.5
        _, pck = M.mse_pck(out, tgt)
        assert pck == 0.0

    def test_diversity_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        x = rng.randn(6, 3, 4, 3)
        got = M.diversity(x, batch=6)
        # reference double loop (ddpm_beat_trainer.py:605-613)
        acc = 0.0
        for i in range(6):
            for j in range(i + 1, 6):
                acc += np.mean(np.abs(x[i] - x[j]))
        expect = acc * 2 / (6 * 5)
        assert abs(got - expect) < 1e-12

    def test_distance_matrix(self):
        rng = np.random.RandomState(2)
        a, b = rng.randn(5, 4), rng.randn(7, 4)
        d = M.euclidean_distance_matrix(a, b)
        brute = np.linalg.norm(a[:, None] - b[None], axis=-1)
        np.testing.assert_allclose(d, brute, atol=1e-10)

    def test_r_precision_perfect(self):
        e = np.eye(10) * 5.0
        rp = M.r_precision(e, e, top_k=3)
        np.testing.assert_allclose(rp, [1.0, 1.0, 1.0])

    def test_beat_alignment_perfect_vs_off(self):
        fps = 15.0
        t = np.arange(60)
        # velocity dips at frames 15, 30, 45
        motion = np.cumsum(
            1.0 + np.where(np.isin(t, [15, 30, 45]), -1.0, 0.0))[:, None]
        motion = np.repeat(motion, 3, axis=1)
        beats = np.array([15.0, 30.0, 45.0]) / fps
        aligned = M.beat_alignment(motion, beats, fps)
        off = M.beat_alignment(motion, beats + 0.4, fps)
        assert aligned > off


class TestFgdNet:
    @pytest.mark.parametrize("frames,flat", [(34, 12), (88, 39)])
    def test_conv_out_frames(self, frames, flat):
        cfg = FgdNetConfig(n_frames=frames, pose_dim=8, feature_length=4)
        assert cfg.conv_out_frames == flat

    def test_forward_shape(self):
        cfg = FgdNetConfig(n_frames=34, pose_dim=12, feature_length=8)
        model, variables = init_fgd_net(cfg)
        import jax.numpy as jnp
        out = model.apply(variables, jnp.ones((3, 34, 12)))
        assert out.shape == (3, 8)
        assert np.isfinite(np.asarray(out)).all()


class TestTemporalFilter:
    def test_matches_scipy_gaussian(self):
        from scipy.ndimage import gaussian_filter1d
        import jax.numpy as jnp
        from diffsheg_tpu.utils.filters import motion_temporal_filter
        rng = np.random.RandomState(0)
        x = rng.randn(2, 30, 5).astype(np.float32)
        got = np.asarray(motion_temporal_filter(jnp.asarray(x), sigma=2.5))
        ref = gaussian_filter1d(x, sigma=2.5, axis=1, mode="nearest")
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_preserves_constant(self):
        import jax.numpy as jnp
        from diffsheg_tpu.utils.filters import motion_temporal_filter
        x = jnp.ones((1, 20, 3)) * 7.0
        out = motion_temporal_filter(x, sigma=1.5)
        np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)


class TestChannelMetrics:
    def test_divisible_matches_joint_form(self):
        rng = np.random.RandomState(0)
        a, b = rng.randn(2, 4, 6), rng.randn(2, 4, 6)
        m1, p1 = M.mse_pck_channels(a, b)
        m2, p2 = M.mse_pck(a.reshape(2, 4, 2, 3), b.reshape(2, 4, 2, 3))
        assert m1 == m2 and p1 == p2

    def test_non_divisible_channels(self):
        # SHOW motion_dim=232 is not divisible by 3: must not crash
        rng = np.random.RandomState(1)
        a = rng.randn(2, 4, 232) * 0.01
        b = np.zeros((2, 4, 232))
        m, p = M.mse_pck_channels(a, b)
        assert np.isfinite(m) and 0.9 < p <= 1.0


class TestBeatAlignProtocol:
    """Protocol constants of the external BEAT harness, asserted explicitly
    (alignment(sigma=0.3, order=7); mean over kinematic beats)."""

    def test_defaults(self):
        import inspect
        sig = inspect.signature(M.beat_alignment)
        assert sig.parameters["sigma"].default == 0.3
        assert sig.parameters["order"].default == 7

    def test_kinematic_beats_order_window(self):
        # a dip must be strictly below every neighbour within +-order frames
        vel = np.ones(40)
        vel[10] = 0.1            # isolated deep dip -> beat
        vel[20] = 0.5            # dip ...
        vel[24] = 0.2            # ... shadowed by a deeper one 4 frames away
        motion = np.concatenate([[0.0], np.cumsum(vel)])[:, None]
        beats = M.kinematic_beats(motion, order=7)
        assert 10 in beats
        assert 24 in beats and 20 not in beats
        # order=3 window is narrower: both count
        beats3 = M.kinematic_beats(motion, order=3)
        assert 20 in beats3 and 24 in beats3

    def test_hand_computed_score(self):
        fps, sigma = 15.0, 0.3
        vel = np.ones(60)
        vel[15] = 0.0
        vel[40] = 0.0
        motion = np.concatenate([[0.0], np.cumsum(vel)])[:, None]
        audio = np.array([1.1, 2.0])  # seconds
        # kinematic beats at velocity indices 15, 40 -> times 1.0, 2.6667
        d1 = min(abs(15 / fps - 1.1), abs(15 / fps - 2.0))     # 0.1
        d2 = min(abs(40 / fps - 1.1), abs(40 / fps - 2.0))     # 0.6667
        expect = 0.5 * (np.exp(-d1**2 / (2 * sigma**2))
                        + np.exp(-d2**2 / (2 * sigma**2)))
        got = M.beat_alignment(motion, audio, fps)
        assert got == pytest.approx(expect, rel=1e-9)

    def test_averages_over_kinematic_not_audio_beats(self):
        # 1 kinematic beat, 3 audio beats: one perfect audio hit must give a
        # perfect score when averaging over kinematic beats (it would be
        # diluted to ~1/3 if averaged over audio beats)
        fps = 15.0
        vel = np.ones(60)
        vel[30] = 0.0
        motion = np.concatenate([[0.0], np.cumsum(vel)])[:, None]
        audio = np.array([30 / fps, 10.0, 20.0])
        assert M.beat_alignment(motion, audio, fps) == pytest.approx(1.0)


class TestDiversityProtocol:
    def test_group_size_and_remainder(self):
        # reference splits into full B_div groups and drops the remainder
        # (ddpm_beat_trainer.py:601-614)
        rng = np.random.RandomState(0)
        x = rng.randn(7, 3, 4)
        got = M.diversity(x, batch=3)
        exp_groups = []
        for g in (x[0:3], x[3:6]):
            acc = 0.0
            for i in range(3):
                for j in range(i + 1, 3):
                    acc += np.mean(np.abs(g[i] - g[j]))
            exp_groups.append(acc * 2 / (3 * 2))
        assert got == pytest.approx(np.mean(exp_groups), rel=1e-12)

    def test_small_batch_uses_all(self):
        rng = np.random.RandomState(1)
        x = rng.randn(4, 2, 2)
        got = M.diversity(x, batch=50)  # B < 50 -> one group of B
        acc = 0.0
        for i in range(4):
            for j in range(i + 1, 4):
                acc += np.mean(np.abs(x[i] - x[j]))
        assert got == pytest.approx(acc * 2 / (4 * 3), rel=1e-12)


class TestSRGR:
    """SRGR golden values (BEAT-paper definition, eval/metrics.py::srgr)."""

    def test_hand_computed_golden(self):
        # 2 frames, 2 joints (C=6).  Joint L1 diffs chosen around the 0.3
        # threshold; semantic track [1.0, 3.0] -> mean 2.0.
        out = np.array([[0.0, 0.0, 0.0, 0.1, 0.1, 0.05],
                        [0.2, 0.2, 0.0, 0.0, 0.0, 0.0]])
        gt = np.zeros((2, 6))
        sem = np.array([1.0, 3.0])
        # L1 per joint: f0=[0.0 ok, 0.25 ok], f1=[0.4 MISS, 0.0 ok]
        # weights w_t = sem/mean(sem) = [0.5, 1.5]
        # mean over 4 (frame,joint) cells: (0.5+0.5+0+1.5)/4 = 0.625
        assert M.srgr(out, gt, sem) == pytest.approx(0.625, rel=1e-12)

    def test_harness_avg_weight_convention(self):
        # with the harness's hard-coded normalizer, all-recalled frames
        # score sem/0.165 each — golden: sem=[0.165] -> exactly 1.0
        out = np.zeros((1, 3)); gt = np.zeros((1, 3))
        assert M.srgr(out, gt, np.array([0.165]),
                      avg_weight=0.165) == pytest.approx(1.0)
        assert M.srgr(out, gt, np.array([0.33]),
                      avg_weight=0.165) == pytest.approx(2.0)

    def test_perfect_match_self_normalized_is_one(self):
        rng = np.random.RandomState(0)
        x = rng.randn(10, 141)
        sem = rng.rand(10)
        assert M.srgr(x, x, sem) == pytest.approx(1.0)

    def test_unannotated_clip_falls_back_to_plain_recall(self):
        out = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
        gt = np.zeros((1, 6))
        # sem all zero: plain recall = 1 of 2 joints
        assert M.srgr(out, gt, np.zeros(1)) == pytest.approx(0.5)

    def test_threshold_is_l1_over_joint_channels(self):
        # per-channel diff 0.11 -> joint L1 0.33 > 0.3 -> miss; a
        # per-channel or L2 rule would (wrongly) count this as recalled
        out = np.full((1, 3), 0.11)
        gt = np.zeros((1, 3))
        assert M.srgr(out, gt, np.ones(1)) == 0.0
        assert M.srgr(out, gt, np.ones(1), threshold=0.34) == 1.0
