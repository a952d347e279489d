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
