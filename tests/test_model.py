"""UniDiffuser model tests: shapes, determinism, CFG, the x0 bridge."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffsheg_tpu.config import beat_config, show_config
from diffsheg_tpu.models.embeddings import (
    timestep_embedding,
    positional_encoding,
    sinusoidal_position_table,
)
from diffsheg_tpu.models.unidiffuser import init_unidiffuser


def tiny_model_cfg(base=None, **kw):
    base = base or beat_config().model
    defaults = dict(latent_dim=64, num_layers=2, num_heads=4, ff_size=128,
                    hubert_latent_dim=32)
    defaults.update(kw)
    return dataclasses.replace(base, **defaults)


def make_inputs(cfg, B=2, T=34, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 5)
    x = jax.random.normal(ks[0], (B, T, cfg.motion_dim))
    t = jnp.array([3, 700])[:B]
    sa = (jnp.full((B, 1, 1), 1.2), jnp.full((B, 1, 1), 0.4))
    mel = jax.random.normal(ks[1], (B, T, cfg.audio_dim))
    pid = jax.nn.one_hot(jnp.arange(B) % cfg.style_dim, cfg.style_dim)
    hub = jax.random.normal(ks[2], (B, T, cfg.hubert_dim))
    return x, t, sa, mel, pid, hub


class TestEmbeddings:
    def test_timestep_embedding_layout(self):
        # guided-diffusion layout: [cos | sin], freq_0 = 1 => emb[:,0] = cos(t)
        t = jnp.array([0.0, 1.0, 2.0])
        e = timestep_embedding(t, 8)
        np.testing.assert_allclose(np.asarray(e[:, 0]), np.cos([0, 1, 2]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(e[:, 4]), np.sin([0, 1, 2]), atol=1e-6)
        assert e.shape == (3, 8)

    def test_timestep_embedding_odd_dim_pads(self):
        e = timestep_embedding(jnp.array([1.0]), 7)
        assert e.shape == (1, 7)
        assert float(e[0, -1]) == 0.0

    def test_position_table_interleaved(self):
        tab = sinusoidal_position_table(16, 8)
        # position 0: sin(0)=0 on even channels, cos(0)=1 on odd channels
        np.testing.assert_allclose(tab[0, 0::2], 0.0, atol=1e-7)
        np.testing.assert_allclose(tab[0, 1::2], 1.0, atol=1e-7)

    def test_periodic_pe_tiles(self):
        tab = positional_encoding("ppe_sinu", 60, 16)
        np.testing.assert_allclose(tab[:25], tab[25:50], atol=1e-7)

    def test_pe_sinu_not_periodic_within_600(self):
        tab = positional_encoding("pe_sinu", 60, 16, max_seq_len=600)
        assert not np.allclose(tab[0], tab[30])


class TestUniDiffuser:
    def setup_method(self):
        self.cfg = tiny_model_cfg()
        self.model, self.variables = init_unidiffuser(
            self.cfg, 34, jax.random.PRNGKey(0), batch=2)

    def test_param_tree_structure(self):
        p = self.variables["params"]
        assert set(p.keys()) == {"time_embed", "encoder_aud", "encoder_exp",
                                 "encoder_ges"}
        # both branches have 2 layers + embeds
        for br in ("encoder_exp", "encoder_ges"):
            assert "layer_0" in p[br] and "layer_1" in p[br]
            assert "joint_embed" in p[br] and "audio_proj" in p[br]
        # gesture branch sees exp_cond: its feat_proj input is wider
        w_ges = p["encoder_ges"]["layer_0"]["feat_proj"]["fc1"]["kernel"]
        w_exp = p["encoder_exp"]["layer_0"]["feat_proj"]["fc1"]["kernel"]
        assert w_ges.shape[0] == w_exp.shape[0] + self.cfg.expression_dim

    def test_forward_shape_and_determinism(self):
        x, t, sa, mel, pid, hub = make_inputs(self.cfg)
        out1 = self.model.apply(self.variables, x, t, sa, mel, pid, hubert=hub)
        out2 = self.model.apply(self.variables, x, t, sa, mel, pid, hubert=hub)
        assert out1.shape == x.shape
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_zero_init_blocks_make_identity_residuals(self):
        # At init, StylizationBlock/FFN out projections are zero, so layer
        # outputs reduce to the cond-projection residual path; the model must
        # still produce finite, input-dependent output.
        x, t, sa, mel, pid, hub = make_inputs(self.cfg)
        out = self.model.apply(self.variables, x, t, sa, mel, pid, hubert=hub)
        assert bool(jnp.isfinite(out).all())
        out_b = self.model.apply(
            self.variables, x * 2.0, t, sa, mel, pid, hubert=hub)
        assert not np.allclose(np.asarray(out), np.asarray(out_b))

    def test_x0_bridge_blocks_gradient(self):
        # Gradient of a gesture-only loss must not flow into the expression
        # branch through the detached x0 bridge (transformer.py:749).
        x, t, sa, mel, pid, hub = make_inputs(self.cfg)
        pose_dim = self.cfg.pose_dim

        def ges_loss(params):
            out = self.model.apply(
                {**self.variables, "params": params}, x, t, sa, mel, pid,
                hubert=hub)
            return jnp.sum(out[..., :pose_dim] ** 2)

        grads = jax.grad(ges_loss)(self.variables["params"])
        exp_norm = sum(
            float(jnp.abs(g).sum())
            for g in jax.tree.leaves(grads["encoder_exp"]))
        ges_norm = sum(
            float(jnp.abs(g).sum())
            for g in jax.tree.leaves(grads["encoder_ges"]))
        assert exp_norm == 0.0
        assert ges_norm > 0.0

    def test_expression_loss_reaches_audio_encoder(self):
        x, t, sa, mel, pid, hub = make_inputs(self.cfg)

        def exp_loss(params):
            out = self.model.apply(
                {**self.variables, "params": params}, x, t, sa, mel, pid,
                hubert=hub)
            return jnp.sum(out[..., self.cfg.pose_dim:] ** 2)

        grads = jax.grad(exp_loss)(self.variables["params"])
        aud_norm = sum(
            float(jnp.abs(g).sum())
            for g in jax.tree.leaves(grads["encoder_aud"]))
        assert aud_norm > 0.0


class TestCFG:
    def test_cond_scale_one_matches_uncond_free_path(self):
        # cfg_inference with cond_scale == 1 must be a no-op vs plain forward.
        cfg = tiny_model_cfg(show_config().model, classifier_free=True,
                             cond_scale=1.0, style_dim=4)
        model, variables = init_unidiffuser(cfg, 16, jax.random.PRNGKey(1))
        x, t, sa, mel, pid, hub = make_inputs(cfg, B=2, T=16, seed=3)
        a = model.apply(variables, x, t, sa, mel, pid, hubert=hub,
                        cfg_inference=False)
        b = model.apply(variables, x, t, sa, mel, pid, hubert=hub,
                        cfg_inference=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_cond_scale_changes_output(self):
        cfg = tiny_model_cfg(show_config().model, classifier_free=True,
                             cond_scale=1.15, style_dim=4)
        model, variables = init_unidiffuser(cfg, 16, jax.random.PRNGKey(1))
        x, t, sa, mel, pid, hub = make_inputs(cfg, B=2, T=16, seed=3)
        a = model.apply(variables, x, t, sa, mel, pid, hubert=hub,
                        cfg_inference=False)
        b = model.apply(variables, x, t, sa, mel, pid, hubert=hub,
                        cfg_inference=True)
        assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_null_cond_param_exists_only_when_cfg(self):
        cfg_on = tiny_model_cfg(classifier_free=True)
        cfg_off = tiny_model_cfg(classifier_free=False)
        _, v_on = init_unidiffuser(cfg_on, 8, jax.random.PRNGKey(0))
        _, v_off = init_unidiffuser(cfg_off, 8, jax.random.PRNGKey(0))
        flat_on = jax.tree_util.tree_flatten_with_path(v_on["params"])[0]
        flat_off = jax.tree_util.tree_flatten_with_path(v_off["params"])[0]
        names_on = {jax.tree_util.keystr(p) for p, _ in flat_on}
        names_off = {jax.tree_util.keystr(p) for p, _ in flat_off}
        assert any("null_cond_emb" in n for n in names_on)
        assert not any("null_cond_emb" in n for n in names_off)

    def test_train_null_mask_is_deterministic_first_fraction(self):
        # linspace(0,1,B) < p picks the first ceil(p*(B-1)) rows.
        B, p = 10, 0.2
        mask = np.asarray(jnp.linspace(0.0, 1.0, B) < p)
        assert mask.tolist() == [True, True] + [False] * 8


class TestBatchNorm:
    def test_train_updates_batch_stats(self):
        cfg = tiny_model_cfg()
        model, variables = init_unidiffuser(cfg, 8, jax.random.PRNGKey(0))
        x, t, sa, mel, pid, hub = make_inputs(cfg, B=2, T=8)
        before = jax.tree.leaves(variables["batch_stats"])
        _, upd = model.apply(variables, x, t, sa, mel, pid, hubert=hub,
                             train=True, mutable=["batch_stats"])
        after = jax.tree.leaves(upd["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after))


class TestBranchModes:
    """Single-branch ablation models (reference runner.py:32-58 +
    --expression_only/--gesture_only/--expCondition_gesture_only)."""

    def _cfg(self, **kw):
        import dataclasses
        from diffsheg_tpu.config import beat_config
        base = beat_config().model
        return dataclasses.replace(
            base, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
            hubert_latent_dim=16, add_hubert=False, **kw)

    def _run(self, cfg, **extra):
        import jax
        from diffsheg_tpu.models.factory import (denoised_channels,
                                                 init_denoiser)
        model, variables = init_denoiser(cfg, 8, jax.random.PRNGKey(0))
        B, T = 2, 8
        C = denoised_channels(cfg)
        out = model.apply(
            variables,
            jnp.ones((B, T, C)) * 0.1,
            jnp.zeros((B,), dtype=jnp.int32),
            (jnp.ones((B, 1, 1)), jnp.ones((B, 1, 1))),
            jnp.ones((B, T, cfg.audio_dim)),
            jnp.zeros((B, cfg.style_dim)),
            train=False, **extra)
        return out, C

    def test_expression_only(self):
        cfg = self._cfg(branch_mode="expression_only")
        out, C = self._run(cfg)
        assert C == cfg.expression_dim
        assert out.shape == (2, 8, cfg.expression_dim)

    def test_gesture_only(self):
        cfg = self._cfg(branch_mode="gesture_only")
        out, C = self._run(cfg)
        assert out.shape == (2, 8, cfg.pose_dim)

    def test_exp_condition_gesture(self):
        cfg = self._cfg(branch_mode="exp_condition_gesture")
        out, _ = self._run(cfg, exp_cond=jnp.ones((2, 8, cfg.expression_dim)))
        assert out.shape == (2, 8, cfg.pose_dim)

    def test_exp_condition_requires_cond(self):
        import pytest as _pytest
        cfg = self._cfg(branch_mode="exp_condition_gesture")
        with _pytest.raises(ValueError):
            self._run(cfg)

    def test_remove_audio_zeroes_mel_effect(self):
        import jax
        from diffsheg_tpu.models.factory import ablate_inputs
        cfg = self._cfg(remove_audio=True)
        mel = jnp.ones((2, 8, cfg.audio_dim))
        pid = jnp.ones((2, cfg.style_dim))
        m2, p2 = ablate_inputs(cfg, mel, pid)
        assert float(jnp.abs(m2).max()) == 0.0
        assert float(jnp.abs(p2 - pid).max()) == 0.0
        cfg2 = self._cfg(remove_style=True)
        m3, p3 = ablate_inputs(cfg2, mel, pid)
        assert float(jnp.abs(p3).max()) == 0.0
        assert float(jnp.abs(m3 - mel).max()) == 0.0

    def test_single_branch_trains(self):
        import dataclasses
        import jax
        from diffsheg_tpu.config import beat_config
        from diffsheg_tpu.diffusion.schedule import (get_named_beta_schedule,
                                                     make_schedule)
        from diffsheg_tpu.models.factory import init_denoiser
        from diffsheg_tpu.train.step import (create_train_state,
                                             make_train_step)
        cfg = beat_config()
        cfg = cfg.replace(model=self._cfg(branch_mode="gesture_only"))
        _, variables = init_denoiser(cfg.model, 8, jax.random.PRNGKey(0))
        sched = make_schedule(get_named_beta_schedule("linear", 1000))
        step = make_train_step(cfg, sched)
        state = create_train_state(cfg, variables)
        batch = {
            "motion": jnp.ones((4, 8, cfg.model.pose_dim)) * 0.2,
            "mel": jnp.ones((4, 8, cfg.model.audio_dim)),
            "pid": jax.nn.one_hot(jnp.arange(4), cfg.model.style_dim),
            "sem": jnp.ones((4, 8)) * 0.5,
        }
        state, terms = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(terms.total))


class TestSpeechEncoderModes:
    def test_linear_and_raw_modes(self):
        import dataclasses
        import jax
        from diffsheg_tpu.config import beat_config
        from diffsheg_tpu.models.factory import init_denoiser
        for mode, hd, hl in (("linear", 768, 256), ("raw", 64, 64)):
            cfg = dataclasses.replace(
                beat_config().model, latent_dim=32, num_layers=1,
                num_heads=2, ff_size=64, hubert_dim=hd, hubert_latent_dim=hl,
                speech_encoder=mode,
                encode_hubert=mode != "raw")
            model, variables = init_denoiser(cfg, 8, jax.random.PRNGKey(0))
            B, T = 2, 8
            out = model.apply(
                variables, jnp.zeros((B, T, cfg.motion_dim)),
                jnp.zeros((B,), dtype=jnp.int32),
                (jnp.ones((B, 1, 1)), jnp.ones((B, 1, 1))),
                jnp.zeros((B, T, cfg.audio_dim)),
                jnp.zeros((B, cfg.style_dim)),
                hubert=jnp.zeros((B, T, hd)), train=False)
            assert out.shape == (B, T, cfg.motion_dim), mode


class TestScanLayers:
    """model.scan_layers: the branch stacks as ONE lax.scan over
    layer-stacked params — identical math to the unrolled loop, with
    {stack,unstack}_scan_layers converting between the two layouts."""

    def _pair(self, **kw):
        from diffsheg_tpu.models.factory import stack_scan_layers
        from diffsheg_tpu.models.unidiffuser import UniDiffuser

        cfg = tiny_model_cfg(num_layers=3, add_hubert=False, **kw)
        _, v = init_unidiffuser(cfg, 12, jax.random.PRNGKey(0))
        cfg_scan = dataclasses.replace(cfg, scan_layers=True)
        v_scan = {"params": stack_scan_layers(v["params"], cfg.num_layers)}
        return (cfg, UniDiffuser(cfg), v,
                cfg_scan, UniDiffuser(cfg_scan), v_scan)

    def test_forward_matches_unrolled(self):
        cfg, m, v, cfg_s, m_s, v_s = self._pair()
        x, t, sa, mel, pid, hub = make_inputs(cfg, T=12)
        a = np.asarray(m.apply(v, x, t, sa, mel, pid))
        b = np.asarray(m_s.apply(v_s, x, t, sa, mel, pid))
        np.testing.assert_allclose(b, a, atol=1e-6, rtol=1e-6)

    def test_converter_roundtrip(self):
        from diffsheg_tpu.models.factory import (stack_scan_layers,
                                                 unstack_scan_layers)
        cfg = tiny_model_cfg(num_layers=3, add_hubert=False)
        _, v = init_unidiffuser(cfg, 12, jax.random.PRNGKey(1))
        back = unstack_scan_layers(
            stack_scan_layers(v["params"], 3), 3)
        flat_a = jax.tree_util.tree_leaves_with_path(v["params"])
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        assert len(flat_a) == len(flat_b)
        for path, leaf in flat_a:
            np.testing.assert_array_equal(np.asarray(flat_b[path]),
                                          np.asarray(leaf))

    @pytest.mark.slow  # >60s-class on one CPU core; core tier covers the same path via smaller tests
    def test_train_step_matches_unrolled(self):
        from diffsheg_tpu.config import beat_config
        from diffsheg_tpu.diffusion.schedule import (get_named_beta_schedule,
                                                     make_schedule)
        from diffsheg_tpu.models.factory import stack_scan_layers
        from diffsheg_tpu.train.step import (create_train_state,
                                             make_train_step)

        base = beat_config()
        cfg = base.replace(
            model=tiny_model_cfg(num_layers=3, add_hubert=False),
            data=dataclasses.replace(base.data, n_poses=12))
        _, v = init_unidiffuser(cfg.model, 12, jax.random.PRNGKey(2))
        cfg_s = cfg.replace(model=dataclasses.replace(cfg.model,
                                                      scan_layers=True))
        v_s = {"params": stack_scan_layers(v["params"],
                                           cfg.model.num_layers)}
        sched = make_schedule(get_named_beta_schedule(
            cfg.diffusion.beta_schedule, cfg.diffusion.num_steps))

        rng = np.random.RandomState(0)
        B, T = 4, 12
        batch = {
            "motion": jnp.asarray(rng.randn(B, T, cfg.model.motion_dim),
                                  jnp.float32),
            "mel": jnp.asarray(rng.randn(B, T, cfg.model.audio_dim),
                               jnp.float32),
            "pid": jnp.eye(cfg.model.style_dim)[
                jnp.arange(B) % cfg.model.style_dim],
            "sem": jnp.full((B, T), 0.5),
        }
        sa = create_train_state(cfg, v)
        sb = create_train_state(cfg_s, v_s)
        _, ta = make_train_step(cfg, sched)(sa, dict(batch),
                                            jax.random.PRNGKey(7))
        _, tb = make_train_step(cfg_s, sched)(sb, dict(batch),
                                              jax.random.PRNGKey(7))
        a, b = float(ta.total), float(tb.total)
        assert np.isfinite(a)
        assert abs(a - b) <= 1e-4 * max(1.0, abs(a)), (a, b)
