"""Fused-layer fast path parity: Pallas engine == Flax cached forward.

The serving engine (models/fast_forward.py + ops/fused_layer.py) must
reproduce ``UniDiffuser.apply(..., cache=...)`` — which tests/test_level_cache.py
already pins against the plain forward.  Run in Pallas interpret mode on
CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsheg_tpu.config import beat_config, show_config
from diffsheg_tpu.diffusion.schedule import _gather
from diffsheg_tpu.models.fast_forward import (extract_fast_params,
                                              fast_unidiffuser_step)
from diffsheg_tpu.models.level_cache import build_level_cache, gather_level
from diffsheg_tpu.models.unidiffuser import init_unidiffuser
from diffsheg_tpu.sampling.generator import WindowGenerator
from diffsheg_tpu.ops.fused_layer import (LayerScales,
                                          extract_layer_params,
                                          fused_layer,
                                          fused_layer_reference,
                                          quantize_layer_params)


def tiny(cfg, **model_overrides):
    model = dataclasses.replace(
        cfg.model, latent_dim=64, num_layers=2, num_heads=4, ff_size=128,
        hubert_dim=48, hubert_latent_dim=32, **model_overrides)
    return cfg.replace(model=model)


def make_inputs(cfg, key, B=2):
    T = cfg.data.n_poses
    ks = jax.random.split(key, 4)
    mel = jax.random.normal(ks[0], (B, T, cfg.model.audio_dim))
    pid = jax.nn.one_hot(jnp.arange(B) % cfg.model.style_dim,
                         cfg.model.style_dim)
    hub = jax.random.normal(ks[1], (B, T, cfg.model.hubert_dim))
    x = jax.random.normal(ks[2], (B, T, cfg.model.motion_dim))
    return mel, pid, hub, x


class TestFusedLayerKernel:
    def test_kernel_matches_reference_padded(self):
        # non-128 feats width exercises the masked-LN padding path
        from diffsheg_tpu.models.blocks import DiffusionTransformerLayer
        B, T, L, H = 2, 13, 64, 4
        c_real, c_pad = 64 + 35, 128
        ks = jax.random.split(jax.random.PRNGKey(0), 8)
        layer = DiffusionTransformerLayer(L, 2 * L, H)
        variables = layer.init(
            jax.random.PRNGKey(1), jnp.zeros((B, T, L)),
            jnp.zeros((B, T, c_real - L)), jnp.zeros((B, 4 * L)),
            jnp.ones((B, T, 1)))
        p = variables["params"]
        # randomize the zero-init projections so the test is not trivial
        p = jax.tree.map(
            lambda a: jax.random.normal(ks[0], a.shape) * 0.2, p)
        lp = extract_layer_params(p, c_real, c_pad, jnp.float32)
        x = jax.random.normal(ks[1], (B, T, L))
        feats = jnp.pad(jax.random.normal(ks[2], (B, T, c_real)),
                        ((0, 0), (0, 0), (0, c_pad - c_real)))
        mod_sa = jax.random.normal(ks[3], (B, 2 * L))
        mod_ffn = jax.random.normal(ks[4], (B, 2 * L))
        ref = fused_layer_reference(x, feats, mod_sa, mod_ffn, lp, H, c_real)
        got = fused_layer(x, feats, mod_sa, mod_ffn, lp, H, c_real,
                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_kernel_layer_matches_flax_layer(self):
        # the jnp reference itself must equal the Flax module composition
        from diffsheg_tpu.models.blocks import DiffusionTransformerLayer
        B, T, L, H, C = 2, 9, 64, 4, 96
        key = jax.random.PRNGKey(3)
        layer = DiffusionTransformerLayer(L, 2 * L, H)
        x = jax.random.normal(key, (B, T, L))
        cond = jax.random.normal(jax.random.fold_in(key, 1), (B, T, C - L))
        emb = jax.random.normal(jax.random.fold_in(key, 2), (B, 4 * L))
        mask = jnp.ones((B, T, 1))
        variables = layer.init(jax.random.PRNGKey(4), x, cond, emb, mask)
        ref = layer.apply(variables, x, cond, emb, mask)

        p = variables["params"]
        import flax.linen as nn
        mod_sa = nn.Dense(2 * L).apply(
            {"params": p["sa_block"]["proj_out"]["emb_proj"]}, nn.silu(emb))
        mod_ffn = nn.Dense(2 * L).apply(
            {"params": p["ffn"]["proj_out"]["emb_proj"]}, nn.silu(emb))
        lp = extract_layer_params(p, C, 128, jnp.float32)
        feats = jnp.pad(jnp.concatenate([x, cond], axis=-1),
                        ((0, 0), (0, 0), (0, 128 - C)))
        got = fused_layer(x, feats, mod_sa, mod_ffn, lp, H, C,
                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


class TestInt8Quantization:
    def _layer_setup(self, key, B=2, T=13, L=64, H=4):
        from diffsheg_tpu.models.blocks import DiffusionTransformerLayer
        c_real, c_pad = L + 35, 128
        ks = jax.random.split(key, 8)
        layer = DiffusionTransformerLayer(L, 2 * L, H)
        variables = layer.init(
            jax.random.PRNGKey(1), jnp.zeros((B, T, L)),
            jnp.zeros((B, T, c_real - L)), jnp.zeros((B, 4 * L)),
            jnp.ones((B, T, 1)))
        p = jax.tree.map(
            lambda a: jax.random.normal(ks[0], a.shape) * 0.2,
            variables["params"])
        lp = extract_layer_params(p, c_real, c_pad, jnp.float32)
        x = jax.random.normal(ks[1], (B, T, L))
        feats = jnp.pad(jax.random.normal(ks[2], (B, T, c_real)),
                        ((0, 0), (0, 0), (0, c_pad - c_real)))
        mod_sa = jax.random.normal(ks[3], (B, 2 * L))
        mod_ffn = jax.random.normal(ks[4], (B, 2 * L))
        return lp, x, feats, mod_sa, mod_ffn, H, c_real

    def test_quantize_dequantize_algebra(self):
        """(a @ q) * s == a @ (q * s): the in-kernel dequant-on-output must
        equal running the plain path on explicitly dequantized weights."""
        lp, x, feats, mod_sa, mod_ffn, H, c_real = self._layer_setup(
            jax.random.PRNGKey(20))
        lq, sc = quantize_layer_params(lp)
        deq = lq._replace(**{
            n: lq._asdict()[n].astype(jnp.float32) * getattr(sc, n)[None]
            for n in LayerScales._fields})
        ref = fused_layer_reference(x, feats, mod_sa, mod_ffn, deq, H,
                                    c_real)
        got = fused_layer_reference(x, feats, mod_sa, mod_ffn, lq, H,
                                    c_real, sc=sc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_int8_kernel_matches_reference(self):
        lp, x, feats, mod_sa, mod_ffn, H, c_real = self._layer_setup(
            jax.random.PRNGKey(21))
        lq, sc = quantize_layer_params(lp)
        ref = fused_layer_reference(x, feats, mod_sa, mod_ffn, lq, H,
                                    c_real, sc=sc)
        got = fused_layer(x, feats, mod_sa, mod_ffn, lq, H, c_real, sc=sc,
                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_int8_close_to_full_precision(self):
        """Per-channel weight-only int8 drifts, but must stay small at the
        layer level (the end-to-end drift budget lives in PERF.md)."""
        lp, x, feats, mod_sa, mod_ffn, H, c_real = self._layer_setup(
            jax.random.PRNGKey(22))
        lq, sc = quantize_layer_params(lp)
        full = fused_layer_reference(x, feats, mod_sa, mod_ffn, lp, H,
                                     c_real)
        quant = fused_layer_reference(x, feats, mod_sa, mod_ffn, lq, H,
                                      c_real, sc=sc)
        rel = (np.linalg.norm(np.asarray(quant - full))
               / np.linalg.norm(np.asarray(full)))
        assert rel < 2e-2, rel

    def test_chain_int8_matches_reference(self):
        from diffsheg_tpu.ops.fused_layer import (fused_branch,
                                                  fused_branch_reference,
                                                  stack_layer_params)
        key = jax.random.PRNGKey(23)
        lp, x, _, _, _, H, c_real = self._layer_setup(key)
        B, T, L, n = x.shape[0], x.shape[1], x.shape[2], 2
        c_pad = 128
        slp = stack_layer_params([lp] * n)
        slq, ssc = quantize_layer_params(slp)
        cond = jax.random.normal(jax.random.fold_in(key, 1),
                                 (B, T, c_real - L))
        mods = jax.random.normal(jax.random.fold_in(key, 2),
                                 (n, 2, B, 2 * L))
        cond_pad = jnp.pad(cond, ((0, 0), (0, 0), (0, c_pad - c_real)))
        ref = fused_branch_reference(x, cond_pad, mods, slq, H, c_real,
                                     ssc=ssc)
        got = fused_branch(x, cond_pad, mods, slq, H, c_real, ssc=ssc,
                           interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    @pytest.mark.slow  # >60s-class on one CPU core; core tier covers the same path via smaller tests
    def test_generator_int8_close_to_full(self):
        """diffusion.quantize='int8' end-to-end through the generator:
        runs, and tracks the unquantized sampler closely."""
        cfg = tiny(beat_config())
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(24), batch=2)
        mk = lambda q: WindowGenerator(
            cfg.replace(diffusion=dataclasses.replace(
                cfg.diffusion, fused_layer="on", quantize=q)), variables)
        g_q, g_f = mk("int8"), mk("none")
        mel, pid, hub, _ = make_inputs(cfg, jax.random.PRNGKey(25))
        k = jax.random.PRNGKey(26)
        a = np.asarray(g_q.generate(mel, pid, k, hub))
        b = np.asarray(g_f.generate(mel, pid, k, hub))
        assert np.isfinite(a).all()
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel < 0.1, rel

    def test_int4_pack_roundtrip(self):
        """Nibble packing: unpacking the int8 bytes reproduces the exact
        int4 codes (left halves in the high nibble, right in the low)."""
        lp, *_ = self._layer_setup(jax.random.PRNGKey(30))
        lq, sc = quantize_layer_params(lp, bits=4)
        for name in LayerScales._fields:
            w = np.asarray(getattr(lp, name), np.float32)
            s = np.asarray(getattr(sc, name))[None]
            codes = np.clip(np.round(w / s), -7, 7)
            packed = np.asarray(getattr(lq, name)).astype(np.int32)
            hi, lo = packed >> 4, (packed << 28) >> 28
            np.testing.assert_array_equal(
                np.concatenate([hi, lo], axis=-1), codes, err_msg=name)

    def test_int4_kernel_matches_reference(self):
        lp, x, feats, mod_sa, mod_ffn, H, c_real = self._layer_setup(
            jax.random.PRNGKey(31))
        lq, sc = quantize_layer_params(lp, bits=4)
        ref = fused_layer_reference(x, feats, mod_sa, mod_ffn, lq, H,
                                    c_real, sc=sc)
        got = fused_layer(x, feats, mod_sa, mod_ffn, lq, H, c_real, sc=sc,
                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_int4_matches_explicit_dequant(self):
        """The packed-int4 path must equal the plain path on explicitly
        dequantized weights — packing/unpack is exact algebra; all the
        approximation lives in the 4-bit rounding itself."""
        lp, x, feats, mod_sa, mod_ffn, H, c_real = self._layer_setup(
            jax.random.PRNGKey(32))
        lq, sc = quantize_layer_params(lp, bits=4)
        deq = {}
        for n in LayerScales._fields:
            packed = np.asarray(getattr(lq, n)).astype(np.int32)
            codes = np.concatenate([packed >> 4, (packed << 28) >> 28],
                                   axis=-1).astype(np.float32)
            deq[n] = jnp.asarray(codes * np.asarray(getattr(sc, n))[None])
        ref = fused_layer_reference(x, feats, mod_sa, mod_ffn,
                                    lp._replace(**deq), H, c_real)
        got = fused_layer_reference(x, feats, mod_sa, mod_ffn, lq, H,
                                    c_real, sc=sc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_chain_int4_matches_reference(self):
        from diffsheg_tpu.ops.fused_layer import (fused_branch,
                                                  fused_branch_reference,
                                                  stack_layer_params)
        key = jax.random.PRNGKey(33)
        lp, x, _, _, _, H, c_real = self._layer_setup(key)
        B, T, L, n = x.shape[0], x.shape[1], x.shape[2], 2
        c_pad = 128
        slp = stack_layer_params([lp] * n)
        slq, ssc = quantize_layer_params(slp, bits=4)
        cond = jax.random.normal(jax.random.fold_in(key, 1),
                                 (B, T, c_real - L))
        mods = jax.random.normal(jax.random.fold_in(key, 2),
                                 (n, 2, B, 2 * L))
        cond_pad = jnp.pad(cond, ((0, 0), (0, 0), (0, c_pad - c_real)))
        ref = fused_branch_reference(x, cond_pad, mods, slq, H, c_real,
                                     ssc=ssc)
        got = fused_branch(x, cond_pad, mods, slq, H, c_real, ssc=ssc,
                           interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_generator_int4_runs_and_tracks_full(self):
        """diffusion.quantize='int4' end-to-end through the generator:
        runs, stays finite, and tracks the unquantized sampler within the
        (much looser than int8) 4-bit drift budget."""
        cfg = tiny(beat_config())
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(34), batch=2)
        mk = lambda q: WindowGenerator(
            cfg.replace(diffusion=dataclasses.replace(
                cfg.diffusion, fused_layer="on", quantize=q)), variables)
        g_q, g_f = mk("int4"), mk("none")
        mel, pid, hub, _ = make_inputs(cfg, jax.random.PRNGKey(35))
        k = jax.random.PRNGKey(36)
        a = np.asarray(g_q.generate(mel, pid, k, hub))
        b = np.asarray(g_f.generate(mel, pid, k, hub))
        assert np.isfinite(a).all()
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel < 0.5, rel

    def test_quantize_requires_fast_path(self):
        cfg = tiny(beat_config())
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(27), batch=1)
        with pytest.raises(ValueError, match="quantize"):
            WindowGenerator(
                cfg.replace(diffusion=dataclasses.replace(
                    cfg.diffusion, fused_layer="off", quantize="int8")),
                variables)


class TestEngineParity:
    def _compare(self, cfg, seed=0, B=2):
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(seed), batch=B)
        gen = WindowGenerator(cfg, variables)
        mel, pid, hub, x = make_inputs(cfg, jax.random.PRNGKey(seed + 1), B)
        tmap = gen.timestep_map
        cache = build_level_cache(cfg.model, gen.variables, tmap, mel, pid,
                                  hub)
        fast = extract_fast_params(cfg.model, gen.variables,
                                   cfg.data.n_poses, True)
        for lvl in (0, 13, 24):
            t = jnp.full((B,), lvl, dtype=jnp.int32)
            sr = _gather(gen.schedule.sqrt_recip_alphas_cumprod, t, 3)
            srm1 = _gather(gen.schedule.sqrt_recipm1_alphas_cumprod, t, 3)
            ref = gen.model.apply(
                gen.variables, x, jnp.take(tmap, t), (sr, srm1), mel, pid,
                hubert=hub, train=False,
                cfg_inference=cfg.model.uses_cfg_at_inference,
                cache=gather_level(cache, t[0]))
            got = fast_unidiffuser_step(
                cfg.model, fast, x, (sr, srm1), gather_level(cache, t[0]),
                cfg_inference=cfg.model.uses_cfg_at_inference,
                interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-4, rtol=2e-4)

    def test_beat_forward(self):
        self._compare(tiny(beat_config()))

    def test_expr_id_off(self):
        self._compare(tiny(beat_config(), expr_id_off=True), seed=2)

    @pytest.mark.slow  # >60s-class on one CPU core; core tier covers the same path via smaller tests
    def test_show_cfg(self):
        cfg = tiny(show_config())
        assert cfg.model.uses_cfg_at_inference
        self._compare(cfg, seed=4)


class TestScanLayoutExtraction:
    def test_extract_from_scan_layout_matches_unrolled(self):
        """extract_fast_params accepts scan_layers checkpoints: the
        layers/layer stacked layout slices back to the same kernel-ready
        weights as the unrolled layer_{i} layout (models/fast_forward.py
        unstacks on the fly), so the serving fast path composes with
        model.scan_layers."""
        from diffsheg_tpu.models.factory import stack_scan_layers

        cfg = tiny(beat_config())
        _, v = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                jax.random.PRNGKey(11))
        v_scan = {"params": stack_scan_layers(v["params"],
                                              cfg.model.num_layers)}
        a = extract_fast_params(cfg.model, v, cfg.data.n_poses, True)
        b = extract_fast_params(cfg.model, v_scan, cfg.data.n_poses, True)
        la = jax.tree_util.tree_leaves_with_path(a)
        lb = dict(jax.tree_util.tree_leaves_with_path(b))
        assert len(la) == len(lb)
        for path, leaf in la:
            np.testing.assert_array_equal(np.asarray(lb[path]),
                                          np.asarray(leaf))


class TestGeneratorIntegration:
    def test_forced_fused_sampling_matches_flax(self):
        cfg = tiny(beat_config())
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(5), batch=2)
        g_fast = WindowGenerator(
            cfg.replace(diffusion=dataclasses.replace(
                cfg.diffusion, fused_layer="on")), variables)
        g_ref = WindowGenerator(
            cfg.replace(diffusion=dataclasses.replace(
                cfg.diffusion, fused_layer="off")), variables)
        assert g_fast._use_fused_layer and not g_ref._use_fused_layer
        mel, pid, hub, _ = make_inputs(cfg, jax.random.PRNGKey(6))
        k = jax.random.PRNGKey(7)
        np.testing.assert_allclose(
            np.asarray(g_fast.generate(mel, pid, k, hub)),
            np.asarray(g_ref.generate(mel, pid, k, hub)),
            atol=2e-3, rtol=2e-3)


class TestFusedStreamIntegration:
    def test_fused_stream_with_kernel_matches_flax(self):
        """The whole-stream program with the Pallas fast path (interpret)
        must match the Flax path — covers the streamer's cache assembly
        (static part shared across windows, audio part batched) feeding the
        kernel engine."""
        from diffsheg_tpu.sampling.streamer import StreamingGenerator
        cfg = tiny(beat_config())
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(8), batch=1)
        mk = lambda mode: StreamingGenerator(WindowGenerator(
            cfg.replace(diffusion=dataclasses.replace(
                cfg.diffusion, fused_layer=mode)), variables))
        s_on, s_off = mk("on"), mk("off")
        T = 70  # two windows: plain + one repaint continuation
        ks = jax.random.split(jax.random.PRNGKey(9), 2)
        mel = jax.random.normal(ks[0], (1, T, cfg.model.audio_dim))
        hub = jax.random.normal(ks[1], (1, T, cfg.model.hubert_dim))
        pid = jax.nn.one_hot(jnp.array([2]), cfg.model.style_dim)
        rng = jax.random.PRNGKey(10)
        a = s_on.generate_fused(mel, pid, rng, hubert=hub)
        b = s_off.generate_fused(mel, pid, rng, hubert=hub)
        # rtol 5e-3: the two paths differ in reduction/fusion order, and
        # the conftest's --xla_backend_optimization_level=0 shifts XLA:CPU
        # fusion enough that single elements land just past 2e-3 after the
        # 25-step reverse process (measured max 3e-3 on 1/13440 elements)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=5e-3)


class TestFusedBranchChain:
    def test_chain_matches_per_layer(self):
        """The grid-pipelined chain kernel == per-layer composition."""
        from diffsheg_tpu.ops.fused_layer import (fused_branch,
                                                  stack_layer_params)
        from diffsheg_tpu.models.blocks import DiffusionTransformerLayer
        B, T, L, H, n = 2, 13, 64, 4, 3
        Cc = 35                      # cond width; c_real = 99, pad to 128
        c_real, c_pad = L + Cc, 128
        layer = DiffusionTransformerLayer(L, 2 * L, H)
        lps, refs = [], []
        key = jax.random.PRNGKey(11)
        x = jax.random.normal(key, (B, T, L))
        cond = jax.random.normal(jax.random.fold_in(key, 1), (B, T, Cc))
        emb = jax.random.normal(jax.random.fold_in(key, 2), (B, 4 * L))
        mask = jnp.ones((B, T, 1))
        import flax.linen as nn
        h_ref = x
        mods = []
        for i in range(n):
            variables = layer.init(jax.random.fold_in(key, 10 + i),
                                   h_ref, cond, emb, mask)
            p = variables["params"]
            h_ref = layer.apply(variables, h_ref, cond, emb, mask)
            lps.append(extract_layer_params(p, c_real, c_pad, jnp.float32))
            mods.append(jnp.stack([
                nn.Dense(2 * L).apply(
                    {"params": p["sa_block"]["proj_out"]["emb_proj"]},
                    nn.silu(emb)),
                nn.Dense(2 * L).apply(
                    {"params": p["ffn"]["proj_out"]["emb_proj"]},
                    nn.silu(emb))]))
        slp = stack_layer_params(lps)
        mods = jnp.stack(mods)       # (n, 2, B, 2L)
        cond_pad = jnp.pad(cond, ((0, 0), (0, 0), (0, c_pad - c_real)))
        got = fused_branch(x, cond_pad, mods, slp, H, c_real,
                           interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(h_ref),
                                   atol=2e-4, rtol=2e-4)

    def test_chain_null_substitution(self):
        """Per-row null substitution inside the chain == Flax where()."""
        from diffsheg_tpu.ops.fused_layer import (fused_branch,
                                                  fused_branch_reference,
                                                  stack_layer_params)
        from diffsheg_tpu.models.blocks import DiffusionTransformerLayer
        B, T, L, H, n = 2, 9, 64, 4, 2
        Cc, c_real, c_pad = 35, 99, 128
        key = jax.random.PRNGKey(12)
        layer = DiffusionTransformerLayer(L, 2 * L, H)
        variables = layer.init(key, jnp.zeros((B, T, L)),
                               jnp.zeros((B, T, Cc)), jnp.zeros((B, 4 * L)),
                               jnp.ones((B, T, 1)))
        lp = extract_layer_params(variables["params"], c_real, c_pad,
                                  jnp.float32)
        slp = stack_layer_params([lp] * n)
        x = jax.random.normal(jax.random.fold_in(key, 1), (B, T, L))
        cond = jax.random.normal(jax.random.fold_in(key, 2), (B, T, Cc))
        mods = jax.random.normal(jax.random.fold_in(key, 3),
                                 (n, 2, B, 2 * L))
        null_emb = jnp.pad(
            jax.random.normal(jax.random.fold_in(key, 4), (1, c_real)),
            ((0, 0), (0, c_pad - c_real)))
        null_mask = jnp.array([1.0, 0.0])
        cond_pad = jnp.pad(cond, ((0, 0), (0, 0), (0, c_pad - c_real)))
        got = fused_branch(x, cond_pad, mods, slp, H, c_real,
                           null_emb=null_emb, null_mask=null_mask,
                           interpret=True)
        ref = fused_branch_reference(x, cond_pad, mods, slp, H, c_real,
                                     null_emb=null_emb, null_mask=null_mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_chain_mode_generator_matches_per_layer(self):
        """fused_layer='chain' must equal 'on' through the generator."""
        cfg = tiny(beat_config())
        _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                        jax.random.PRNGKey(13), batch=1)
        mk = lambda mode: WindowGenerator(
            cfg.replace(diffusion=dataclasses.replace(
                cfg.diffusion, fused_layer=mode)), variables)
        g_chain, g_layer = mk("chain"), mk("on")
        mel, pid, hub, _ = make_inputs(cfg, jax.random.PRNGKey(14), B=1)
        k = jax.random.PRNGKey(15)
        np.testing.assert_allclose(
            np.asarray(g_chain.generate(mel, pid, k, hub)),
            np.asarray(g_layer.generate(mel, pid, k, hub)),
            atol=2e-3, rtol=2e-3)
