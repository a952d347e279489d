"""Fused serving forward for the sampler ("fast path").

The sampler calls the denoiser hundreds of times per stream.  With the
timestep-level cache (models/level_cache.py) supplying every x-independent
tensor, what remains per step is: joint embed + PE, 16 transformer layers,
two output heads and the x0 bridge (reference models/transformer.py:496-587
+ :728-770 semantics).  This module executes that remainder with the
whole-layer Pallas kernel (ops/fused_layer.py): each layer is ONE program
with all weights and activations VMEM-resident, instead of ~25 separate
HLO ops whose fixed costs dominate at serving shapes (B=1..2, T=34..88).

This is an inference engine over the SAME variables tree — weights are
read from the Flax checkpoint layout, never duplicated.  Numerical parity
with ``UniDiffuser.apply(..., cache=...)`` is pinned by
tests/test_fast_forward.py.

Covers the shipped joint UniDiffuser (all PE variants, CFG batch-doubling
with null-cond substitution, ExprID_off); other branch modes and text/emo
conditioning fall back to the Flax path in the generator.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diffsheg_tpu.config import ModelConfig
from diffsheg_tpu.models.embeddings import positional_encoding
from diffsheg_tpu.models.level_cache import (BranchCache, ModelCache,
                                             supports_level_cache)
from diffsheg_tpu.ops.fused_layer import (LayerParams, LayerScales,
                                          extract_layer_params,
                                          fused_branch, fused_layer,
                                          quantize_layer_params,
                                          stack_layer_params)


def _round128(n: int) -> int:
    return -(-n // 128) * 128


def supports_fast_forward(cfg: ModelConfig) -> bool:
    """Same surface as the level cache (which supplies its inputs)."""
    return supports_level_cache(cfg)


class BranchFast(NamedTuple):
    """One branch's kernel-ready weights (a pytree of arrays)."""

    joint_k: jax.Array
    joint_b: jax.Array
    out_k: jax.Array
    out_b: jax.Array
    pe: jax.Array                        # (T, L)
    layers: LayerParams                  # stacked: leading (num_layers,) axis
    null_cond_emb: Optional[jax.Array]   # (1, c_real)
    scales: Optional[LayerScales] = None  # int8 layers' dequant scales


class FastParams(NamedTuple):
    exp: BranchFast
    ges: BranchFast


def _branch_widths(cfg: ModelConfig, has_hubert: bool,
                   exp_cond_dim: int) -> Tuple[int, int]:
    """(c_real, c_pad) of the per-layer feats (= latent ++ cond)."""
    c = cfg.latent_dim + cfg.aud_latent_dim + exp_cond_dim
    if has_hubert:
        # same mode rule as the denoiser/level cache: 'raw' (whether via
        # speech_encoder='raw' or encode_hubert=False) concatenates the
        # unencoded features
        mode = cfg.speech_encoder if cfg.encode_hubert else "raw"
        c += cfg.hubert_dim if mode == "raw" else cfg.hubert_latent_dim
    return c, _round128(c)


def _extract_branch(cfg: ModelConfig, p, T: int, c_real: int, c_pad: int,
                    dtype, quant: str = "none") -> BranchFast:
    if "layer_0" not in p and "layers" in p:
        # scan_layers=True checkpoints keep the stack under layers/layer
        # with a leading layer axis; the kernel extraction below wants the
        # unrolled layout, so slice it back out (traced, zero-copy views)
        from diffsheg_tpu.models.factory import unstack_scan_layers
        p = unstack_scan_layers(p, cfg.num_layers)
    if cfg.pe_type == "learnable":
        pe = jnp.asarray(p["sequence_embedding"][:T], dtype=dtype)
    else:
        pe = jnp.asarray(
            positional_encoding(
                # inference: the dropout variant degenerates to its base PE
                "ppe_sinu" if cfg.pe_type == "ppe_sinu_dropout"
                else cfg.pe_type,
                T, cfg.latent_dim, cfg.max_seq_len),
            dtype=dtype)
    layers = stack_layer_params([
        extract_layer_params(p[f"layer_{i}"], c_real, c_pad, dtype)
        for i in range(cfg.num_layers)])
    scales = None
    if quant in ("int8", "int4"):
        # weight-only per-output-channel int8/int4 (ops/fused_layer.py):
        # halves (int8) or quarters (int4, nibble-packed) the
        # transformer-stack HBM weight traffic per denoise step; the
        # small tensors (joint/out/pe/norms/biases) stay in ``dtype``.
        # Quantize from the f32 checkpoint weights, not the dtype-cast
        # copies — int codes + f32 scales are dtype-independent, so
        # rounding through bf16 first would only add error
        f32_layers = stack_layer_params([
            extract_layer_params(p[f"layer_{i}"], c_real, c_pad,
                                 jnp.float32)
            for i in range(cfg.num_layers)])
        q_layers, scales = quantize_layer_params(
            f32_layers, bits=8 if quant == "int8" else 4)
        layers = layers._replace(**{n: getattr(q_layers, n)
                                    for n in LayerScales._fields})
    return BranchFast(
        joint_k=jnp.asarray(p["joint_embed"]["kernel"], dtype=dtype),
        joint_b=jnp.asarray(p["joint_embed"]["bias"], dtype=dtype),
        out_k=jnp.asarray(p["out"]["kernel"], dtype=dtype),
        out_b=jnp.asarray(p["out"]["bias"], dtype=dtype),
        pe=pe,
        layers=layers,
        null_cond_emb=(jnp.asarray(p["null_cond_emb"], dtype=dtype)
                       if "null_cond_emb" in p else None),
        scales=scales,
    )


def extract_fast_params(cfg: ModelConfig, variables: Dict[str, Any],
                        T: int, has_hubert: bool,
                        quant: str = "none") -> FastParams:
    """Variables tree -> kernel-ready weights for both branches.

    Traced; call OUTSIDE the sampler scan so padding/casting is
    loop-invariant and paid once.  ``quant='int8'`` stores the
    transformer-stack weight matrices as per-channel int8
    (diffusion.quantize knob).
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    params = variables["params"]
    ce_real, ce_pad = _branch_widths(cfg, has_hubert, 0)
    cg_real, cg_pad = _branch_widths(cfg, has_hubert, cfg.expression_dim)
    return FastParams(
        exp=_extract_branch(cfg, params["encoder_exp"], T, ce_real, ce_pad,
                            dtype, quant),
        ges=_extract_branch(cfg, params["encoder_ges"], T, cg_real, cg_pad,
                            dtype, quant),
    )


def _branch_forward(cfg: ModelConfig, bp: BranchFast, x: jax.Array,
                    cache: BranchCache, exp_cond: Optional[jax.Array],
                    cfg_inference: bool, interpret: bool,
                    chain: bool = False) -> jax.Array:
    """Mirror of MotionDenoiser.__call__ on the cache path
    (models/denoiser.py) with fused layers."""
    compute = jnp.dtype(cfg.compute_dtype)
    B = x.shape[0]

    cond_parts = [cache.audio_lat]
    if cache.hubert_lat is not None:
        cond_parts.append(cache.hubert_lat)
    if exp_cond is not None:
        cond_parts.append(exp_cond.astype(compute))
    cond = jnp.concatenate(cond_parts, axis=-1)
    mods = cache.mods                              # (n, 2, B, 2L)

    null_mask = None
    null_emb = None
    do_cfg = (cfg_inference and cfg.classifier_free
              and cfg.cond_scale != 1.0)
    c_real = cond.shape[-1] + cfg.latent_dim
    c_pad = _round128(c_real)
    if do_cfg:
        x = jnp.concatenate([x, x], axis=0)
        cond = jnp.concatenate([cond, cond], axis=0)
        mods = jnp.concatenate([mods, mods], axis=2)
        # first half unconditional (reference transformer.py:331)
        null_mask = (jnp.linspace(0.0, 1.0, 2 * B) < 0.5).astype(compute)
        null_emb = jnp.pad(bp.null_cond_emb.astype(compute),
                           ((0, 0), (0, c_pad - c_real)))

    # plain compute-dtype dots, exactly like the Flax Dense(dtype=compute)
    h = jnp.dot(x.astype(compute), bp.joint_k) + bp.joint_b
    h = h + bp.pe[None]

    if chain:
        # whole layer stack as ONE chain-kernel launch (grid-pipelined
        # weight streaming); the condition is zero-padded so concat(h,
        # cond) lands exactly on the padded feats width the stacked fc1
        # was built for.  Opt-in (diffusion.fused_layer='chain'): the
        # steady-state win over the per-layer kernel is small and the
        # compile is substantially slower.
        cond_pad = jnp.pad(cond, ((0, 0), (0, 0), (0, c_pad - c_real)))
        h = fused_branch(h.astype(compute), cond_pad, mods, bp.layers,
                         cfg.num_heads, c_real, null_emb=null_emb,
                         null_mask=null_mask, ssc=bp.scales,
                         interpret=interpret)
    else:
        n_layers = bp.layers.fp_fc1_k.shape[0]
        if null_mask is not None:
            null_rows = null_mask[:, None, None] > 0
        for i in range(n_layers):
            lp = LayerParams(*(f[i] for f in bp.layers))
            sc = (None if bp.scales is None
                  else LayerScales(*(f[i] for f in bp.scales)))
            feats = jnp.concatenate([h.astype(compute), cond], axis=-1)
            if null_mask is not None:
                null = jnp.broadcast_to(
                    null_emb[:, None, :].astype(feats.dtype),
                    (*feats.shape[:2], null_emb.shape[-1]))
                feats = jnp.where(
                    null_rows,
                    null[..., :feats.shape[-1]], feats)
            if c_pad != c_real:
                feats = jnp.pad(feats,
                                ((0, 0), (0, 0), (0, c_pad - c_real)))
            h = fused_layer(h.astype(compute), feats, mods[i, 0],
                            mods[i, 1], lp, cfg.num_heads, c_real,
                            sc=sc, interpret=interpret)

    out = (jnp.dot(h.astype(compute), bp.out_k) + bp.out_b) \
        .astype(jnp.float32)
    if do_cfg:
        uncond, cond_out = out[:B], out[B:]
        out = uncond + cfg.cond_scale * (cond_out - uncond)
    return out


def fast_unidiffuser_step(
    cfg: ModelConfig,
    fp: FastParams,
    x: jax.Array,                                # (B, T, motion_dim)
    sqrt_alphas: Tuple[jax.Array, jax.Array],    # broadcastable (B, 1, 1)
    cache: ModelCache,                           # one gathered level
    cfg_inference: bool = False,
    interpret: bool = False,
    chain: bool = False,
) -> jax.Array:
    """UniDiffuser forward (models/unidiffuser.py semantics) on the fast
    path: expression branch -> x0 bridge -> gesture branch."""
    gesture, expression = jnp.split(x, [cfg.pose_dim], axis=-1)

    exp_eps = _branch_forward(cfg, fp.exp, expression, cache.exp, None,
                              cfg_inference, interpret, chain)
    sr, srm1 = sqrt_alphas
    expr_x0 = sr * expression - srm1 * exp_eps   # x0 bridge (detached)
    ges_eps = _branch_forward(cfg, fp.ges, gesture, cache.ges, expr_x0,
                              cfg_inference, interpret, chain)
    return jnp.concatenate([ges_eps, exp_eps], axis=-1)
