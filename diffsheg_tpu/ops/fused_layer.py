"""Whole-transformer-layer Pallas kernel (sampler fast path).

One denoiser layer (reference models/transformer.py:247-346 — condition
projection + linear self-attention + FFN, each with AdaLN stylization) is
~25 small HLO ops.  At DiffSHEG serving shapes (B=1..2, T=34..88, D=512)
each op carries a fixed dispatch/memory-latency cost that dwarfs its math,
and the sampler runs the layer ~16 times per denoise step, hundreds of
steps per stream.  This kernel executes the ENTIRE layer in one Pallas
program: every weight and activation stays in VMEM, all eight matmuls run
back-to-back on the MXU with fp32 accumulation, and the layer costs one
dispatch instead of ~25.

Contract (differences from the Flax module are *inputs*, not math):
  - ``feats`` arrives pre-concatenated (h ++ cond) and pre-substituted for
    classifier-free null rows, zero-padded on the lane axis to a multiple
    of 128; the first LayerNorm uses masked statistics over the true width
    ``c_real`` so padding is inert (scale/bias pads are zero, fc1 pad rows
    are zero).
  - the stylization modulations come precomputed from the timestep-level
    cache (models/level_cache.py) as ``mod = emb_proj(silu(emb))``.
  - ``src_mask`` is all-ones (fixed-size sampler windows), so the key-mask
    add and value zeroing are identity and elided.
  - inference only (dropout 0); training and general masking use the Flax
    path.

The jnp reference (``fused_layer_reference``) is the numerics oracle; the
kernel is validated against it and against the full Flax layer in
tests/test_fast_forward.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

LN_EPS = 1e-5


def _gelu_exact(x):
    """Exact (erf) GELU with an in-kernel erf.

    Mosaic has no erf/erfc lowering, so erf uses Abramowitz & Stegun 7.1.26
    (max abs error 1.5e-7 — two orders below f32 test tolerances and five
    below bf16 resolution).  The jnp reference uses the same formula so the
    kernel and its oracle agree exactly.
    """
    z = x * 0.7071067811865476
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * x * (1.0 + erf)


class LayerParams(NamedTuple):
    """One DiffusionTransformerLayer's weights, kernel-ready.

    ``fp_*`` tensors are padded on the feats axis to a lane multiple; the
    pad region of ``fp_norm_scale``/``fp_norm_bias`` and the pad rows of
    ``fp_fc1_k`` are zero.
    """

    fp_norm_scale: jax.Array   # (Cp,)
    fp_norm_bias: jax.Array    # (Cp,)
    fp_fc1_k: jax.Array        # (Cp, 2L)
    fp_fc1_b: jax.Array        # (2L,)
    fp_fc2_k: jax.Array        # (2L, L)
    fp_fc2_b: jax.Array        # (L,)
    sa_norm_scale: jax.Array   # (L,)
    sa_norm_bias: jax.Array    # (L,)
    q_k: jax.Array             # (L, L)
    q_b: jax.Array             # (L,)
    k_k: jax.Array
    k_b: jax.Array
    v_k: jax.Array
    v_b: jax.Array
    sa_so_norm_scale: jax.Array  # (L,)
    sa_so_norm_bias: jax.Array
    sa_out_k: jax.Array        # (L, L)
    sa_out_b: jax.Array
    ffn_l1_k: jax.Array        # (L, F)
    ffn_l1_b: jax.Array        # (F,)
    ffn_l2_k: jax.Array        # (F, L)
    ffn_l2_b: jax.Array        # (L,)
    ffn_so_norm_scale: jax.Array
    ffn_so_norm_bias: jax.Array
    ffn_out_k: jax.Array       # (L, L)
    ffn_out_b: jax.Array


class LayerScales(NamedTuple):
    """Per-output-channel dequantization scales for the int8 weight path.

    One f32 vector per weight matrix in ``LayerParams`` (same field names;
    ``(out,)`` per layer, ``(n, out)`` stacked).  With symmetric per-column
    quantization ``w ~= q * s[None, :]`` the matmul dequantizes on the
    *output*: ``a @ (q * s) == (a @ q) * s`` — exact algebra, so the kernel
    multiplies the accumulated f32 result by ``s`` instead of materialising
    a dequantized weight copy.  Streaming int8 instead of bf16 halves the
    per-step HBM weight traffic the sampler is partly bound by (PERF.md).
    """

    fp_fc1_k: jax.Array
    fp_fc2_k: jax.Array
    q_k: jax.Array
    k_k: jax.Array
    v_k: jax.Array
    sa_out_k: jax.Array
    ffn_l1_k: jax.Array
    ffn_l2_k: jax.Array
    ffn_out_k: jax.Array


def quantize_layer_params(lp: LayerParams, bits: int = 8):
    """Symmetric per-output-channel int{8,4} quantization of every weight
    matrix; vectors (norms, biases) keep their dtype.  Works on one
    layer's params or the stacked form (reduction is over the
    contraction axis, ``-2``).  Returns ``(lp_quant, LayerScales)``.

    ``bits=4`` packs two codes per int8 byte along the *output* axis:
    the LEFT column half lands in the high nibble and the RIGHT half in
    the low nibble, so the packed matrix is ``(K, N/2)`` int8 against
    ``(N,)`` scales — the kernel detects the packing from that shape
    mismatch and reconstructs ``[w_left | w_right]`` with two shifts
    (no interleave; column order is preserved by construction).  Codes
    are clipped to the symmetric range [-7, 7].
    """
    assert bits in (8, 4), bits
    qs = {}
    scales = []
    qmax = 127.0 if bits == 8 else 7.0
    for name in LayerScales._fields:
        w = getattr(lp, name).astype(jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
        s = jnp.maximum(amax, 1e-30) / qmax
        q = jnp.clip(jnp.round(w / s), -qmax, qmax).astype(jnp.int32)
        if bits == 4:
            n = q.shape[-1]
            assert n % 2 == 0, (name, q.shape)
            hi, lo = q[..., : n // 2], q[..., n // 2:]
            # hi in [-7,7] << 4 plus the low nibble stays inside int8's
            # [-128,127], so the int8 cast is value-preserving
            q = (hi << 4) | (lo & 0xF)
        qs[name] = q.astype(jnp.int8)
        scales.append(jnp.squeeze(s, axis=-2))
    return lp._replace(**qs), LayerScales(*scales)


def extract_layer_params(p, c_real: int, c_pad: int, dtype) -> LayerParams:
    """Flax param subtree of one DiffusionTransformerLayer -> LayerParams.

    Zero-pads the feats-axis tensors from ``c_real`` to ``c_pad`` (inert by
    construction, see module docstring).
    """

    def a(x):
        return jnp.asarray(x, dtype=dtype)

    def pad_vec(x):
        return jnp.pad(a(x), (0, c_pad - c_real))

    def pad_rows(x):
        return jnp.pad(a(x), ((0, c_pad - c_real), (0, 0)))

    fp, sa, ffn = p["feat_proj"], p["sa_block"], p["ffn"]
    return LayerParams(
        fp_norm_scale=pad_vec(fp["norm"]["scale"]),
        fp_norm_bias=pad_vec(fp["norm"]["bias"]),
        fp_fc1_k=pad_rows(fp["fc1"]["kernel"]),
        fp_fc1_b=a(fp["fc1"]["bias"]),
        fp_fc2_k=a(fp["fc2"]["kernel"]),
        fp_fc2_b=a(fp["fc2"]["bias"]),
        sa_norm_scale=a(sa["norm"]["scale"]),
        sa_norm_bias=a(sa["norm"]["bias"]),
        q_k=a(sa["query"]["kernel"]), q_b=a(sa["query"]["bias"]),
        k_k=a(sa["key"]["kernel"]), k_b=a(sa["key"]["bias"]),
        v_k=a(sa["value"]["kernel"]), v_b=a(sa["value"]["bias"]),
        sa_so_norm_scale=a(sa["proj_out"]["norm"]["scale"]),
        sa_so_norm_bias=a(sa["proj_out"]["norm"]["bias"]),
        sa_out_k=a(sa["proj_out"]["out_proj"]["kernel"]),
        sa_out_b=a(sa["proj_out"]["out_proj"]["bias"]),
        ffn_l1_k=a(ffn["linear1"]["kernel"]),
        ffn_l1_b=a(ffn["linear1"]["bias"]),
        ffn_l2_k=a(ffn["linear2"]["kernel"]),
        ffn_l2_b=a(ffn["linear2"]["bias"]),
        ffn_so_norm_scale=a(ffn["proj_out"]["norm"]["scale"]),
        ffn_so_norm_bias=a(ffn["proj_out"]["norm"]["bias"]),
        ffn_out_k=a(ffn["proj_out"]["out_proj"]["kernel"]),
        ffn_out_b=a(ffn["proj_out"]["out_proj"]["bias"]),
    )


def _layer_math(x, feats, mod_sa, mod_ffn, lp: LayerParams,
                num_heads: int, c_real: int, cdtype, sc=None):
    """The whole layer in f32 activations / ``cdtype`` matmul inputs.

    Shared verbatim by the Pallas kernel body (on (T, .) VMEM tiles) and the
    jnp reference (vmapped over batch) — one source of truth for the math.
    With ``sc`` (LayerScales) the weight matrices are int8 and each matmul
    dequantizes its f32 accumulator by the per-column scale.
    """
    f32 = jnp.float32
    T, L = x.shape

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    def mm(a, w, b, s=None):
        if s is not None and w.shape[-1] * 2 == s.shape[-1]:
            # nibble-packed int4 (see quantize_layer_params): high nibble
            # = left column half, low = right half.  The unpack runs in
            # f32 (floor-division for the arithmetic-shift semantics,
            # wrap-select to sign-extend the low nibble) because Mosaic
            # cannot legalize vector shifts on i8 operands on real TPU
            # (`arith.shrsi` on vector<...xi8> — found the first time this
            # kernel hit actual hardware; interpret mode accepts them).
            # Exact: every intermediate is an integer below 2^7.  The two
            # half-width dots concat on the (T, N/2) f32 accumulators
            # instead of materialising a (K, N) weight copy (K >> T at
            # serving shapes) — HBM already streamed half of int8's bytes.
            ac = a.astype(cdtype)
            wf = w.astype(f32)
            hi = jnp.floor(wf * (1.0 / 16.0))
            lo = wf - 16.0 * hi
            lo = lo - jnp.where(lo >= 8.0, 16.0, 0.0)
            y = jnp.concatenate(
                [dot(ac, hi.astype(cdtype)),
                 dot(ac, lo.astype(cdtype))], axis=-1)
            return y * s.astype(f32) + b.astype(f32)
        if s is not None:
            w = w.astype(cdtype)
        y = dot(a.astype(cdtype), w)
        if s is not None:
            y = y * s.astype(f32)
        return y + b.astype(f32)

    def q(name):
        return getattr(sc, name) if sc is not None else None

    def ln(h, scale, bias):
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
        return ((h - mu) * jax.lax.rsqrt(var + LN_EPS)
                * scale.astype(f32) + bias.astype(f32))

    x = x.astype(f32)
    feats = feats.astype(f32)

    # --- condition projection (LN -> fc1 -> SiLU -> fc2) + residual -------
    # masked statistics over the true feats width; the pad region of
    # scale/bias is zero so normalized pads are zero and fc1 pad rows inert
    Cp = feats.shape[-1]
    valid = (jax.lax.broadcasted_iota(jnp.int32, (1, Cp), 1)
             < c_real).astype(f32)
    mu = jnp.sum(feats, axis=-1, keepdims=True) / c_real
    var = jnp.sum(((feats - mu) ** 2) * valid, axis=-1, keepdims=True) / c_real
    nf = ((feats - mu) * jax.lax.rsqrt(var + LN_EPS)
          * lp.fp_norm_scale.astype(f32) + lp.fp_norm_bias.astype(f32))
    a1 = jax.nn.silu(mm(nf, lp.fp_fc1_k, lp.fp_fc1_b, q("fp_fc1_k")))
    x1 = mm(a1, lp.fp_fc2_k, lp.fp_fc2_b, q("fp_fc2_k")) + x

    # --- linear self-attention (all-ones mask) ----------------------------
    n1 = ln(x1, lp.sa_norm_scale, lp.sa_norm_bias)
    qq = mm(n1, lp.q_k, lp.q_b, q("q_k"))
    kk = mm(n1, lp.k_k, lp.k_b, q("k_k"))
    v = mm(n1, lp.v_k, lp.v_b, q("v_k"))
    hd = L // num_heads
    heads = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = jax.nn.softmax(qq[:, sl], axis=-1)
        kh = jax.nn.softmax(kk[:, sl], axis=0)
        ctx = jax.lax.dot_general(
            kh.astype(cdtype), v[:, sl].astype(cdtype),
            (((0,), (0,)), ((), ())), preferred_element_type=f32)
        heads.append(jax.lax.dot_general(
            qh.astype(cdtype), ctx.astype(cdtype),
            (((1,), (0,)), ((), ())), preferred_element_type=f32))
    y = jnp.concatenate(heads, axis=-1)

    # stylization (precomputed mod) + residual
    scale_sa, shift_sa = jnp.split(mod_sa.astype(f32), 2)
    z = ln(y, lp.sa_so_norm_scale, lp.sa_so_norm_bias)
    z = jax.nn.silu(z * (1.0 + scale_sa[None]) + shift_sa[None])
    x2 = x1 + mm(z, lp.sa_out_k, lp.sa_out_b, q("sa_out_k"))

    # --- FFN ---------------------------------------------------------------
    f = _gelu_exact(mm(x2, lp.ffn_l1_k, lp.ffn_l1_b, q("ffn_l1_k")))
    g = mm(f, lp.ffn_l2_k, lp.ffn_l2_b, q("ffn_l2_k"))
    scale_f, shift_f = jnp.split(mod_ffn.astype(f32), 2)
    z2 = ln(g, lp.ffn_so_norm_scale, lp.ffn_so_norm_bias)
    z2 = jax.nn.silu(z2 * (1.0 + scale_f[None]) + shift_f[None])
    return x2 + mm(z2, lp.ffn_out_k, lp.ffn_out_b, q("ffn_out_k"))


def fused_layer_reference(x, feats, mod_sa, mod_ffn, lp: LayerParams,
                          num_heads: int, c_real: int,
                          sc: Optional[LayerScales] = None) -> jax.Array:
    """jnp oracle: same math, vmapped over batch."""
    cdtype = lp.fp_norm_scale.dtype
    out = jax.vmap(
        lambda xb, fb, ms, mf: _layer_math(
            xb, fb, ms, mf, lp, num_heads, c_real, cdtype, sc)
    )(x, feats, mod_sa, mod_ffn)
    return out.astype(x.dtype)


def stack_layer_params(lps) -> LayerParams:
    """Stack per-layer LayerParams along a new leading layer axis (the
    chain kernel's grid dimension)."""
    return LayerParams(*(jnp.stack(field) for field in zip(*lps)))


def _chain_step(h, cond, null_emb, null_mask, mod_sa, mod_ffn, lp,
                num_heads, c_real, cdtype, sc=None):
    """One chain-kernel grid step: assemble feats (concat + optional
    classifier-free null substitution over the FULL concat, matching
    models/blocks.py) then run the layer math."""
    feats = jnp.concatenate([h.astype(cond.dtype), cond], axis=-1)
    if null_emb is not None:
        # all-f32 blend: Mosaic requires 32-bit scalar arithmetic, and
        # _layer_math casts feats to f32 anyway.  m is exactly 0.0/1.0 so
        # the blend equals the per-layer path's where() substitution.
        f32 = jnp.float32
        m = null_mask.astype(f32)  # scalar 0/1 for this batch row
        feats = (feats.astype(f32) * (1.0 - m)
                 + null_emb.astype(f32) * m)
    return _layer_math(h, feats, mod_sa, mod_ffn, lp, num_heads, c_real,
                       cdtype, sc)


def fused_branch_reference(x, cond, mods, slp: LayerParams, num_heads: int,
                           c_real: int, null_emb=None,
                           null_mask=None,
                           ssc: Optional[LayerScales] = None) -> jax.Array:
    """jnp oracle for the chain kernel: sequential layers, vmapped batch.

    x (B,T,L); cond (B,T,Cp-L) zero-padded; mods (n,2,B,2L);
    slp stacked over layers; null_mask (B,) float 0/1 or None;
    ssc stacked per-layer scales for int8 slp matrices or None.
    """
    cdtype = slp.fp_norm_scale.dtype
    n_layers = slp.fp_fc1_k.shape[0]
    B = x.shape[0]
    out = []
    for b in range(B):
        h = x[b]
        for i in range(n_layers):
            lp = LayerParams(*(f[i] for f in slp))
            sc = None if ssc is None else LayerScales(*(f[i] for f in ssc))
            h = _chain_step(
                h, cond[b],
                None if null_emb is None else null_emb[0],
                None if null_mask is None else null_mask[b],
                mods[i, 0, b], mods[i, 1, b], lp, num_heads, c_real, cdtype,
                sc)
        out.append(h)
    return jnp.stack(out).astype(x.dtype)


def _chain_kernel(num_heads, c_real, cdtype, use_null, use_quant,
                  x_ref, cond_ref, null_emb_ref, null_mask_ref, mods_ref,
                  *rest):
    nf = len(LayerParams._fields)
    lp = LayerParams(*(r[0] for r in rest[:nf]))
    sc = (LayerScales(*(r[0] for r in rest[nf:nf + len(LayerScales._fields)]))
          if use_quant else None)
    o_ref = rest[-1]
    layer = pl.program_id(1)

    @pl.when(layer == 0)
    def _init():
        o_ref[0] = x_ref[0]

    h = o_ref[0]
    out = _chain_step(
        h, cond_ref[0],
        null_emb_ref[0] if use_null else None,
        null_mask_ref[0, 0, 0] if use_null else None,
        mods_ref[0, 0, 0, 0], mods_ref[0, 1, 0, 0],
        lp, num_heads, c_real, cdtype, sc)
    o_ref[0] = out.astype(o_ref.dtype)


def fused_branch(x: jax.Array,        # (B, T, L) embedded input (post PE)
                 cond: jax.Array,     # (B, T, Cp - L) condition, zero-padded
                 mods: jax.Array,     # (num_layers, 2, B, 2L)
                 slp: LayerParams,    # stacked over layers
                 num_heads: int,
                 c_real: int,
                 null_emb: Optional[jax.Array] = None,   # (1, Cp)
                 null_mask: Optional[jax.Array] = None,  # (B,) 0/1 rows
                 ssc: Optional[LayerScales] = None,      # stacked (n, out)
                 interpret: bool = False) -> jax.Array:
    """A whole denoiser branch's layer stack as ONE Pallas program.

    The grid is (batch, layer): Mosaic revisits the same output block for
    every layer of a row (the running hidden state stays in VMEM) while
    the NEXT layer's weight blocks are DMA-prefetched during the current
    layer's compute — the weights stream from HBM exactly once per call,
    overlapped with the MXU work, and the 16 per-layer dispatches plus
    per-layer concat/pad ops collapse into one launch per branch.
    """
    if not _HAS_PALLAS:  # pragma: no cover
        return fused_branch_reference(x, cond, mods, slp, num_heads, c_real,
                                      null_emb, null_mask, ssc)
    B, T, L = x.shape
    n_layers = slp.fp_fc1_k.shape[0]
    Cp = L + cond.shape[-1]
    use_null = null_emb is not None
    use_quant = ssc is not None
    if not use_null:  # uniform operand list either way
        null_emb = jnp.zeros((1, Cp), dtype=x.dtype)
        null_mask = jnp.zeros((B,), dtype=x.dtype)
    # f32: Mosaic only supports 32-bit scalar extracts, and the kernel
    # reads this as a scalar (null_mask_ref[0, 0, 0])
    null_mask3 = null_mask.reshape(B, 1, 1).astype(jnp.float32)
    mods5 = mods[:, :, :, None, :]               # (n, 2, B, 1, 2L)
    cdtype = slp.fp_norm_scale.dtype
    # stacked per-layer vectors (n, D) would make (1, D) blocks, violating
    # Mosaic's last-two-dims rule for n>1 — lift them to (n, 1, D); the
    # (1, D) in-kernel view broadcasts identically against (T, D)
    slp = LayerParams(*(f[:, None, :] if f.ndim == 2 else f for f in slp))
    if use_quant:
        ssc = LayerScales(*(f[:, None, :] for f in ssc))

    def by_batch(shape):
        return pl.BlockSpec((1,) + tuple(shape[1:]),
                            lambda b, l: (b,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def by_layer(arr):
        return pl.BlockSpec((1,) + arr.shape[1:],
                            lambda b, l: (l,) + (0,) * (arr.ndim - 1),
                            memory_space=pltpu.VMEM)

    in_specs = [
        by_batch(x.shape),
        by_batch(cond.shape),
        pl.BlockSpec(null_emb.shape, lambda b, l: (0, 0),
                     memory_space=pltpu.VMEM),
        by_batch(null_mask3.shape),
        pl.BlockSpec((1, 2, 1, 1, mods.shape[-1]),
                     lambda b, l: (l, 0, b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs += [by_layer(p) for p in slp]
    extra = tuple(ssc) if use_quant else ()
    in_specs += [by_layer(p) for p in extra]

    F = int(slp.ffn_l1_b.shape[-1])
    flops = 2 * B * n_layers * T * (Cp * 2 * L + 2 * L * L + 5 * L * L
                                    + 2 * L * F) \
        + 4 * B * n_layers * T * L * (L // num_heads)
    weight_bytes = sum(p.size * p.dtype.itemsize for p in (*slp, *extra))
    kwargs = {}
    if not interpret:
        # one layer's weights (~8 MB at the shipped width) double-buffered
        # exceeds the default 16 MB scoped-vmem budget; v5e has 128 MB
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_chain_kernel, num_heads, c_real, cdtype,
                          use_null, use_quant),
        grid=(B, n_layers),
        in_specs=in_specs,
        out_specs=by_batch(x.shape),
        out_shape=jax.ShapeDtypeStruct((B, T, L), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=weight_bytes + 3 * B * T * L * x.dtype.itemsize,
            transcendentals=B * n_layers * T * (4 * L + F),
        ),
        interpret=interpret,
        **kwargs,
    )(x, cond, null_emb, null_mask3, mods5, *slp, *extra)


def _kernel(num_heads, c_real, cdtype, use_quant,
            x_ref, feats_ref, mod_sa_ref, mod_ffn_ref, *rest):
    nf = len(LayerParams._fields)
    lp = LayerParams(*(r[...] for r in rest[:nf]))
    sc = (LayerScales(*(r[...] for r in rest[nf:nf + len(LayerScales._fields)]))
          if use_quant else None)
    o_ref = rest[-1]
    out = _layer_math(
        x_ref[0], feats_ref[0], mod_sa_ref[0, 0], mod_ffn_ref[0, 0],
        lp, num_heads, c_real, cdtype, sc)
    o_ref[0] = out.astype(o_ref.dtype)


def fused_layer(x: jax.Array,         # (B, T, L)
                feats: jax.Array,     # (B, T, Cp) pre-concat/substituted/padded
                mod_sa: jax.Array,    # (B, 2L)
                mod_ffn: jax.Array,   # (B, 2L)
                lp: LayerParams,
                num_heads: int,
                c_real: int,
                sc: Optional[LayerScales] = None,
                interpret: bool = False) -> jax.Array:
    """One denoiser layer as a single Pallas program per batch row."""
    if not _HAS_PALLAS:  # pragma: no cover
        return fused_layer_reference(x, feats, mod_sa, mod_ffn, lp,
                                     num_heads, c_real, sc)
    B, T, L = x.shape
    Cp = feats.shape[-1]
    F = lp.ffn_l1_b.shape[0]
    cdtype = lp.fp_norm_scale.dtype
    # Mosaic requires a block's last two dims to be 8/128-divisible OR
    # equal to the array's; a (1, 2L) row block of a (B, 2L) array breaks
    # that for B>1, so the mods get a unit middle axis.
    mod_sa = mod_sa[:, None, :]
    mod_ffn = mod_ffn[:, None, :]

    def row(shape):
        return pl.BlockSpec((1,) + shape[1:], lambda b: (b,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def whole(arr):
        return pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    in_specs = [row(x.shape), row(feats.shape),
                row(mod_sa.shape), row(mod_ffn.shape)]
    in_specs += [whole(p) for p in lp]
    extra = tuple(sc) if sc is not None else ()
    in_specs += [whole(p) for p in extra]

    # 8 matmuls/row: fc1, fc2, qkv(3), sa_out, ffn l1/l2/out + attention
    flops = 2 * B * T * (Cp * 2 * L + 2 * L * L + 5 * L * L + 2 * L * F) \
        + 4 * B * T * L * (L // num_heads)
    weight_bytes = sum(p.size * p.dtype.itemsize for p in (*lp, *extra))
    kwargs = {}
    if not interpret and cdtype.itemsize >= 4:
        # at the shipped width one layer's weights are ~4 MB bf16 / ~8 MB
        # f32; f32 weights + stack overflow the default 16 MB scoped-vmem
        # budget by ~50 KB (observed via bench.py --check), so raise the
        # limit — v5e has 128 MB of vmem.  bf16 fits the default budget;
        # leave it alone there (a larger scoped budget changes Mosaic's
        # pipelining decisions and measured ~10% slower end-to-end).
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_kernel, num_heads, c_real, cdtype,
                          sc is not None),
        grid=(B,),
        in_specs=in_specs,
        out_specs=row(x.shape),
        out_shape=jax.ShapeDtypeStruct((B, T, L), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=weight_bytes + 3 * B * T * L * x.dtype.itemsize,
            transcendentals=B * T * (2 * L + 2 * L + F),
        ),
        interpret=interpret,
        **kwargs,
    )(x, feats, mod_sa, mod_ffn, *lp, *extra)
