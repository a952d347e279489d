"""Fused linear-attention kernel (Pallas TPU).

The model's core mixing op (reference models/transformer.py:100-131) is

    q' = softmax(q, axis=feature)        # per head
    k' = softmax(k, axis=time)
    ctx = k'^T v                          # (hd, hd) per (batch, head)
    y  = q' ctx                           # (T, hd)

As separate XLA ops, each softmax and matmul round-trips the (B, T, D)
activations through HBM.  This kernel fuses all four stages in VMEM: one grid
program per batch row, a static unroll over heads, both contractions on the
MXU with fp32 accumulation.  For DiffSHEG shapes (T=34..88, D=512, H=8) the
whole working set is a few hundred KB — far under the ~16 MB VMEM budget.

The op is differentiable: the backward pass recomputes through the
mathematically identical jnp composition (cheap — the tensors are small, and
recompute avoids stashing softmax intermediates), so the kernel is usable in
training as well as in the sampler.

Inputs are PRE-softmax and pre-masked (the additive -1e6 key mask and value
zeroing happen in the caller, reference transformer.py:117-118).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def linear_attention_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                               num_heads: int) -> jax.Array:
    """Pure-jnp composition — numerics oracle and autodiff rule.

    q: (B, T, D); k, v: (B, N, D) pre-softmax (k pre-masked additively, v
    pre-zeroed).  N == T for self-attention; the cross-attention module
    (models/attention.py::LinearTemporalCrossAttention) passes an external
    memory with its own length.
    """
    B, T, D = q.shape
    N = k.shape[1]
    hd = D // num_heads
    qs = jax.nn.softmax(q.reshape(B, T, num_heads, hd), axis=-1)
    ks = jax.nn.softmax(k.reshape(B, N, num_heads, hd), axis=1)
    vv = v.reshape(B, N, num_heads, hd)
    if qs.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        # The CPU thunk runtime cannot execute bf16 x bf16 -> f32 dots at
        # some shapes.  Upcasting is bit-identical here: bf16 products are
        # exact in f32 and accumulation is f32 either way (on TPU the
        # native-MXU bf16 dot stays).
        qs, ks, vv = (a.astype(jnp.float32) for a in (qs, ks, vv))
    ctx = jnp.einsum("bnhd,bnhl->bhdl", ks, vv,
                     preferred_element_type=jnp.float32)
    y = jnp.einsum("bnhd,bhdl->bnhl", qs, ctx.astype(qs.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(q.dtype).reshape(B, T, D)  # back to the input dtype


def _kernel(num_heads: int, hd: int, q_ref, k_ref, v_ref, o_ref):
    """One batch row resident in VMEM; static unroll over heads."""
    f32 = jnp.float32
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        q = q_ref[0, :, sl].astype(f32)
        k = k_ref[0, :, sl].astype(f32)
        v = v_ref[0, :, sl].astype(f32)

        # feature softmax (VPU)
        q = jnp.exp(q - jnp.max(q, axis=-1, keepdims=True))
        q = q / jnp.sum(q, axis=-1, keepdims=True)
        # time softmax (VPU)
        k = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
        k = k / jnp.sum(k, axis=0, keepdims=True)

        # ctx = k^T v : (hd, hd); y = q ctx : (T, hd) — both on the MXU
        ctx = jax.lax.dot_general(
            k, v, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        y = jnp.dot(q, ctx, preferred_element_type=f32)
        o_ref[0, :, sl] = y.astype(o_ref.dtype)


def _pallas_forward(q: jax.Array, k: jax.Array, v: jax.Array,
                    num_heads: int, interpret: bool = False) -> jax.Array:
    B, T, D = q.shape
    hd = D // num_heads
    spec = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    flops = 2 * B * num_heads * (T * hd * hd) * 2
    return pl.pallas_call(
        functools.partial(_kernel, num_heads, hd),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * B * T * D * q.dtype.itemsize,
            transcendentals=2 * B * T * D,
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_linear_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           num_heads: int, interpret: bool = False
                           ) -> jax.Array:
    """Fused softmax-q/softmax-k linear attention.  (B, T, D) -> (B, T, D)."""
    return _pallas_forward(q, k, v, num_heads, interpret)


def _fwd(q, k, v, num_heads, interpret):
    return _pallas_forward(q, k, v, num_heads, interpret), (q, k, v)


def _bwd(num_heads, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda a, b, c: linear_attention_reference(a, b, c, num_heads),
        q, k, v)
    return vjp(g)


fused_linear_attention.defvjp(_fwd, _bwd)


def supports_pallas() -> bool:
    """Fused path available on this backend?

    ``DIFFSHEG_NO_PALLAS=1`` force-disables every Pallas kernel — the
    numerics A/B switch used by ``bench.py --check`` (and a serving escape
    hatch for Mosaic compiler regressions).  Read dynamically so a process
    can trace both variants.
    """
    import os
    if os.environ.get("DIFFSHEG_NO_PALLAS"):
        return False
    if not _HAS_PALLAS:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def linear_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     num_heads: int,
                     use_fused: Optional[bool] = None) -> jax.Array:
    """Dispatch: Pallas kernel for f32 on TPU, jnp composition elsewhere.

    Measured on TPU v5e (examples/perf_probe.py): the fused kernel wins for
    float32 activations (+8% single-stream, +45% at B=8 — it removes the
    HBM roundtrips between the softmaxes and the contractions), but it
    upcasts to f32 internally, which forfeits the native-bf16 MXU path; for
    bfloat16 activations XLA's bf16 einsums tie at B=1 and win ~25-40% at
    large batch, so bf16 dispatches to the composition.
    """
    if use_fused is None:
        use_fused = supports_pallas() and q.dtype == jnp.float32
    if q.shape != k.shape:  # cross-attention memory length differs
        use_fused = False
    if use_fused:
        return fused_linear_attention(q, k, v, num_heads)
    return linear_attention_reference(q, k, v, num_heads)
