"""Attention kernels.

Two code paths, selected per-call or globally:

- ``backend="xla"``: plain jnp einsum formulation. XLA fuses the softmax
  chain but materializes the (B, H, N, N) score tensor in HBM between the
  two matmuls.
- ``backend="pallas"``: a fused single-pass TPU kernel. For the ViT-S
  sequence length (197 tokens, padded to 256) the whole score tile fits in
  VMEM, so no online-softmax blocking over keys is needed — one grid step
  per (batch, head) computes softmax(QK^T * scale) @ V entirely on-chip,
  eliminating the HBM round-trip of the score tensor. This is the
  flash-attention special case where the KV block covers the full sequence.

Replaces the reference's einsum attention
(/root/reference/moco_pretraining/moco/model/module.py:36-105) and the ViT
backbone attention from the external MoCo-v3 ``vits`` module.

The 1-query CLS cross-attention of the MF-ViT CA fusion (module.py:108-138
— q taken from token 0 only, producing a (B, H, 1, N) score) is left to an
XLA einsum: its FLOPs are negligible and XLA fuses the chain into a single
weighted-sum; a dedicated kernel measured slower due to grid overhead.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT_BACKEND = "auto"


def set_default_backend(backend: str) -> None:
    """Set process-wide default attention backend: auto|pallas|xla."""
    global _DEFAULT_BACKEND
    if backend not in ("auto", "pallas", "xla", "pallas_interpret"):
        # not assert: the validation must survive python -O — an invalid
        # string stored here would otherwise dispatch to the Pallas path
        raise ValueError(f"unknown attention backend {backend!r}")
    _DEFAULT_BACKEND = backend


def _resolve(backend: str | None) -> str:
    b = backend or _DEFAULT_BACKEND
    if b == "auto":
        try:
            plat = jax.devices()[0].platform
        except Exception:  # pragma: no cover - no backend at all
            plat = "cpu"
        b = "pallas" if plat == "tpu" else "xla"
    return b


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------- XLA path

def mhsa_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float | None = None) -> jnp.ndarray:
    """Multi-head attention, (B, H, N, D) layout, fp32 softmax."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# --------------------------------------------------------------- Pallas path

def _fused_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       n_valid: int):
    q = q_ref[0]  # (Np, D)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Np, Np)
    if n_valid != s.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p * pl.reciprocal(jnp.sum(p, axis=-1, keepdims=True), approx=False)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mhsa_pallas(q, k, v, scale: float, interpret: bool = False):
    return _mhsa_pallas_fwd_impl(q, k, v, scale, interpret)


def _mhsa_pallas_fwd(q, k, v, scale: float, interpret: bool):
    out = _mhsa_pallas_fwd_impl(q, k, v, scale, interpret)
    return out, (q, k, v)


def _mhsa_pallas_bwd(scale: float, interpret: bool, res, g):
    """Attention backward in XLA math (fp32 softmax recompute).

    The Pallas forward is a single-tile flash special case; for ViT-S
    shapes the recompute backward is bandwidth-cheap and XLA fuses it
    well, so a dedicated backward kernel is not worth the grid overhead.
    """
    q, k, v = res
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_mhsa_pallas.defvjp(_mhsa_pallas_fwd, _mhsa_pallas_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _mhsa_pallas_fwd_impl(q, k, v, scale: float, interpret: bool = False):
    B, H, N, D = q.shape
    Np = _round_up(N, 128)
    BH = B * H

    def prep(x):
        x = x.reshape(BH, N, D)
        if Np != N:
            x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
        return x

    qp, kp, vp = prep(q), prep(k), prep(v)
    kernel = functools.partial(_fused_attn_kernel, scale=scale, n_valid=N)
    spec = pl.BlockSpec((1, Np, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, Np, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * Np * Np * D,
            bytes_accessed=4 * BH * Np * D * q.dtype.itemsize,
            transcendentals=BH * Np * Np,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :N, :].reshape(B, H, N, D)


def mhsa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         scale: float | None = None, backend: str | None = None) -> jnp.ndarray:
    """Fused multi-head self-attention, (B, H, N, D) layout."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b = _resolve(backend)
    if b == "xla":
        return mhsa_reference(q, k, v, scale)
    return _mhsa_pallas(q, k, v, scale, interpret=(b == "pallas_interpret"))


# ------------------------------------------- packed-QKV fused attention v2

def _packed_attn_kernel(qkv_ref, o_ref, *, heads: int, scale: float,
                        n_valid: int):
    """One grid step = CB images x all heads. qkv_ref block:
    (CB, 3, H, D, Np) — the SEQUENCE sits on the 128-wide lane dimension
    (full lane utilization for DMA and VPU; head_dim=32 would waste 3/4 of
    every lane as the minor dim). Scores: s = q^T k contracting the D
    sublanes; PV: o = v p^T contracting N lanes. The (Np, Np) score
    matrices live and die in VMEM — they never touch HBM (the XLA path
    materializes (B, H, N, N) fp32 between its two matmuls)."""
    cb = qkv_ref.shape[0]
    for b in range(cb):
        for h in range(heads):
            q = qkv_ref[b, 0, h]  # (D, Np)
            k = qkv_ref[b, 1, h]
            v = qkv_ref[b, 2, h]
            # s[i, j] = sum_d q[d, i] * k[d, j]
            s = jax.lax.dot_general(
                q, k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (Np, Np)
            if n_valid != s.shape[-1]:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            # o[d, i] = sum_j v[d, j] * p[i, j]
            o = jax.lax.dot_general(
                v, p.astype(v.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (D, Np)
            o_ref[b, h] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def mhsa_packed(qkv, heads: int, scale: float, interpret: bool = False):
    """Fused MHSA on packed qkv (B, N, 3*dim) -> (B, N, dim).

    The layout matches the ViT qkv Linear output directly
    (columns = [q|k|v] x [head0..headH] x head_dim), so the caller does no
    reshapes/transposes — the main HBM cost of the XLA attention path."""
    return _mhsa_packed_impl(qkv, heads, scale, interpret)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _mhsa_packed_impl(qkv, heads: int, scale: float, interpret: bool):
    B, N, three_dim = qkv.shape
    dim = three_dim // 3
    hd = dim // heads
    Np = _round_up(N, 128)
    CB = 4 if B % 4 == 0 else (2 if B % 2 == 0 else 1)
    # XLA-side layout shuffle (cheap, fused): (B,N,3*dim) -> (B,3,H,D,Np)
    x = qkv.reshape(B, N, 3, heads, hd).transpose(0, 2, 3, 4, 1)
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 0), (0, Np - N)))
    kernel = functools.partial(_packed_attn_kernel, heads=heads,
                               scale=scale, n_valid=N)
    out = pl.pallas_call(
        kernel,
        grid=(B // CB,),
        in_specs=[pl.BlockSpec((CB, 3, heads, hd, Np),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CB, heads, hd, Np), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, heads, hd, Np), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * heads * Np * Np * hd,
            bytes_accessed=4 * B * Np * dim * qkv.dtype.itemsize,
            transcendentals=B * heads * Np * Np,
        ),
        interpret=interpret,
    )(x)
    # back to (B, N, dim)
    return out[:, :, :, :N].transpose(0, 3, 1, 2).reshape(B, N, dim)


def _mhsa_packed_fwd(qkv, heads: int, scale: float, interpret: bool):
    return _mhsa_packed_impl(qkv, heads, scale, interpret), (qkv,)


def _mhsa_packed_bwd(heads: int, scale: float, interpret: bool, res, g):
    """XLA-math backward on the packed layout (fp32 softmax recompute)."""
    (qkv,) = res
    B, N, three_dim = qkv.shape
    dim = three_dim // 3
    hd = dim // heads
    def split(x):
        return x.reshape(B, N, heads, hd)
    q = split(qkv[..., :dim])
    k = split(qkv[..., dim:2 * dim])
    v = split(qkv[..., 2 * dim:])
    gf = g.reshape(B, N, heads, hd).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dqkv = jnp.concatenate(
        [dq.reshape(B, N, dim), dk.reshape(B, N, dim),
         dv.reshape(B, N, dim)], axis=-1)
    return (dqkv.astype(qkv.dtype),)


mhsa_packed.defvjp(_mhsa_packed_fwd, _mhsa_packed_bwd)


# -------------------------------------- transposed-layout fused attention

def _packed_attn_kernel_t(qkv_ref, o_ref, *, scale: float, n_valid: int):
    """Transposed-layout variant: qkv_ref block (CB, 3, H, D, Np) — a pure
    VIEW of the (B, 3*dim, N) tensor the qkv GEMM emits directly, so no
    XLA-side transpose at all; N rides the 128-lane dim. All heads of one
    image go through ONE batched dot_general (measured 2.7x faster than a
    per-head matmul loop — the (Np,Np)x(D=32) matmuls are too small
    individually)."""
    cb = qkv_ref.shape[0]
    for b in range(cb):
        q = qkv_ref[b, 0]  # (H, D, Np)
        k = qkv_ref[b, 1]
        v = qkv_ref[b, 2]
        # s[h, i, j] = sum_d q[h, d, i] * k[h, d, j]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (H, Np, Np)
        if n_valid != s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < n_valid, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        # o[h, d, i] = sum_j v[h, d, j] * p[h, i, j]
        o = jax.lax.dot_general(
            v, p.astype(v.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (H, D, Np)
        o_ref[b] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def mhsa_packed_t(qkv_t, heads: int, scale: float, interpret: bool = False):
    """Fused MHSA on TRANSPOSED packed qkv (B, 3*dim, N) -> (B, dim, N).

    Zero layout shuffles end to end: the caller's qkv GEMM emits
    (B, 3*dim, N) directly and the output feeds the proj GEMM contracting
    over dim — XLA fuses both orientations into the GEMMs."""
    return _mhsa_packed_t_impl(qkv_t, heads, scale, interpret)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _mhsa_packed_t_impl(qkv_t, heads: int, scale: float, interpret: bool):
    B, three_dim, N = qkv_t.shape
    dim = three_dim // 3
    hd = dim // heads
    Np = _round_up(N, 128)
    # CB=4 fits the 16MB VMEM budget with double-buffered blocks + the
    # (H, Np, Np) fp32 score scratch; CB=8 OOMs (measured equal perf).
    CB = next(c for c in (4, 2, 1) if B % c == 0)
    x = qkv_t if Np == N else jnp.pad(qkv_t, ((0, 0), (0, 0), (0, Np - N)))
    x = x.reshape(B, 3, heads, hd, Np)  # free view
    kernel = functools.partial(_packed_attn_kernel_t, scale=scale, n_valid=N)
    out = pl.pallas_call(
        kernel,
        grid=(B // CB,),
        in_specs=[pl.BlockSpec((CB, 3, heads, hd, Np),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CB, heads, hd, Np), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, heads, hd, Np), qkv_t.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * heads * Np * Np * hd,
            bytes_accessed=4 * B * Np * dim * qkv_t.dtype.itemsize,
            transcendentals=B * heads * Np * Np,
        ),
        interpret=interpret,
    )(x)
    return out.reshape(B, dim, Np)[:, :, :N]


def _mhsa_packed_t_fwd(qkv_t, heads: int, scale: float, interpret: bool):
    return _mhsa_packed_t_impl(qkv_t, heads, scale, interpret), (qkv_t,)


def _mhsa_packed_t_bwd(heads: int, scale: float, interpret: bool, res, g):
    """XLA-math backward in the transposed layout."""
    (qkv_t,) = res
    B, three_dim, N = qkv_t.shape
    dim = three_dim // 3
    hd = dim // heads

    def split(x):  # (B, dim, N) -> (B, H, D, N)
        return x.reshape(B, heads, hd, N)

    q = split(qkv_t[:, :dim])
    k = split(qkv_t[:, dim:2 * dim])
    v = split(qkv_t[:, 2 * dim:])
    gf = split(g).astype(jnp.float32)
    s = jnp.einsum("bhdq,bhdk->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhdq->bhdk", p, gf,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhdq,bhdk->bhqk", gf, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhdk->bhdq", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhdq->bhdk", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dqkv = jnp.concatenate([dq.reshape(B, dim, N), dk.reshape(B, dim, N),
                            dv.reshape(B, dim, N)], axis=1)
    return (dqkv.astype(qkv_t.dtype),)


mhsa_packed_t.defvjp(_mhsa_packed_t_fwd, _mhsa_packed_t_bwd)


def mhsa_from_packed(qkv: jnp.ndarray, heads: int, scale: float,
                     backend: str | None = None) -> jnp.ndarray:
    """Dispatch packed-qkv attention: Pallas fused kernel on TPU, einsum
    reference elsewhere. (B, N, 3*dim) -> (B, N, dim)."""
    b = _resolve(backend)
    if b in ("pallas", "pallas_interpret"):
        return mhsa_packed(qkv, heads, scale, b == "pallas_interpret")
    B, N, three_dim = qkv.shape
    dim = three_dim // 3
    hd = dim // heads
    q, k, v = (x.reshape(B, N, heads, hd) for x in jnp.split(qkv, 3, -1))
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o.reshape(B, N, dim)


# ------------------------------------------------- 1-query cross-attention

def cross_attention_1q(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       scale: float | None = None) -> jnp.ndarray:
    """CLS-token cross-attention: q (B, H, 1, D), k/v (B, H, N, D).

    The score matrix is (B, H, 1, N) — a per-head weighted sum over values.
    Mirrors reference CrossAttention (module.py:108-138) where the query is
    ``x[:, 0:1]`` only.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
