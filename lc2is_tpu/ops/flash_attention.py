"""Pallas TPU flash attention — fused forward AND backward.

The hot attention sites (SURVEY.md §2.3): ViT self-attention at 512² input
(1024 tokens × 12 heads), the hierarchical/SR decoder stages (up to 16k
query tokens over conv-reduced KV), and the v1 fusion cross-attention
(1024 queries over ≤77 text tokens with key-padding masks).

Forward kernel: grid (B·H, nQ, nK) with the KV dimension innermost
(sequential on TPU), online-softmax running (m, l, acc) in VMEM scratch,
output + row log-sum-exp written at the last KV step.  Padding to block
multiples is handled here; padded keys and user key-padding masks fold into
one additive bias row.  Softmax statistics are fp32 regardless of input
dtype (bf16-safe).

Backward: two Pallas kernels sharing the forward's saved LSE —
``delta = Σ(dO·O)`` per row is computed in XLA (cheap elementwise), then a
dQ kernel (grid (BH, nQ, nK), f32 dq accumulator in VMEM) and a dK/dV
kernel (grid (BH, nK, nQ), f32 dk/dv accumulators) each recompute the
normalised probabilities ``p = exp(s·scale + bias − lse)`` blockwise — the
flash-style recompute keeps the (Lq, Lk) logits out of HBM in both passes.
Fully-masked rows propagate NaN exactly like the torch reference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                  m_ref, l_ref, acc_ref, *, scale, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]  # (BK, D)
    bias = bias_ref[0]  # (1, BK) additive (0 or NEG_INF)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK)
    s = s * scale + bias  # broadcast row bias over queries

    m_prev = m_ref[:]  # (BQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # (BQ, BK)
    alpha = jnp.exp(m_prev - m_new)  # (BQ, 1)

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(ik == n_k - 1)
    def _finish():
        # fully-masked rows (l == 0) produce NaN like torch softmax would
        # (1/0 = inf; 0·inf = NaN).  Per-row reciprocal, not a (BQ, d) divide.
        o_ref[0] = (acc_ref[:] * (1.0 / l_ref[:])).astype(o_ref.dtype)
        # lse = m + log(l): exp(s - lse) is the NORMALISED probability.
        # Stats live as (BH, Lq_p, 1) so both directions are plain (bq, 1)
        # sublane-major blocks — no in-kernel transposes for Mosaic.
        lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def _pad_inputs(q, k, v, key_padding_mask, block_q, block_k):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bq = min(block_q, _ceil_to(lq, 128))
    bk = min(block_k, _ceil_to(lk, 128))
    lq_p = _ceil_to(lq, bq)
    lk_p = _ceil_to(lk, bk)

    qr = q.reshape(b * h, lq, d)
    kr = k.reshape(b * h, lk, d)
    vr = v.reshape(b * h, lk, d)
    if lq_p != lq:
        qr = jnp.pad(qr, ((0, 0), (0, lq_p - lq), (0, 0)))
    if lk_p != lk:
        kr = jnp.pad(kr, ((0, 0), (0, lk_p - lk), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, lk_p - lk), (0, 0)))

    # one additive bias row per (b·h): user padding mask + right-padding
    valid = jnp.arange(lk_p) < lk
    if key_padding_mask is not None:
        keep = jnp.logical_not(key_padding_mask)  # (B, Lk)
        keep = jnp.pad(keep, ((0, 0), (0, lk_p - lk)))
        keep = keep & valid[None]
        keep = jnp.repeat(keep, h, axis=0)  # (BH, Lk_p)
    else:
        keep = jnp.broadcast_to(valid[None], (b * h, lk_p))
    bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]  # (BH,1,Lk_p)
    return qr, kr, vr, bias, bq, bk, lq_p, lk_p


def _flash_forward(
    q: jnp.ndarray,  # (B, H, Lq, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray],  # (B, Lk) True=ignore
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    with_stats: bool = False,
):
    b, h, lq, d = q.shape
    scale = 1.0 / np.sqrt(d)
    qr, kr, vr, bias, bq, bk, lq_p, lk_p = _pad_inputs(
        q, k, v, key_padding_mask, block_q, block_k)
    n_q = lq_p // bq
    n_k = lk_p // bk

    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, n_k=n_k),
        grid=(b * h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, bk, d), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, bk, d), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, 1, bk), lambda bh, iq, ik: (bh, 0, ik)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda bh, iq, ik: (bh, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, lq_p, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(qr, kr, vr, bias)

    out = out[:, :lq, :].reshape(b, h, lq, d)
    if with_stats:
        return out, lse  # lse (BH, Lq_p, 1) — padded, backward-internal layout
    return out


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, lse_ref,
                         delta_ref, dq_ref, acc_ref, *, scale, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]  # (BK, D)
    g = g_ref[0]  # (BQ, D)
    bias = bias_ref[0]  # (1, BK)
    lse = lse_ref[0]  # (BQ, 1)
    delta = delta_ref[0]  # (BQ, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp(s * scale + bias - lse)  # (BQ, BK) normalised probs
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)  # (BQ, BK) f32
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _finish():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                          *, scale, n_q):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]  # (BK, D)
    g = g_ref[0]  # (BQ, D)
    bias = bias_ref[0]  # (1, BK)
    lse = lse_ref[0]  # (BQ, 1)
    delta = delta_ref[0]  # (BQ, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp(s * scale + bias - lse)  # (BQ, BK)
    pb = p.astype(g.dtype)
    dv_acc[:] += jax.lax.dot_general(pb, g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)  # (BQ, BK)
    dk_acc[:] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(iq == n_q - 1)
    def _finish():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, key_padding_mask, out, lse, g,
                    block_q: int = 512, block_k: int = 512,
                    interpret: bool = False):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = 1.0 / np.sqrt(d)
    qr, kr, vr, bias, bq, bk, lq_p, lk_p = _pad_inputs(
        q, k, v, key_padding_mask, block_q, block_k)
    gr = g.reshape(b * h, lq, d)
    if lq_p != lq:
        gr = jnp.pad(gr, ((0, 0), (0, lq_p - lq), (0, 0)))
    # delta_i = Σ_d dO·O per query row — tiny elementwise reduce in XLA
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = delta.reshape(b * h, lq)
    if lq_p != lq:
        delta = jnp.pad(delta, ((0, 0), (0, lq_p - lq)))
    delta = delta[:, :, None]  # (BH, Lq_p, 1) — matches the saved lse layout
    n_q = lq_p // bq
    n_k = lk_p // bk

    row = lambda bh, iq, ik: (bh, iq, 0)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, n_k=n_k),
        grid=(b * h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, bq, d), row),
            pl.BlockSpec((1, bk, d), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, bk, d), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, 1, bk), lambda bh, iq, ik: (bh, 0, ik)),
            pl.BlockSpec((1, bq, d), row),
            pl.BlockSpec((1, bq, 1), row),
            pl.BlockSpec((1, bq, 1), row),
        ],
        out_specs=pl.BlockSpec((1, bq, d), row),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(qr, kr, vr, bias, gr, lse, delta)

    kcol = lambda bh, ik, iq: (bh, ik, 0)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, n_q=n_q),
        grid=(b * h, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, ik, iq: (bh, iq, 0)),
            pl.BlockSpec((1, bk, d), kcol),
            pl.BlockSpec((1, bk, d), kcol),
            pl.BlockSpec((1, 1, bk), lambda bh, ik, iq: (bh, 0, ik)),
            pl.BlockSpec((1, bq, d), lambda bh, ik, iq: (bh, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda bh, ik, iq: (bh, iq, 0)),
            pl.BlockSpec((1, bq, 1), lambda bh, ik, iq: (bh, iq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), kcol),
            pl.BlockSpec((1, bk, d), kcol),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, lk_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret,
    )(qr, kr, vr, bias, gr, lse, delta)

    dq = dq[:, :lq, :].reshape(b, h, lq, d)
    dk = dk[:, :lk, :].reshape(b, h, lk, d)
    dv = dv[:, :lk, :].reshape(b, h, lk, d)
    return dq, dk, dv


def _reference(q, k, v, key_padding_mask):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, has_mask, mask):
    from lc2is_tpu.ops.dispatch import pallas_interpret

    return _flash_forward(q, k, v, mask if has_mask else None,
                          interpret=pallas_interpret())


def _flash_fwd(q, k, v, has_mask, mask):
    from lc2is_tpu.ops.dispatch import pallas_interpret

    out, lse = _flash_forward(q, k, v, mask if has_mask else None,
                              with_stats=True, interpret=pallas_interpret())
    return out, (q, k, v, mask, out, lse)


def _flash_bwd(has_mask, res, g):
    from lc2is_tpu.ops.dispatch import pallas_interpret

    q, k, v, mask, out, lse = res
    dq, dk, dv = _flash_backward(q, k, v, mask if has_mask else None,
                                 out, lse, g, interpret=pallas_interpret())
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Drop-in for ops.attention.scaled_dot_product_attention (no dropout,
    no dense attn_mask — those routes stay on the XLA path)."""
    if key_padding_mask is None:
        dummy = jnp.zeros((q.shape[0], k.shape[2]), dtype=jnp.bool_)
        return _flash(q, k, v, False, dummy)
    return _flash(q, k, v, True, key_padding_mask)
