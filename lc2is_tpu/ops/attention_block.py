"""Fused attention block for the decoder layers: q-projection +
KV-resident multi-head attention + out-projection + residual + post-LN in
one Pallas kernel.

The reference's decoder layers (``model/decoder.py:113-134``,
``model/hierarchical.py:201-225``) attend from up to 16k query tokens over
small key sets — SR-reduced tokens (P/4) or the ~151 class embeddings.  The
unfused path round-trips q, logits (f32, up to (B,8,4096,1024)), probs,
attn-out, and proj through HBM; here k/v for one batch item stay resident
in VMEM and a query block flows HBM→VMEM→HBM once.

k/v are the already-projected per-head keys/values packed back to (B, L, C)
(their projections run in XLA — L is small so they are cheap and shared by
every query block).  LN semantics match nn/layers.py LayerNorm (f32 stats).

Backward: XLA-recompute custom VJP, matching the module composition.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(xf, w, b, eps):
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * w + b


def _kernel(x_ref, k_ref, v_ref, wq_ref, bq_ref, wo_ref, bo_ref, lnw_ref, lnb_ref,
            o_ref, attn_sc, *, num_heads, scale, eps, post_ln):
    t, c = x_ref.shape[1], x_ref.shape[2]
    dh = c // num_heads
    x = x_ref[0]  # (T, C)
    q = jax.lax.dot_general(
        x, wq_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[...].astype(jnp.float32)
    q = q.astype(x.dtype)
    k = k_ref[0]
    v = v_ref[0]

    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (T, L)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        attn_sc[:, sl] = jax.lax.dot_general(
            probs, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(attn_sc.dtype)

    proj = jax.lax.dot_general(
        attn_sc[...], wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[...].astype(jnp.float32)
    s = proj + x.astype(jnp.float32)
    if post_ln:
        s = _ln(s, lnw_ref[...].astype(jnp.float32), lnb_ref[...].astype(jnp.float32), eps)
    o_ref[0] = s.astype(o_ref.dtype)


def _xla_reference(x, k, v, wq, bq, wo, bo, ln_w, ln_b, num_heads, eps, post_ln):
    """Module-composition reference (q/attn/proj/residual/LN), differentiable."""
    b, t, c = x.shape
    dh = c // num_heads
    q = x @ wq.astype(x.dtype).T + bq.astype(x.dtype)

    def heads(a):
        return a.reshape(a.shape[0], a.shape[1], num_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    scale = 1.0 / np.sqrt(dh)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    proj = out @ wo.astype(x.dtype).T + bo.astype(x.dtype)
    s = (proj + x).astype(jnp.float32)
    if post_ln:
        s = _ln(s, ln_w.astype(jnp.float32), ln_b.astype(jnp.float32), eps)
    return s.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _fused_attn_vjp(x, k, v, wq, bq, wo, bo, ln_w, ln_b,
                    num_heads, eps, post_ln, block_q, interpret):
    return _fwd_impl(x, k, v, wq, bq, wo, bo, ln_w, ln_b,
                     num_heads, eps, post_ln, block_q, interpret)


def _vjp_fwd(x, k, v, wq, bq, wo, bo, ln_w, ln_b, num_heads, eps, post_ln,
             block_q, interpret):
    out = _fused_attn_vjp(x, k, v, wq, bq, wo, bo, ln_w, ln_b,
                          num_heads, eps, post_ln, block_q, interpret)
    return out, (x, k, v, wq, bq, wo, bo, ln_w, ln_b)


def _vjp_bwd(num_heads, eps, post_ln, block_q, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, num_heads, eps, post_ln), *res)
    return vjp(g)


_fused_attn_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def _fwd_impl(x, k, v, wq, bq, wo, bo, ln_w, ln_b, num_heads, eps, post_ln,
              block_q, interpret):
    b, p, c = x.shape
    l = k.shape[1]
    dh = c // num_heads
    scale = 1.0 / np.sqrt(dh)
    wdt = x.dtype

    if block_q is None:
        # logits (T, L) f32 + x/q/attn/out blocks; keep ~4 MB activations
        per_tok = l * 4 + 5 * c * x.dtype.itemsize
        bt = max(128, min(1024, (4 * 1024 * 1024) // per_tok))
        bt = (bt // 128) * 128
    else:
        bt = block_q
    bt = min(bt, max(128, ((p + 127) // 128) * 128))
    p_pad = ((p + bt - 1) // bt) * bt
    if p_pad != p:
        x = jnp.pad(x, ((0, 0), (0, p_pad - p), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, scale=scale, eps=eps,
                          post_ln=post_ln),
        grid=(b, p_pad // bt),
        in_specs=[
            pl.BlockSpec((1, bt, c), lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec((1, l, c), lambda bb, ii: (bb, 0, 0)),
            pl.BlockSpec((1, l, c), lambda bb, ii: (bb, 0, 0)),
            pl.BlockSpec((c, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((c, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, c), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, c), lambda bb, ii: (bb, ii, 0)),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, c), x.dtype)],
        interpret=interpret,
    )(x, k.astype(wdt), v.astype(wdt), wq.astype(wdt),
      bq.reshape(1, c).astype(wdt), wo.astype(wdt), bo.reshape(1, c).astype(wdt),
      ln_w.reshape(1, c).astype(wdt), ln_b.reshape(1, c).astype(wdt))
    return out[:, :p]


def fused_attn_block(
    x: jnp.ndarray,  # (B, P, C) query tokens
    k: jnp.ndarray,  # (B, L, C) projected keys, heads packed in C
    v: jnp.ndarray,  # (B, L, C) projected values
    wq: jnp.ndarray, bq: jnp.ndarray,  # (C, C) torch layout, (C,)
    wo: jnp.ndarray, bo: jnp.ndarray,
    ln_w: jnp.ndarray, ln_b: jnp.ndarray,
    num_heads: int,
    eps: float = 1e-5,
    post_ln: bool = True,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """out = LN(x + proj(attn(q(x), k, v)))  (torch post-norm layer half)."""
    return _fused_attn_vjp(x, k, v, wq, bq, wo, bo, ln_w, ln_b,
                           num_heads, eps, post_ln, block_q, interpret)
