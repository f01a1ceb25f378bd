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
            *rest, num_heads, scale, eps, post_ln, quant=False):
    if quant:
        # int8 wq/wo ride in wq_ref/wo_ref with two extra scale refs
        # (ops/quant.py scheme; serving-only)
        wqs_ref, wos_ref, o_ref, attn_sc = rest
    else:
        o_ref, attn_sc = rest
    t, c = x_ref.shape[1], x_ref.shape[2]
    dh = c // num_heads
    x = x_ref[0]  # (T, C)
    if quant:
        from lc2is_tpu.ops.quant import qdot

        q = qdot(x, wq_ref[...], wqs_ref[...]) + bq_ref[...].astype(jnp.float32)
    else:
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
        )  # (T, L)
        if scale != 1.0:  # 1.0 when the caller folded 1/√dh into wq/bq
            logits = logits * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        # per-row reciprocal, not a (T, L) elementwise divide
        probs = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))).astype(x.dtype)
        attn_sc[:, sl] = jax.lax.dot_general(
            probs, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(attn_sc.dtype)

    if quant:
        from lc2is_tpu.ops.quant import qdot

        proj = qdot(attn_sc[...], wo_ref[...], wos_ref[...]) + bo_ref[...].astype(jnp.float32)
    else:
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
    x, k, v, wq, bq, wo, bo, ln_w, ln_b = res
    # fused Pallas backward when K/V fit VMEM alongside their accumulators.
    # The budget covers the decoder's BIG SR self-attention (L=4096, C=512:
    # k/v bf16 8 MB + f32 dk/dv 32 MB + per-block logits ≈ 44 MB, inside the
    # 100 MB cap) — without it that case XLA-recomputes and materialises the
    # (B, H, 16k, 4k) f32 logits twice through HBM, which dominated the
    # training step (bench_train 46 img/s with the 8 MB gate).
    if k.shape[1] * k.shape[2] * 12 <= 40 * 1024 * 1024:
        return _bwd_pallas(x, k, v, wq, bq, wo, bo, ln_w, ln_b, g,
                           num_heads, eps, post_ln, interpret)
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, num_heads, eps, post_ln), *res)
    return vjp(g)


_fused_attn_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def _fwd_impl(x, k, v, wq, bq, wo, bo, ln_w, ln_b, num_heads, eps, post_ln,
              block_q, interpret, quant=False):
    b, p, c = x.shape
    l = k.shape[1]
    dh = c // num_heads
    wdt = x.dtype
    # fold 1/√dh into the q projection (weights AND bias): kills one
    # (T, L) f32 multiply per head per grid step in the kernel
    scl = jnp.asarray(1.0 / np.sqrt(dh), jnp.float32)
    wq = (wq.astype(jnp.float32) * scl).astype(wq.dtype)
    bq = (bq.astype(jnp.float32) * scl).astype(bq.dtype)
    scale = 1.0

    if block_q is None:
        import os as _os

        # logits (T, L) f32 + x/q/attn/out blocks; VMEM cap raised explicitly
        # below — v5e has 128 MB.  Default 16 MB measured best on the
        # decoder at 512²/b16 (8/16/32 MB → 22.2/18.15/18.68 ms)
        budget_mb = int(_os.environ.get("LC2IS_ATTNBLOCK_MB", "16"))
        per_tok = l * 4 + 5 * c * x.dtype.itemsize
        bt = max(128, min(1024, (budget_mb * 1024 * 1024) // per_tok))
        bt = (bt // 128) * 128
    else:
        bt = block_q
    bt = min(bt, max(128, ((p + 127) // 128) * 128))
    p_pad = ((p + bt - 1) // bt) * bt
    if p_pad != p:
        x = jnp.pad(x, ((0, 0), (0, p_pad - p), (0, 0)))

    in_specs = [
        pl.BlockSpec((1, bt, c), lambda bb, ii: (bb, ii, 0)),
        pl.BlockSpec((1, l, c), lambda bb, ii: (bb, 0, 0)),
        pl.BlockSpec((1, l, c), lambda bb, ii: (bb, 0, 0)),
        pl.BlockSpec((c, c), lambda bb, ii: (0, 0)),
        pl.BlockSpec((1, c), lambda bb, ii: (0, 0)),
        pl.BlockSpec((c, c), lambda bb, ii: (0, 0)),
        pl.BlockSpec((1, c), lambda bb, ii: (0, 0)),
        pl.BlockSpec((1, c), lambda bb, ii: (0, 0)),
        pl.BlockSpec((1, c), lambda bb, ii: (0, 0)),
    ]
    if quant:
        from lc2is_tpu.ops.quant import quantize_weight

        wq_q, wq_s = quantize_weight(wq)
        wo_q, wo_s = quantize_weight(wo)
        warg, woarg = wq_q, wo_q
        extra_args = (wq_s, wo_s)
        in_specs += [pl.BlockSpec((1, c), lambda bb, ii: (0, 0)),
                     pl.BlockSpec((1, c), lambda bb, ii: (0, 0))]
    else:
        warg, woarg = wq.astype(wdt), wo.astype(wdt)
        extra_args = ()

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, scale=scale, eps=eps,
                          post_ln=post_ln, quant=quant),
        grid=(b, p_pad // bt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bt, c), lambda bb, ii: (bb, ii, 0)),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, k.astype(wdt), v.astype(wdt), warg,
      bq.reshape(1, c).astype(wdt), woarg, bo.reshape(1, c).astype(wdt),
      ln_w.reshape(1, c).astype(wdt), ln_b.reshape(1, c).astype(wdt),
      *extra_args)
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
    quant: bool = False,  # int8 q/out projections (ops/quant.py) — serving only
) -> jnp.ndarray:
    """out = LN(x + proj(attn(q(x), k, v)))  (torch post-norm layer half)."""
    if quant:
        return _fwd_impl(x, k, v, wq, bq, wo, bo, ln_w, ln_b,
                         num_heads, eps, post_ln, block_q, interpret, quant=True)
    return _fused_attn_vjp(x, k, v, wq, bq, wo, bo, ln_w, ln_b,
                           num_heads, eps, post_ln, block_q, interpret)


# ---------------------------------------------------------------------------
# Fused backward: recompute the forward in VMEM from (x, k, v, weights) per
# query block, then walk the chain backwards.  dk/dv accumulate per batch
# item in revisited output blocks (query-block grid dim iterates fastest);
# weight/LN grads accumulate across the whole grid.
# ---------------------------------------------------------------------------


def _ln_bwd(dy, sf, w, eps):
    c = sf.shape[-1]
    mean = sf.mean(axis=-1, keepdims=True)
    sc = sf - mean
    var = (sc * sc).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    shat = sc * rstd
    dshat = dy * w
    m1 = dshat.mean(axis=-1, keepdims=True)
    m2 = (dshat * shat).mean(axis=-1, keepdims=True)
    ds = (dshat - m1 - shat * m2) * rstd
    return ds, dy * shat, dy


def _bwd_kernel(x_ref, k_ref, v_ref, wq_ref, bq_ref, wo_ref, bo_ref,
                lnw_ref, lnb_ref, g_ref,
                dx_ref, dk_ref, dv_ref, dwq_ref, dbq_ref, dwo_ref, dbo_ref,
                dlnw_ref, dlnb_ref,
                *, num_heads, scale, eps, post_ln):
    bb = pl.program_id(0)
    ii = pl.program_id(1)
    t, c = x_ref.shape[1], x_ref.shape[2]
    dh = c // num_heads

    @pl.when(jnp.logical_and(bb == 0, ii == 0))
    def _():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        dlnw_ref[...] = jnp.zeros_like(dlnw_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

    @pl.when(ii == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    x = x_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # ---- recompute forward ----
    q = (jax.lax.dot_general(x, wq_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + bq_ref[...].astype(jnp.float32)).astype(x.dtype)

    def head_probs(h):
        sl = slice(h * dh, (h + 1) * dh)
        logits = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        return e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))

    att_parts = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        att_parts.append(jax.lax.dot_general(
            head_probs(h).astype(x.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype))
    att = jnp.concatenate(att_parts, axis=-1)  # (T, C)
    proj = jax.lax.dot_general(att, wo_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    sf = proj + bo_ref[...].astype(jnp.float32) + x.astype(jnp.float32)

    # ---- backward ----
    gout = g_ref[0].astype(jnp.float32)
    if post_ln:
        ds, dw_rows, db_rows = _ln_bwd(gout, sf,
                                       lnw_ref[...].astype(jnp.float32), eps)
        dlnw_ref[...] += jnp.sum(dw_rows, axis=0, keepdims=True).astype(dlnw_ref.dtype)
        dlnb_ref[...] += jnp.sum(db_rows, axis=0, keepdims=True).astype(dlnb_ref.dtype)
    else:
        ds = gout
    dsb = ds.astype(x.dtype)
    dwo_ref[...] += jax.lax.dot_general(dsb, att, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32
                                        ).astype(dwo_ref.dtype)
    dbo_ref[...] += jnp.sum(ds, axis=0, keepdims=True).astype(dbo_ref.dtype)
    datt = jax.lax.dot_general(dsb, wo_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(x.dtype)

    dqs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        probs = head_probs(h)  # recomputed — keeping all heads' probs costs 8 MB VMEM
        pb = probs.astype(x.dtype)
        dah = datt[:, sl]
        dprobs = jax.lax.dot_general(dah, v[:, sl], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        dv_ref[0, :, sl] += jax.lax.dot_general(
            pb, dah, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dlog = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
        dlogb = (dlog * scale).astype(x.dtype)
        dqs.append(jax.lax.dot_general(dlogb, k[:, sl], (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
        dk_ref[0, :, sl] += jax.lax.dot_general(
            dlogb, q[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)

    dq = jnp.concatenate(dqs, axis=-1)  # (T, C) f32
    dqb = dq.astype(x.dtype)
    dwq_ref[...] += jax.lax.dot_general(dqb, x, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32
                                        ).astype(dwq_ref.dtype)
    dbq_ref[...] += jnp.sum(dq, axis=0, keepdims=True).astype(dbq_ref.dtype)
    dx = ds + jax.lax.dot_general(dqb, wq_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _bwd_pallas(x, k, v, wq, bq, wo, bo, ln_w, ln_b, g, num_heads, eps,
                post_ln, interpret):
    b, p, c = x.shape
    l = k.shape[1]
    dh = c // num_heads
    scale = 1.0 / np.sqrt(dh)
    wdt = x.dtype

    import os as _os

    per_tok = 3 * l * 4 + 8 * c * 4
    bwd_mb = int(_os.environ.get("LC2IS_ATTNBLOCK_BWD_MB", "3"))
    bt = max(128, min(2048, (bwd_mb * 1024 * 1024) // per_tok))
    bt = (bt // 128) * 128
    bt = min(bt, max(128, ((p + 127) // 128) * 128))
    p_pad = ((p + bt - 1) // bt) * bt
    if p_pad != p:
        x = jnp.pad(x, ((0, 0), (0, p_pad - p), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, p_pad - p), (0, 0)))

    const = lambda bb, ii: (0, 0)
    per_b = lambda bb, ii: (bb, 0, 0)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale,
                          eps=eps, post_ln=post_ln),
        grid=(b, p_pad // bt),
        in_specs=[
            pl.BlockSpec((1, bt, c), lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec((1, l, c), per_b),
            pl.BlockSpec((1, l, c), per_b),
            pl.BlockSpec((c, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((c, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, bt, c), lambda bb, ii: (bb, ii, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, c), lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec((1, l, c), per_b),
            pl.BlockSpec((1, l, c), per_b),
            pl.BlockSpec((c, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((c, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, p_pad, c), wdt),
            # dk/dv accumulate in f32 whenever the (1, L, C) accumulator pair
            # fits the 100 MB VMEM cap next to k/v and the logits block —
            # read-modify-write in bf16 compounds one rounding per query
            # block (up to 128 steps at P=16k), so bf16 is only kept as a
            # last resort above the threshold
            jax.ShapeDtypeStruct((b, l, c), jnp.float32 if l * c <= 4 * 1024 * 1024 else wdt),
            jax.ShapeDtypeStruct((b, l, c), jnp.float32 if l * c <= 4 * 1024 * 1024 else wdt),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, k.astype(wdt), v.astype(wdt), wq.astype(wdt), bq.reshape(1, c).astype(wdt),
      wo.astype(wdt), bo.reshape(1, c).astype(wdt),
      ln_w.reshape(1, c).astype(wdt), ln_b.reshape(1, c).astype(wdt), g)
    dx, dk, dv, dwq, dbq, dwo, dbo, dlnw, dlnb = outs
    return (dx[:, :p], dk.astype(k.dtype), dv.astype(v.dtype),
            dwq.astype(wq.dtype), dbq[0].astype(bq.dtype),
            dwo.astype(wo.dtype), dbo[0].astype(bo.dtype),
            dlnw[0].astype(ln_w.dtype), dlnb[0].astype(ln_b.dtype))
