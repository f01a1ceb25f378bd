"""Fused transformer-MLP Pallas kernel: LayerNorm + Linear + act + Linear
(+ residual) in one VMEM pass.

Why: XLA cannot fuse across two matmuls, so the unfused FF block round-trips
the (T, 4C) intermediate through HBM — the single largest activation tensor
in both the swin backbone (``nn/swin.py`` SwinIntermediate/SwinOutput, gelu,
pre-LN) and the reference's torch decoder layers (``model/decoder.py``
``_ff_block``, relu, post-LN).  Profiled at 512²/batch 16 the swin backbone
moves 33 GB/step at ~600 GB/s — HBM-bound; this kernel keeps the
intermediate (and the LayerNorm statistics) in VMEM, reducing the FF block's
HBM traffic to x-in + out (+ weights, VMEM-resident across grid steps).

Two orderings, matching the two module families exactly:

- ``ln_position="pre"`` (swin block):   out = x + W2·act(W1·LN(x))
- ``ln_position="post"`` (torch layer): out = LN(x + W2·act(W1·x))

Weights are torch-layout ((out, in), as stored by nn/layers.py Linear) and
are contracted on their ``in`` axis directly — no transposes.

Backward: XLA-recompute custom VJP (the same policy as ops/window_attention
and ops/flash_attention) — the Pallas forward is used for the fwd pass and
the differentiable XLA composition defines the gradient.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _erf_f32(x):
    """Eigen/XLA-style f32 rational erf — Mosaic has no erf/erfc lowering.
    Max abs error vs scipy.special.erf: 3.6e-7 (measured on v5e)."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    a = jnp.float32(-2.72614225801306e-10)
    a = a * x2 + jnp.float32(2.77068142495902e-08)
    a = a * x2 + jnp.float32(-2.10102402082508e-06)
    a = a * x2 + jnp.float32(-5.69250639462346e-05)
    a = a * x2 + jnp.float32(-7.34990630326855e-04)
    a = a * x2 + jnp.float32(-2.95459980854025e-03)
    a = a * x2 + jnp.float32(-1.60960333262415e-02)
    a = a * x
    b = jnp.float32(-1.45660718464996e-05)
    b = b * x2 + jnp.float32(-2.13374055278905e-04)
    b = b * x2 + jnp.float32(-1.68282697438203e-03)
    b = b * x2 + jnp.float32(-7.37332916720468e-03)
    b = b * x2 + jnp.float32(-1.42647390514189e-02)
    return a / b


def _gelu_exact_f32(x):
    """erf-gelu via the rational erf above — matches torch/HF to 2e-5."""
    return 0.5 * x * (1.0 + _erf_f32(x * jnp.float32(0.7071067811865476)))


def _gelu_poly_f32(x):
    """Division-free f32 gelu: gelu(t) = t/2 + t²·P(t²) with P a degree-7
    minimax polynomial on t∈[-4,4] (gelu−t/2 is even, so P is genuinely a
    polynomial in t² — erf alone is not), exact-x tail above 4.  Max abs
    error vs erf-gelu: 4.1e-4 — far below bf16 resolution (~3e-3 relative),
    and ~5 VPU ops cheaper than the rational-erf form, with no divide
    (stage-3 swin blocks are VPU-bound).  Default policy is AUTO: poly when
    the kernel's compute dtype is bf16 (the error is under bf16's own
    rounding, so the bf16 path is numerically indistinguishable — measured
    2.2 ms off the swin forward), exact erf for f32 so the 2e-5 torch/HF
    goldens stay bit-tight.  LC2IS_FAST_GELU=1/0 forces poly/exact.  A
    higher-degree fit cannot close the 4e-4 gap (f32 Horner rounding floors
    at ~1e-4 for wider clip ranges — measured)."""
    t = jnp.clip(x, -4.0, 4.0)
    u = t * t
    p = jnp.float32(-1.5484756e-09)
    p = p * u + jnp.float32(1.1899754e-07)
    p = p * u + jnp.float32(-4.014895e-06)
    p = p * u + jnp.float32(7.932062e-05)
    p = p * u + jnp.float32(-0.001037015)
    p = p * u + jnp.float32(0.00961666)
    p = p * u + jnp.float32(-0.066079915)
    p = p * u + jnp.float32(0.3987861)
    y = jnp.float32(0.5) * t + u * p
    return jnp.where(x > 4.0, x, y)


def _act_fn(name: str, dtype=None):
    if name == "relu":
        return lambda x: jnp.maximum(x, 0.0)
    if name == "gelu":  # exact (erf) — torch / HF-swin default
        import os

        mode = os.environ.get("LC2IS_FAST_GELU", "auto")
        if mode == "1" or (mode != "0" and dtype == jnp.bfloat16):
            return _gelu_poly_f32
        return _gelu_exact_f32
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise ValueError(name)


def _ln(xf, w, b, eps):
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * w + b


def _kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest,
            act, pre, residual, eps, save_upre):
    if save_upre:
        o_ref, u_ref = rest
    else:
        (o_ref,) = rest
    x = x_ref[...]  # (T, C)
    lnw = lnw_ref[...].astype(jnp.float32)  # (1, C)
    lnb = lnb_ref[...].astype(jnp.float32)
    act_f = _act_fn(act, x.dtype)

    def ff(h):  # h: (T, C) in compute dtype
        upre = jax.lax.dot_general(
            h, w1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...].astype(jnp.float32)
        if save_upre:
            u_ref[...] = upre.astype(u_ref.dtype)
        u = act_f(upre).astype(h.dtype)
        y = jax.lax.dot_general(
            u, w2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[...].astype(jnp.float32)
        return y  # (T, C) f32

    if pre:
        h = _ln(x.astype(jnp.float32), lnw, lnb, eps).astype(x.dtype)
        y = ff(h)
        out = x.astype(jnp.float32) + y if residual else y
        o_ref[...] = out.astype(o_ref.dtype)
    else:
        y = ff(x)
        s = x.astype(jnp.float32) + y if residual else y
        o_ref[...] = _ln(s, lnw, lnb, eps).astype(o_ref.dtype)


def _xla_reference(x, ln_w, ln_b, w1, b1, w2, b2, *, act, pre, residual, eps):
    """Differentiable reference — mirrors nn/layers.py module composition."""
    act_f = _act_fn(act, x.dtype)

    def ln(v):
        vf = v.astype(jnp.float32)
        mean = vf.mean(axis=-1, keepdims=True)
        var = ((vf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (vf - mean) * jax.lax.rsqrt(var + eps)
        return (y * ln_w + ln_b).astype(v.dtype)

    def ff(h):
        # the erf polynomial's f32 constants would promote bf16; keep the
        # composition's dtype identical to the module path
        u = act_f(h @ w1.astype(h.dtype).T + b1.astype(h.dtype)).astype(h.dtype)
        return u @ w2.astype(h.dtype).T + b2.astype(h.dtype)

    if pre:
        y = ff(ln(x))
        return x + y if residual else y
    y = ff(x)
    return ln(x + y if residual else y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _fused_mlp_vjp(x, ln_w, ln_b, w1, b1, w2, b2,
                   act, pre, residual, eps, block_tokens, interpret):
    return _fwd_impl(x, ln_w, ln_b, w1, b1, w2, b2, act=act, pre=pre,
                     residual=residual, eps=eps, block_tokens=block_tokens,
                     interpret=interpret)


def _vjp_fwd(x, ln_w, ln_b, w1, b1, w2, b2, act, pre, residual, eps,
             block_tokens, interpret):
    out, upre = _fwd_impl(x, ln_w, ln_b, w1, b1, w2, b2, act=act, pre=pre,
                          residual=residual, eps=eps, block_tokens=block_tokens,
                          interpret=interpret, save_upre=True)
    return out, (x, ln_w, ln_b, w1, b1, w2, b2, upre)


def _act_prime(act, upre):
    """d act / d upre at the pre-activation (f32)."""
    if act == "relu":
        return (upre > 0).astype(jnp.float32)
    if act in ("gelu", "gelu_tanh"):
        # exact-gelu derivative: Φ(x) + x·φ(x)
        phi_cdf = 0.5 * (1.0 + jax.lax.erf(upre * jnp.float32(0.7071067811865476)))
        pdf = jnp.exp(-0.5 * upre * upre) * jnp.float32(0.3989422804014327)
        return phi_cdf + upre * pdf
    raise ValueError(act)


def _vjp_bwd(act, pre, residual, eps, block_tokens, interpret, res, g):
    """Analytic backward from the saved pre-activation — pure MXU matmuls,
    no forward recompute (the round-trip of upre replaces two matmuls and
    several (T,F) materialisations of the autodiff path)."""
    x, ln_w, ln_b, w1, b1, w2, b2, upre = res
    dt = x.dtype
    shape = x.shape
    c = shape[-1]
    f = w1.shape[0]
    x2 = x.reshape(-1, c)
    g2 = g.reshape(-1, c).astype(jnp.float32)
    upf = upre.astype(jnp.float32)
    u = _act_fn(act, dt)(upf).astype(dt)  # same fwd act choice (poly/exact)
    lnw_f = ln_w.astype(jnp.float32)

    def ln_bwd(dy, sf):
        cc = sf.shape[-1]
        mean = sf.mean(axis=-1, keepdims=True)
        sc = sf - mean
        var = (sc * sc).mean(axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        shat = sc * rstd
        dshat = dy * lnw_f
        m1 = dshat.mean(axis=-1, keepdims=True)
        m2 = (dshat * shat).mean(axis=-1, keepdims=True)
        return (dshat - m1 - shat * m2) * rstd, (dy * shat).sum(0), dy.sum(0)

    if pre:
        xf = x2.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        xc = xf - mean
        var = (xc * xc).mean(axis=-1, keepdims=True)
        h = (xc * jax.lax.rsqrt(var + eps) * lnw_f + ln_b.astype(jnp.float32)).astype(dt)
        dy = g2
    else:
        y = (u @ w2.astype(dt).T + b2.astype(dt)).astype(jnp.float32)
        sf = x2.astype(jnp.float32) + y if residual else y
        dy, dlnw, dlnb = ln_bwd(g2, sf)
        h = x2

    dyb = dy.astype(dt)
    dw2 = (dyb.T @ u).astype(w2.dtype)
    db2 = dy.sum(0).astype(b2.dtype)
    du = (dyb @ w2.astype(dt)).astype(jnp.float32)
    dupre = du * _act_prime(act, upf)
    dupb = dupre.astype(dt)
    dw1 = (dupb.T @ h).astype(w1.dtype)
    db1 = dupre.sum(0).astype(b1.dtype)
    dh = (dupb @ w1.astype(dt)).astype(jnp.float32)

    if pre:
        dx_ln, dlnw, dlnb = ln_bwd(dh, x2.astype(jnp.float32))
        dx = dx_ln + (g2 if residual else 0.0)
    else:
        dx = dh + (dy if residual else 0.0)

    return (dx.astype(dt).reshape(shape), dlnw.astype(ln_w.dtype),
            dlnb.astype(ln_b.dtype), dw1, db1, dw2, db2)


_fused_mlp_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def _fwd_impl(x, ln_w, ln_b, w1, b1, w2, b2, *, act, pre, residual, eps,
              block_tokens, interpret, save_upre=False):
    orig_shape = x.shape
    c = x.shape[-1]
    f = w1.shape[0]
    xt = x.reshape(-1, c)
    t = xt.shape[0]

    wdt = x.dtype
    w1c, w2c = w1.astype(wdt), w2.astype(wdt)

    if block_tokens is None:
        import os as _os

        # VMEM: x/out (T,C)·2 double-buffered + intermediate (T,F) f32 +
        # weights 2·C·F — keep the activation working set near ~4 MB
        # (sweepable via LC2IS_MLP_MB for perf probes)
        budget_mb = int(_os.environ.get("LC2IS_MLP_MB", "4"))
        bytes_per_token = 2 * c * x.dtype.itemsize * 2 + f * 4
        bt = max(128, min(2048, (budget_mb * 1024 * 1024) // max(bytes_per_token, 1)))
        bt = (bt // 128) * 128
    else:
        bt = block_tokens
    bt = min(bt, max(128, ((t + 127) // 128) * 128))
    t_pad = ((t + bt - 1) // bt) * bt
    if t_pad != t:
        xt = jnp.pad(xt, ((0, t_pad - t), (0, 0)))

    out_specs = pl.BlockSpec((bt, c), lambda i: (i, 0))
    out_shape = jax.ShapeDtypeStruct((t_pad, c), x.dtype)
    if save_upre:
        out_specs = [out_specs, pl.BlockSpec((bt, f), lambda i: (i, 0))]
        out_shape = [out_shape, jax.ShapeDtypeStruct((t_pad, f), x.dtype)]

    out = pl.pallas_call(
        functools.partial(_kernel, act=act, pre=pre, residual=residual, eps=eps,
                          save_upre=save_upre),
        grid=(t_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((f, c), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((c, f), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xt, ln_w.reshape(1, c).astype(wdt), ln_b.reshape(1, c).astype(wdt),
      w1c, b1.reshape(1, f).astype(wdt), w2c, b2.reshape(1, c).astype(wdt))
    if save_upre:
        return out[0][:t].reshape(orig_shape), out[1][:t]
    return out[:t].reshape(orig_shape)


def fused_mlp(
    x: jnp.ndarray,  # (..., C)
    ln_w: jnp.ndarray,  # (C,)
    ln_b: jnp.ndarray,  # (C,)
    w1: jnp.ndarray,  # (F, C) torch layout
    b1: jnp.ndarray,  # (F,)
    w2: jnp.ndarray,  # (C, F) torch layout
    b2: jnp.ndarray,  # (C,)
    activation: str = "gelu",
    ln_position: str = "pre",
    residual: bool = True,
    eps: float = 1e-5,
    block_tokens: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """out = x + W2·act(W1·LN(x))  (pre)  or  LN(x + W2·act(W1·x))  (post)."""
    assert ln_position in ("pre", "post"), ln_position
    return _fused_mlp_vjp(x, ln_w, ln_b, w1, b1, w2, b2,
                          activation, ln_position == "pre", residual, eps,
                          block_tokens, interpret)
