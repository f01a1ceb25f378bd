"""Int8 serving-path quantization helpers (VERDICT r2 item 2).

Why int8: BASELINE.md's ceiling arithmetic — the model costs 238.43
GFLOP/img, so the v5e bf16 peak (~197 TFLOP/s) caps bf16 inference at
~826 img/s/chip while the 3×-vs-A100@25%-MFU reading of the north star
(981 img/s) sits ABOVE that ceiling; the v5e int8 MXU peak (~394 TOPS)
is the only arithmetic route past it.

Scheme (standard LLM.int8-style symmetric quant, serving only):
- weights: per-output-channel symmetric int8, scale = max|w_row| / 127,
  quantized IN-GRAPH from the checkpoint params (costs one weight read per
  step — trivial next to activations) so checkpoints stay f32/bf16;
- activations: dynamic per-token symmetric int8 computed inside the Pallas
  kernels right before each matmul (values are already VMEM-resident);
- matmul: s8 × s8 → s32 on the MXU (``lax.dot_general`` with
  ``preferred_element_type=int32``), dequantized as
  ``acc * s_act(row) ⊗ s_w(col)`` in f32.

No VJP — the quant path is serving-only; training keeps bf16 (the v4
models gate it behind ``quant_int8`` and the engine never sets it).
The reference has no quantized path at all (eager fp16 autocast at best,
``engine.py:28``); this is a TPU-native extension, accuracy-bounded by the
mask-agreement metric in bench.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(out, in) float weights → (int8 (out, in), f32 (1, out) scales).

    The scale row-vector is laid out for direct use after a contraction on
    the ``in`` axis: ``y[t, o] = acc[t, o] * s_act[t, 1] * ws[1, o]``."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8)
    return q, s.reshape(1, -1)


def quant_act(h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-token (last-axis) symmetric int8: (T, C) → ((T, C) int8,
    (T, 1) f32 scales).  Usable inside Pallas kernels (pure elementwise +
    row reduction)."""
    hf = h.astype(jnp.float32)
    s = jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    return jnp.round(hf / s).astype(jnp.int8), s


def qdot(h: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray) -> jnp.ndarray:
    """h (T, C) float × wq (F, C) int8 (torch layout, contracted on C)
    → (T, F) f32: dynamic per-token act quant + s8×s8→s32 MXU matmul +
    f32 dequant.  For use INSIDE kernels (everything stays in VMEM)."""
    hi, s = quant_act(h)
    acc = jax.lax.dot_general(hi, wq, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s * ws


# ---------------------------------------------------------------------------
# int8 fused MLP (serving twin of ops/fused_mlp.py)
# ---------------------------------------------------------------------------


def _mlp_q_kernel(x_ref, lnw_ref, lnb_ref, w1q_ref, w1s_ref, b1_ref,
                  w2q_ref, w2s_ref, b2_ref, o_ref, *, act, pre, residual, eps):
    from lc2is_tpu.ops.fused_mlp import _act_fn, _ln

    x = x_ref[...]
    lnw = lnw_ref[...].astype(jnp.float32)
    lnb = lnb_ref[...].astype(jnp.float32)
    act_f = _act_fn(act, x.dtype)

    def ff(h):  # h (T, C) f32 → (T, C) f32
        upre = qdot(h, w1q_ref[...], w1s_ref[...]) + b1_ref[...].astype(jnp.float32)
        return qdot(act_f(upre), w2q_ref[...], w2s_ref[...]) + b2_ref[...].astype(jnp.float32)

    xf = x.astype(jnp.float32)
    if pre:
        y = ff(_ln(xf, lnw, lnb, eps))
        out = xf + y if residual else y
        o_ref[...] = out.astype(o_ref.dtype)
    else:
        y = ff(xf)
        s = xf + y if residual else y
        o_ref[...] = _ln(s, lnw, lnb, eps).astype(o_ref.dtype)


def fused_mlp_q(
    x: jnp.ndarray,  # (..., C)
    ln_w: jnp.ndarray, ln_b: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,  # (F, C), (F,) float — quantized in-graph
    w2: jnp.ndarray, b2: jnp.ndarray,  # (C, F), (C,)
    activation: str = "gelu",
    ln_position: str = "pre",
    residual: bool = True,
    eps: float = 1e-5,
    block_tokens: int = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Serving-only int8 twin of ops.fused_mlp.fused_mlp (NO vjp)."""
    import functools

    from jax.experimental import pallas as pl

    orig_shape = x.shape
    c = x.shape[-1]
    f = w1.shape[0]
    xt = x.reshape(-1, c)
    t = xt.shape[0]
    w1q, w1s = quantize_weight(w1)
    w2q, w2s = quantize_weight(w2)

    if block_tokens is None:
        bytes_per_token = 2 * c * x.dtype.itemsize * 2 + f * 4
        bt = max(128, min(2048, (4 * 1024 * 1024) // max(bytes_per_token, 1)))
        bt = (bt // 128) * 128
    else:
        bt = block_tokens
    bt = min(bt, max(128, ((t + 127) // 128) * 128))
    t_pad = ((t + bt - 1) // bt) * bt
    if t_pad != t:
        xt = jnp.pad(xt, ((0, t_pad - t), (0, 0)))

    const = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_mlp_q_kernel, act=activation,
                          pre=ln_position == "pre", residual=residual, eps=eps),
        grid=(t_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((f, c), const),
            pl.BlockSpec((1, f), const),
            pl.BlockSpec((1, f), const),
            pl.BlockSpec((c, f), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
        ],
        out_specs=pl.BlockSpec((bt, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, c), x.dtype),
        interpret=interpret,
    )(xt, ln_w.reshape(1, c), ln_b.reshape(1, c), w1q, w1s,
      b1.reshape(1, f), w2q, w2s, b2.reshape(1, c))
    return out[:t].reshape(orig_shape)
