"""Fused Swin window-attention Pallas kernel.

Measured on v5e at 512²/batch 16: the XLA window-attention path costs ~37 ms
of swin-small's 73 ms forward — dominated by HBM round-trips for the
(B·nW, heads, 49, 49) logits/probs and the broadcasted bias/mask adds.  This
kernel keeps everything for a G-window block in VMEM:

  head-split → q·kᵀ (batched per head) → ·scale + rel-pos bias
  + shifted-region mask → softmax (fp32) → ·v → head-merge

HBM traffic becomes qkv+out only.  The shifted-window mask is NOT passed as
a dense (nW, 49, 49) tensor: each token carries an int32 region label
(9-region trick computed from iota) and the kernel masks ``region_q !=
region_k`` pairs — 2 bytes/token instead of 2.4 KB/window.

Used by nn/swin.py on TPU backends; the lazy-broadcast XLA path remains for
CPU/tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG = -1e30


# ---------------------------------------------------------------------------
# Head-PAIR packed window attention (shared by the fused window/canvas
# kernels, fwd + bwd).  The per-head (p, dh)·(dh, p) matmuls are MXU-PASS
# bound: each batched instance streams p=64 rows regardless of how little of
# the 128-wide K/N the operands fill, so attention cost = windows·heads·2
# passes (measured ~55 ns/pass on v5e; in-kernel ablation: attention is ~6/7
# of the stage-1 canvas kernel).  Packing TWO heads per matmul halves the
# pass count with ZERO extra exp/softmax work (a window-pair packing variant
# was measured a loss — it doubled the logits and softmax):
#
#   logits2 = Qg (p, 2dh) · Kbd (2p, 2dh)ᵀ — Kbd stacks the pair's keys
#   twice along sublanes, each copy lane-masked to one head's dh lanes, so
#   column i·p+k contracts ONLY head i's lanes (Q needs no masking: the
#   zeroed K lanes kill the cross terms);
#   pv2 = E (p, 2p) · Vbd (2p, 2dh) — Vbd same trick: rows i·p+k carry head
#   i's values in head i's lanes, zeros elsewhere.
#
# Softmax normalisation is per-head SEGMENTED: s0 over lanes < p (one masked
# sum), s1 = total − s0.  No max-subtraction: swin logits are bounded
# (|qk/√dh| + bias ≪ 100 for LN'd inputs; f32 exp overflows only past ~115),
# so exp(l − 30) cannot overflow, and masked slots are exp(−1e30) = 0
# exactly; an all-masked row yields 0/0 → the 1e-30 guard turns it into 0s
# (such rows are pad/void tokens the callers crop).
# ---------------------------------------------------------------------------


def pair_fwd_enabled(num_heads: int) -> bool:
    """Trace-time gate for head-pair packing in the forward kernels
    (LC2IS_PAIR_FWD, default on; measured +~2.5% headline at 512²/b16)."""
    import os as _os

    return num_heads >= 2 and _os.environ.get("LC2IS_PAIR_FWD", "1") != "0"


def pair_bwd_enabled(num_heads: int) -> bool:
    """Trace-time gate for head-pair packing in the backward kernels
    (LC2IS_PAIR_BWD, default on).  A/B at 512²/b8: 136.2 ms (pairs) vs
    138.1 (fwd-only) vs 139.5 (none); an initial 184.9 ms reading against
    pairs was a tunnel artifact (the same window produced a 3.4 s/step
    fluke) and did not reproduce."""
    import os as _os

    return num_heads >= 2 and _os.environ.get("LC2IS_PAIR_BWD", "1") != "0"


def pair_masks(p, dh, dt):
    """(m0, m1, l0) lane masks for the pair helpers: m0/m1 select each
    head's dh lanes (compute dtype); l0 selects the first head's p logit
    lanes (f32)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * dh), 2)
    m0 = (lane < dh).astype(dt)
    m1 = (lane >= dh).astype(dt)
    l0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * p), 2) < p).astype(
        jnp.float32)
    return m0, m1, l0


def pair_attn_fwd(qg, kg, vg, bias2, mask2, scale, m0, m1, l0, out_dtype):
    """One head-pair's window attention: qg/kg/vg (G, p, 2dh), bias2
    (p, 2p) f32 lane-concat of the pair's biases, mask2 (G, p, 2p) bool or
    None.  Returns (G, p, 2dh) attention output in ``out_dtype``."""
    p = qg.shape[1]
    dh = qg.shape[-1] // 2
    kbd = jnp.concatenate([kg * m0, kg * m1], axis=1)  # (G, 2p, 2dh)
    vbd = jnp.concatenate([vg * m0, vg * m1], axis=1)
    logits = jax.lax.dot_general(qg, kbd, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    if scale != 1.0:  # 1.0 when the caller folded 1/√dh into wq/bq
        logits = logits * scale
    logits = logits + bias2[None]
    if mask2 is not None:
        logits = jnp.where(mask2, NEG, logits)
    e = jnp.exp(logits - 30.0)
    s0 = jnp.sum(e * l0, axis=-1, keepdims=True)
    s1 = jnp.sum(e, axis=-1, keepdims=True) - s0
    pv = jax.lax.dot_general(e.astype(vg.dtype), vbd,
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    sh = pv.shape[:2] + (dh,)
    r = jnp.concatenate([jnp.broadcast_to(1.0 / (s0 + 1e-30), sh),
                         jnp.broadcast_to(1.0 / (s1 + 1e-30), sh)], axis=-1)
    return (pv * r).astype(out_dtype)


def pair_attn_bwd(qg, kg, vg, dah, bias2, mask2, scale, m0, m1, l0, dt):
    """Forward-recompute + backward for one head pair.  dah (G, p, 2dh) is
    the upstream grad of the pair's attention output.  Returns
    (att2, dqg, dkg, dvg, dbias2): att2 in ``dt``; grads f32; dbias2
    (p, 2p) = lane-concat of the pair's bias grads (summed over G).
    ``m0f/m1f`` recombines the sublane-stacked dk/dv back to dense (G, p,
    2dh) — the stacking adjoint."""
    p = qg.shape[1]
    kbd = jnp.concatenate([kg * m0, kg * m1], axis=1)
    vbd = jnp.concatenate([vg * m0, vg * m1], axis=1)
    logits = jax.lax.dot_general(qg, kbd, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    if scale != 1.0:
        logits = logits * scale
    logits = logits + bias2[None]
    if mask2 is not None:
        logits = jnp.where(mask2, NEG, logits)
    e = jnp.exp(logits - 30.0)
    s0 = jnp.sum(e * l0, axis=-1, keepdims=True)
    s1 = jnp.sum(e, axis=-1, keepdims=True) - s0
    rseg = l0 * (1.0 / (s0 + 1e-30)) + (1.0 - l0) * (1.0 / (s1 + 1e-30))
    probs = e * rseg  # (G, p, 2p) f32, per-head normalised
    pb = probs.astype(dt)
    att2 = jax.lax.dot_general(pb, vbd, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32).astype(dt)

    dprobs = jax.lax.dot_general(dah, vbd, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    dvstack = jax.lax.dot_general(pb, dah, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
    m0f, m1f = m0.astype(jnp.float32), m1.astype(jnp.float32)
    dvg = dvstack[:, :p] * m0f + dvstack[:, p:] * m1f
    # segmented softmax backward: rowsum per head's p-lane block
    t = dprobs * probs
    t0 = jnp.sum(t * l0, axis=-1, keepdims=True)
    t1 = jnp.sum(t, axis=-1, keepdims=True) - t0
    dlog = probs * (dprobs - (l0 * t0 + (1.0 - l0) * t1))
    dbias2 = jnp.sum(dlog, axis=0)
    dlogb = (dlog * scale).astype(dt) if scale != 1.0 else dlog.astype(dt)
    dqg = jax.lax.dot_general(dlogb, kbd, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    dkstack = jax.lax.dot_general(dlogb, qg, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
    dkg = dkstack[:, :p] * m0f + dkstack[:, p:] * m1f
    return att2, dqg, dkg, dvg, dbias2


def _kernel(q_ref, k_ref, v_ref, reg_ref, bias_ref, o_ref, *, num_heads, scale,
            masked=True):
    g, p, c = q_ref.shape
    dh = c // num_heads
    if masked:
        reg = reg_ref[...]  # (G, p) int32
        # (G, p, p) True where query/key tokens are in different shift regions
        neq = reg[:, :, None] != reg[:, None, :]

    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q_ref[:, :, sl]  # (G, p, dh)
        kh = k_ref[:, :, sl]
        vh = v_ref[:, :, sl]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (G, p, p)
        logits = logits * scale + bias_ref[h][None]
        if masked:
            logits = jnp.where(neq, NEG, logits)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        # one divide per ROW (Mosaic lowers elementwise `/` literally; the
        # (.., p, p) divide was ~p x the VPU work of a (.., p, 1) reciprocal)
        probs = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
        out = jax.lax.dot_general(
            probs.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def _xla_window_attention(q, k, v, bias, regions, num_heads):
    """Reference implementation (autodiff path for the custom VJP)."""
    n, p, c = q.shape
    dh = c // num_heads

    def heads(t):
        return t.reshape(n, p, num_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    scale = 1.0 / np.sqrt(dh)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale + bias[None]
    if regions is not None:
        neq = regions[:, None, :, None] != regions[:, None, None, :]
        logits = jnp.where(neq, NEG, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(n, p, c)


def window_attention(
    q: jnp.ndarray,  # (N, p, C) — N = B·nW windows, heads packed in C
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (heads, p, p) relative-position bias, f32
    regions: Optional[jnp.ndarray],  # (N, p) int32 shift-region labels or None
    num_heads: int,
    block_windows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable wrapper: Pallas forward, XLA-recompute backward."""
    if regions is None:
        dummy = jnp.zeros((q.shape[0], q.shape[1]), jnp.int32)
        return _window_attention_vjp(q, k, v, bias, False, num_heads, block_windows,
                                     interpret, dummy)
    return _window_attention_vjp(q, k, v, bias, True, num_heads, block_windows,
                                 interpret, regions)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _window_attention_vjp(q, k, v, bias, has_regions, num_heads, block_windows,
                          interpret, regions):
    return _window_attention_fwd_impl(
        q, k, v, bias, regions if has_regions else None, num_heads, block_windows, interpret
    )


def _wa_fwd(q, k, v, bias, has_regions, num_heads, block_windows, interpret, regions):
    out = _window_attention_vjp(q, k, v, bias, has_regions, num_heads,
                                block_windows, interpret, regions)
    return out, (q, k, v, bias, regions)


def _wa_bwd(has_regions, num_heads, block_windows, interpret, res, g):
    q, k, v, bias, regions = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _xla_window_attention(
            q_, k_, v_, b_, regions if has_regions else None, num_heads
        ),
        q, k, v, bias,
    )
    dq, dk, dv, db = vjp(g)
    return dq, dk, dv, db, None


_window_attention_vjp.defvjp(_wa_fwd, _wa_bwd)


def _window_attention_fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    regions: Optional[jnp.ndarray],
    num_heads: int,
    block_windows: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    n, p, c = q.shape
    dh = c // num_heads
    scale = 1.0 / np.sqrt(dh)
    masked = regions is not None

    if block_windows is not None:
        g = min(block_windows, n)
    else:
        # adapt windows-per-step to VMEM: qkv+out (4·g·p·c·2B) + logits
        # (g·p·p·4B) within ~6 MB leaves room for double buffering
        # conservative: Mosaic double-buffers the 4 data blocks and the
        # per-head logits/exp/probs intermediates all live at once
        budget = 1536 * 1024
        per_window = 4 * p * c * 2 + p * p * 4
        g = min(max(8, min(32, budget // per_window)), n)
        g = max(8, (g // 8) * 8)  # regions block is (g, p): sublane dim % 8
    n_pad = ((n + g - 1) // g) * g
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    if regions is None:
        regions = jnp.zeros((n_pad, p), jnp.int32)
    elif regions.shape[0] != n_pad:
        regions = jnp.pad(regions, ((0, n_pad - regions.shape[0]), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, scale=scale,
                          masked=masked),
        grid=(n_pad // g,),
        in_specs=[
            pl.BlockSpec((g, p, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, p, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, p, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, p), lambda i: (i, 0)),
            pl.BlockSpec((num_heads, p, p), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, p, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, p, c), q.dtype),
        interpret=interpret,
    )(q, k, v, regions, bias.astype(jnp.float32))
    return out[:n]


@functools.lru_cache(maxsize=64)
def _np_region_labels(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Per-token 9-region labels after window partition: (nW, p) int32."""
    def region(n, idx):
        return (idx >= n - window).astype(np.int32) + (idx >= n - shift).astype(np.int32)

    hh = region(hp, np.arange(hp))
    ww = region(wp, np.arange(wp))
    img = hh[:, None] * 3 + ww[None, :]
    m = img.reshape(hp // window, window, wp // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)
    return m.astype(np.int32)


def region_labels(batch: int, hp: int, wp: int, window: int, shift: int) -> Optional[jnp.ndarray]:
    """(B·nW, p) labels for the shifted case; None when shift == 0."""
    if shift == 0:
        return None
    m = jnp.asarray(_np_region_labels(hp, wp, window, shift))  # (nW, p) small
    return jnp.tile(m, (batch, 1))


@functools.lru_cache(maxsize=64)
def _np_pad_labels(h: int, w: int, hp: int, wp: int, window: int, shift: int) -> Optional[np.ndarray]:
    """(nW, p) int32, 1 at canvas-pad token positions after [roll +]
    window-partition; None when the canvas needs no padding."""
    if h == hp and w == wp:
        return None
    canvas = np.zeros((hp, wp), np.int32)
    canvas[h:, :] = 1
    canvas[:, w:] = 1
    if shift:
        canvas = np.roll(canvas, (-shift, -shift), axis=(0, 1))
    m = canvas.reshape(hp // window, window, wp // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)
    return m


def pad_labels(batch: int, h: int, w: int, hp: int, wp: int, window: int,
               shift: int) -> Optional[jnp.ndarray]:
    """(B·nW, p) mask of canvas-pad tokens (must be post-LN zero to match
    HF's pad-after-layernorm order); None when hp==h and wp==w."""
    m = _np_pad_labels(h, w, hp, wp, window, shift)
    if m is None:
        return None
    return jnp.tile(jnp.asarray(m), (batch, 1))


# ---------------------------------------------------------------------------
# Fused swin attention block: LN + QKV + window attention + out-proj
# (+ residual) in one kernel.  The unfused path round-trips LN output and
# q/k/v/attn/proj activations through HBM (~10 tensor traversals per block);
# here HBM traffic is x-in + out (+ VMEM-resident weights).
# Replaces the attention half of nn/swin.py's SwinBlock on TPU; the MLP half
# is ops/fused_mlp.py.  Covers HF SwinSelfAttention+SwinSelfOutput semantics
# (separate q/k/v Linears passed packed, fp32 softmax, rel-pos bias,
# shifted-region masking) — reference anchor model/encoder.py:121-131.
# ---------------------------------------------------------------------------


def _ln_f32(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * w + b


def _block_kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  reg_ref, pad_ref, bias_ref, *rest,
                  num_heads, scale, eps, residual, quant=False,
                  masked=True, padded=True):
    if quant:
        # int8 weights ride in wqkv_ref/wo_ref; their per-channel scales are
        # two extra refs (ops/quant.py scheme; serving-only)
        wqkvs_ref, wos_ref, o_ref, attn_sc = rest
    else:
        o_ref, attn_sc = rest
    g, p, c = x_ref.shape  # p is padded to a sublane-aligned multiple (64)
    dh = c // num_heads
    x = x_ref[...]
    # 2D views for the projections: (g, p, C) <-> (g·p, C) is a pure
    # sublane-merge because p is 16-aligned (Mosaic rejects it for raw 49)
    x2 = x.reshape(g * p, c)
    h = _ln_f32(x2, lnw_ref[...].astype(jnp.float32), lnb_ref[...].astype(jnp.float32),
                eps)
    # HF pads the canvas AFTER layernorm_before: pad tokens enter attention
    # as post-LN zeros (keys bk, values bv).  LN runs inside this kernel, so
    # the pad tokens must be re-zeroed here — LN(0)=ln_bias otherwise.
    # (unsqueeze on the int32 (g, p) mask — a (g·p, 1) reshape is a
    # minor-dim insert Mosaic cannot lower)
    # ``masked``/``padded`` are TRACE-TIME flags: non-shifted blocks (half of
    # every stage) skip the region compare+select entirely, and unpadded
    # canvases (e.g. 448² where 112 % 7 == 0) skip the pad re-zeroing.
    if padded:
        h = jnp.where(pad_ref[...][:, :, None] != 0, 0.0, h.reshape(g, p, c)).reshape(g * p, c)
    if quant:
        from lc2is_tpu.ops.quant import qdot

        qkv2 = qdot(h, wqkv_ref[...], wqkvs_ref[...]) + bqkv_ref[...].astype(jnp.float32)
    else:
        qkv2 = jax.lax.dot_general(
            h.astype(x.dtype), wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[...].astype(jnp.float32)  # (g·p, 3C)
    qkv = qkv2.astype(x.dtype).reshape(g, p, 3 * c)

    # head-PAIR packed attention (see pair_attn_fwd above): halves the MXU
    # pass count of the per-head (p, dh)·(dh, p) batched matmuls
    use_pairs = pair_fwd_enabled(num_heads)
    mask2 = None
    if masked:
        reg = reg_ref[...]
        if use_pairs:
            reg2 = jnp.concatenate([reg, reg], axis=-1)
            mask2 = reg[:, :, None] != reg2[:, None, :]
    if use_pairs:
        m0, m1, l0 = pair_masks(p, dh, x.dtype)
    hd = 0
    while use_pairs and hd + 1 < num_heads:
        qg = qkv[:, :, hd * dh:(hd + 2) * dh]
        kg = qkv[:, :, c + hd * dh: c + (hd + 2) * dh]
        vg = qkv[:, :, 2 * c + hd * dh: 2 * c + (hd + 2) * dh]
        bias2 = jnp.concatenate([bias_ref[hd], bias_ref[hd + 1]], axis=-1)
        attn_sc[:, :, hd * dh:(hd + 2) * dh] = pair_attn_fwd(
            qg, kg, vg, bias2, mask2, scale, m0, m1, l0, attn_sc.dtype)
        hd += 2
    while hd < num_heads:  # tail: odd head count, or pairs disabled
        sl = slice(hd * dh, (hd + 1) * dh)
        qh = qkv[:, :, hd * dh : (hd + 1) * dh]
        kh = qkv[:, :, c + hd * dh : c + (hd + 1) * dh]
        vh = qkv[:, :, 2 * c + hd * dh : 2 * c + (hd + 1) * dh]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if scale != 1.0:  # 1.0 when the caller folded 1/√dh into wq/bq
            logits = logits * scale
        logits = logits + bias_ref[hd][None]
        if masked:
            logits = jnp.where(mask2[:, :, :p] if mask2 is not None else
                               (reg[:, :, None] != reg[:, None, :]),
                               NEG, logits)
        e = jnp.exp(logits - 30.0)
        probs = e * (1.0 / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30))
        attn_sc[:, :, sl] = jax.lax.dot_general(
            probs.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(attn_sc.dtype)
        hd += 1

    if quant:
        from lc2is_tpu.ops.quant import qdot

        proj = qdot(attn_sc[...].reshape(g * p, c), wo_ref[...], wos_ref[...])
        proj = proj + bo_ref[...].astype(jnp.float32)
    else:
        proj = jax.lax.dot_general(
            attn_sc[...].reshape(g * p, c), wo_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[...].astype(jnp.float32)
    if residual:
        proj = proj + x2.astype(jnp.float32)
    o_ref[...] = proj.reshape(g, p, c).astype(o_ref.dtype)


def _xla_block_reference(x, ln_w, ln_b, wqkv, bqkv, wo, bo, regions, bias,
                         num_heads, eps, residual, pad=None):
    """Differentiable module-composition reference (defines the VJP)."""
    h = _ln_f32(x, ln_w.astype(jnp.float32), ln_b.astype(jnp.float32), eps)
    if pad is not None:
        h = jnp.where(pad[..., None] != 0, 0.0, h)
    h = h.astype(x.dtype)
    c = x.shape[-1]
    qkv = h @ wqkv.astype(h.dtype).T + bqkv.astype(h.dtype)
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    out = _xla_window_attention(q, k, v, bias, regions, num_heads)
    proj = out @ wo.astype(out.dtype).T + bo.astype(out.dtype)
    return proj + x if residual else proj


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15, 16))
def _fused_block_vjp(x, ln_w, ln_b, wqkv, bqkv, wo, bo, regions, pad, bias,
                     has_regions, has_pad, num_heads, eps, residual,
                     block_windows, interpret):
    return _fused_block_fwd_impl(x, ln_w, ln_b, wqkv, bqkv, wo, bo,
                                 regions if has_regions else None,
                                 pad if has_pad else None, bias,
                                 num_heads, eps, residual, block_windows, interpret)


def _fused_block_fwd(x, ln_w, ln_b, wqkv, bqkv, wo, bo, regions, pad, bias,
                     has_regions, has_pad, num_heads, eps, residual,
                     block_windows, interpret):
    out = _fused_block_vjp(x, ln_w, ln_b, wqkv, bqkv, wo, bo, regions, pad, bias,
                           has_regions, has_pad, num_heads, eps, residual,
                           block_windows, interpret)
    return out, (x, ln_w, ln_b, wqkv, bqkv, wo, bo, regions, pad, bias)


def _fused_block_bwd(has_regions, has_pad, num_heads, eps, residual,
                     block_windows, interpret, res, g):
    x, ln_w, ln_b, wqkv, bqkv, wo, bo, regions, pad, bias = res
    c = x.shape[-1]
    if c <= 768:
        # fused Pallas backward (flash-style in-VMEM recompute); at C=768
        # (stage 4) the adaptive windows-per-step floor of 8 keeps the block
        # set ≈ 8·0.5 MB + 21 MB of weight/grad operands — well inside VMEM
        dx, dlw, dlb, dwq, dbq, dwo, dbo_, dbi = _fused_block_bwd_pallas(
            x, ln_w, ln_b, wqkv, bqkv, wo, bo,
            regions if has_regions else None,
            pad if has_pad else None, bias, g,
            num_heads, eps, residual, interpret,
        )
        return dx, dlw, dlb, dwq, dbq, dwo, dbo_, None, None, dbi
    _, vjp = jax.vjp(
        lambda x_, lw, lb, wq, bq, wo_, bo_, bi: _xla_block_reference(
            x_, lw, lb, wq, bq, wo_, bo_, regions if has_regions else None, bi,
            num_heads, eps, residual, pad=pad if has_pad else None,
        ),
        x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias,
    )
    dx, dlw, dlb, dwq, dbq, dwo, dbo, dbi = vjp(g)
    return dx, dlw, dlb, dwq, dbq, dwo, dbo, None, None, dbi


_fused_block_vjp.defvjp(_fused_block_fwd, _fused_block_bwd)


def _fused_block_fwd_impl(x, ln_w, ln_b, wqkv, bqkv, wo, bo, regions, pad_mask,
                          bias, num_heads, eps, residual, block_windows, interpret,
                          quant=False):
    n, p, c = x.shape
    dh = c // num_heads
    wdt = x.dtype
    masked = regions is not None
    padded = pad_mask is not None
    # fold 1/√dh into the q projection (weights AND bias): kills one
    # (g, p, p) f32 multiply per head per grid step in the kernel
    scl = jnp.asarray(1.0 / np.sqrt(dh), jnp.float32)
    wqkv = jnp.concatenate([wqkv[:c].astype(jnp.float32) * scl,
                            wqkv[c:].astype(jnp.float32)]).astype(wqkv.dtype)
    bqkv = jnp.concatenate([bqkv[:c].astype(jnp.float32) * scl,
                            bqkv[c:].astype(jnp.float32)]).astype(bqkv.dtype)
    scale = 1.0

    # pad the window token dim to a 16-aligned p so the kernel's
    # (g, p, C) <-> (g·p, C) views are legal sublane merges; padded KEYS are
    # masked through the bias (NEG columns), padded QUERY rows are sliced off
    p_pad = ((p + 15) // 16) * 16
    if p_pad != p:
        x = jnp.pad(x, ((0, 0), (0, p_pad - p), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, p_pad - p), (0, 0)), constant_values=0.0)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, p_pad - p)), constant_values=NEG)
        if regions is not None:
            regions = jnp.pad(regions, ((0, 0), (0, p_pad - p)))
        if pad_mask is not None:
            pad_mask = jnp.pad(pad_mask, ((0, 0), (0, p_pad - p)))

    if block_windows is not None:
        g = min(block_windows, n)
    else:
        import os as _os

        # activation VMEM budget per grid step; sweepable for perf probes
        # (more windows per step = fewer grid steps + bigger matmuls)
        budget_mb = int(_os.environ.get("LC2IS_WINBLOCK_MB", "6"))
        per_window = 5 * p_pad * c * 2 + p_pad * p_pad * 4  # x, qkv(3), attn + logits
        g = min(max(8, min(256, (budget_mb * 1024 * 1024) // per_window)), n)
        g = max(8, (g // 8) * 8)
    n_pad = ((n + g - 1) // g) * g
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0), (0, 0))
        x = jnp.pad(x, pad)
    if regions is None:
        regions = jnp.zeros((n_pad, p_pad), jnp.int32)
    elif regions.shape[0] != n_pad:
        regions = jnp.pad(regions, ((0, n_pad - regions.shape[0]), (0, 0)))
    if pad_mask is None:
        pad_mask = jnp.zeros((n_pad, p_pad), jnp.int32)
    elif pad_mask.shape[0] != n_pad:
        pad_mask = jnp.pad(pad_mask, ((0, n_pad - pad_mask.shape[0]), (0, 0)))

    from jax.experimental.pallas import tpu as pltpu

    in_specs = [
        pl.BlockSpec((g, p_pad, c), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((3 * c, c), lambda i: (0, 0)),
        pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
        pl.BlockSpec((c, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((g, p_pad), lambda i: (i, 0)),
        pl.BlockSpec((g, p_pad), lambda i: (i, 0)),
        pl.BlockSpec((num_heads, p_pad, p_pad), lambda i: (0, 0, 0)),
    ]
    if quant:
        from lc2is_tpu.ops.quant import quantize_weight

        wqkv_q, wqkv_s = quantize_weight(wqkv)
        wo_q, wo_s = quantize_weight(wo)
        w_args = (wqkv_q, bqkv.reshape(1, 3 * c).astype(wdt),
                  wo_q, bo.reshape(1, c).astype(wdt))
        extra_args = (wqkv_s, wo_s)
        in_specs += [pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
                     pl.BlockSpec((1, c), lambda i: (0, 0))]
    else:
        w_args = (wqkv.astype(wdt), bqkv.reshape(1, 3 * c).astype(wdt),
                  wo.astype(wdt), bo.reshape(1, c).astype(wdt))
        extra_args = ()

    out = pl.pallas_call(
        functools.partial(_block_kernel, num_heads=num_heads, scale=scale,
                          eps=eps, residual=residual, quant=quant,
                          masked=masked, padded=padded),
        grid=(n_pad // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, p_pad, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, p_pad, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((g, p_pad, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, ln_w.reshape(1, c).astype(wdt), ln_b.reshape(1, c).astype(wdt),
      *w_args, regions, pad_mask, bias.astype(jnp.float32), *extra_args)
    return out[:n, :p]


def fused_window_block(
    x: jnp.ndarray,  # (N, p, C) pre-LN windowed tokens
    ln_w: jnp.ndarray, ln_b: jnp.ndarray,  # (C,)
    wqkv: jnp.ndarray,  # (3C, C) packed torch-layout q/k/v weights
    bqkv: jnp.ndarray,  # (3C,)
    wo: jnp.ndarray, bo: jnp.ndarray,  # (C, C), (C,)
    bias: jnp.ndarray,  # (heads, p, p) rel-pos bias
    regions: Optional[jnp.ndarray],  # (N, p) int32 or None
    num_heads: int,
    eps: float = 1e-5,
    residual: bool = True,
    block_windows: Optional[int] = None,
    interpret: bool = False,
    pad_mask: Optional[jnp.ndarray] = None,  # (N, p) nonzero at canvas-pad tokens
    quant: bool = False,  # int8 QKV/proj matmuls (ops/quant.py) — serving only
) -> jnp.ndarray:
    """out = [x +] proj(window_attn(qkv(LN(x)))) — one VMEM pass."""
    if quant:
        # serving-only int8 path: no VJP (training keeps bf16)
        return _fused_block_fwd_impl(x, ln_w, ln_b, wqkv, bqkv, wo, bo,
                                     regions, pad_mask, bias, num_heads, eps,
                                     residual, block_windows, interpret,
                                     quant=True)
    dummy = jnp.zeros((x.shape[0], x.shape[1]), jnp.int32)
    return _fused_block_vjp(x, ln_w, ln_b, wqkv, bqkv, wo, bo,
                            dummy if regions is None else regions,
                            dummy if pad_mask is None else pad_mask, bias,
                            regions is not None, pad_mask is not None,
                            num_heads, eps, residual, block_windows, interpret)


# ---------------------------------------------------------------------------
# Fused backward kernel for the window block (flash-style: recompute the
# forward in VMEM from x, then walk the chain backwards; weight/bias grads
# accumulate across grid steps in revisited output blocks).  Used for
# C <= 512 — stage-4 (768-wide) grads exceed VMEM and keep the XLA-recompute
# path (2 blocks at 256 tokens/img, negligible).
# ---------------------------------------------------------------------------


def _ln_bwd(dy, xf, w, eps):
    """Backward of y = norm(x)*w+b given upstream dy; returns (dx, dw_rows, db_rows).
    All f32 2D (T, C); dw/db are per-row contributions (caller sums rows)."""
    c = xf.shape[-1]
    mean = xf.mean(axis=-1, keepdims=True)
    xc = xf - mean
    var = (xc * xc).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    dxhat = dy * w
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * rstd
    return dx, dy * xhat, dy


def _block_bwd_kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref, wo_ref,
                      reg_ref, pad_ref, bias_ref, g_ref,
                      dx_ref, dlnw_ref, dlnb_ref, dwqkv_ref, dbqkv_ref,
                      dwo_ref, dbo_ref, dbias_ref,
                      *, num_heads, scale, eps, residual,
                      masked=True, padded=True):
    i = pl.program_id(0)
    g_, p, c = x_ref.shape
    dh = c // num_heads
    rows = g_ * p

    @pl.when(i == 0)
    def _():
        dlnw_ref[...] = jnp.zeros_like(dlnw_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    x = x_ref[...]
    x2 = x.reshape(rows, c)
    lnw = lnw_ref[...].astype(jnp.float32)
    lnb = lnb_ref[...].astype(jnp.float32)

    # ---- recompute forward ----
    xf = x2.astype(jnp.float32)
    if padded:
        # (g_, p, 1) int32-unsqueeze mask — a (rows, 1) reshape is a minor-dim
        # insert Mosaic cannot lower
        padm = pad_ref[...][:, :, None] != 0
        _mask_pad = lambda t: jnp.where(padm, 0.0,
                                        t.reshape(g_, p, c)).reshape(rows, c)
    else:
        _mask_pad = lambda t: t
    h = _mask_pad(_ln_f32(x2, lnw, lnb, eps)).astype(x.dtype)
    qkv2 = jax.lax.dot_general(h, wqkv_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    qkv2 = qkv2 + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv2.astype(x.dtype).reshape(g_, p, 3 * c)
    if masked:
        reg = reg_ref[...]
        neq = reg[:, :, None] != reg[:, None, :]

    gout = g_ref[...].reshape(rows, c).astype(jnp.float32)

    # ---- out-proj backward: proj = att@Woᵀ + bo ----
    # datt (rows, C) = gout @ Wo ; dWo += goutᵀ @ att ; dbo += Σ gout
    datt2 = jax.lax.dot_general(gout.astype(x.dtype), wo_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    datt = datt2.astype(x.dtype).reshape(g_, p, c)

    # head-PAIR packed fwd-recompute + backward (see pair_attn_bwd above)
    use_pairs = pair_bwd_enabled(num_heads)
    mask2 = None
    if masked and use_pairs:
        reg2 = jnp.concatenate([reg, reg], axis=-1)
        mask2 = reg[:, :, None] != reg2[:, None, :]
    if use_pairs:
        m0, m1, l0 = pair_masks(p, dh, x.dtype)
    att_parts = []
    dqs, dks, dvs = [], [], []
    hd = 0
    while use_pairs and hd + 1 < num_heads:
        qg = qkv[:, :, hd * dh:(hd + 2) * dh]
        kg = qkv[:, :, c + hd * dh: c + (hd + 2) * dh]
        vg = qkv[:, :, 2 * c + hd * dh: 2 * c + (hd + 2) * dh]
        dah = datt[:, :, hd * dh:(hd + 2) * dh]
        bias2 = jnp.concatenate([bias_ref[hd], bias_ref[hd + 1]], axis=-1)
        att2, dqg, dkg, dvg, dbias2 = pair_attn_bwd(
            qg, kg, vg, dah, bias2, mask2, scale, m0, m1, l0, x.dtype)
        att_parts.append(att2)
        dbias_ref[hd] += dbias2[:, :p].astype(dbias_ref.dtype)
        dbias_ref[hd + 1] += dbias2[:, p:].astype(dbias_ref.dtype)
        dqs.append(dqg)
        dks.append(dkg)
        dvs.append(dvg)
        hd += 2
    while hd < num_heads:  # tail: odd head count, or pairs disabled
        qh = qkv[:, :, hd * dh : (hd + 1) * dh]
        kh = qkv[:, :, c + hd * dh : c + (hd + 1) * dh]
        vh = qkv[:, :, 2 * c + hd * dh : 2 * c + (hd + 1) * dh]
        logits = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
        logits = logits * scale + bias_ref[hd][None]
        if masked:
            logits = jnp.where(neq, NEG, logits)
        e = jnp.exp(logits - 30.0)
        probs = e * (1.0 / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30))
        pb = probs.astype(x.dtype)
        att_h = jax.lax.dot_general(pb, vh, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
        att_parts.append(att_h.astype(x.dtype))

        dah = datt[:, :, hd * dh : (hd + 1) * dh]
        # dprobs = dah @ vhᵀ ; dv = probsᵀ @ dah
        dprobs = jax.lax.dot_general(dah, vh, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
        dvh = jax.lax.dot_general(pb, dah, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        # softmax backward
        dlog = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
        dbias_ref[hd] += jnp.sum(dlog, axis=0).astype(dbias_ref.dtype)
        dlogb = (dlog * scale).astype(x.dtype)
        dqh = jax.lax.dot_general(dlogb, kh, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        dkh = jax.lax.dot_general(dlogb, qh, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        dqs.append(dqh)
        dks.append(dkh)
        dvs.append(dvh)
        hd += 1

    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (g, p, 3C) f32
    att2 = jnp.concatenate(att_parts, axis=-1).reshape(rows, c)
    dwo_ref[...] += jax.lax.dot_general(
        gout.astype(x.dtype), att2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dwo_ref.dtype)
    dbo_ref[...] += jnp.sum(gout, axis=0, keepdims=True).astype(dbo_ref.dtype)

    dqkv2 = dqkv.reshape(rows, 3 * c)
    dbqkv_ref[...] += jnp.sum(dqkv2, axis=0, keepdims=True).astype(dbqkv_ref.dtype)
    dqkv2b = dqkv2.astype(x.dtype)
    dwqkv_ref[...] += jax.lax.dot_general(
        dqkv2b, h, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dwqkv_ref.dtype)
    dhf = jax.lax.dot_general(dqkv2b, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # pad tokens were forced to post-LN zero in the forward: no gradient
    # flows through their LN (dx, dln_w, dln_b contributions all zero)
    dhf = _mask_pad(dhf)
    dx_ln, dw_rows, db_rows = _ln_bwd(dhf, xf, lnw, eps)
    dlnw_ref[...] += jnp.sum(dw_rows, axis=0, keepdims=True).astype(dlnw_ref.dtype)
    dlnb_ref[...] += jnp.sum(db_rows, axis=0, keepdims=True).astype(dlnb_ref.dtype)
    dx = dx_ln + (gout if residual else 0.0)
    dx_ref[...] = dx.reshape(g_, p, c).astype(dx_ref.dtype)


def _fused_block_bwd_pallas(x, ln_w, ln_b, wqkv, bqkv, wo, bo, regions, pad_mask,
                            bias, g_out, num_heads, eps, residual, interpret):
    """pallas_call driver for _block_bwd_kernel; returns grads for
    (x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias)."""
    from jax.experimental.pallas import tpu as pltpu

    n, p, c = x.shape
    dh = c // num_heads
    scale = 1.0 / np.sqrt(dh)
    wdt = x.dtype
    masked = regions is not None
    padded = pad_mask is not None

    p_pad = ((p + 15) // 16) * 16
    if p_pad != p:
        x = jnp.pad(x, ((0, 0), (0, p_pad - p), (0, 0)))
        g_out = jnp.pad(g_out, ((0, 0), (0, p_pad - p), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, p_pad - p), (0, 0)), constant_values=0.0)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, p_pad - p)), constant_values=NEG)
        if regions is not None:
            regions = jnp.pad(regions, ((0, 0), (0, p_pad - p)))
        if pad_mask is not None:
            pad_mask = jnp.pad(pad_mask, ((0, 0), (0, p_pad - p)))

    per_window = 5 * p_pad * c * 2 + p_pad * p_pad * 4
    g = min(max(8, min(32, (4 * 1024 * 1024) // per_window)), n)
    g = max(8, (g // 8) * 8)
    n_pad = ((n + g - 1) // g) * g
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0), (0, 0)))
        g_out = jnp.pad(g_out, ((0, n_pad - n), (0, 0), (0, 0)))
    if regions is None:
        regions = jnp.zeros((n_pad, p_pad), jnp.int32)
    elif regions.shape[0] != n_pad:
        regions = jnp.pad(regions, ((0, n_pad - regions.shape[0]), (0, 0)))
    if pad_mask is None:
        pad_mask = jnp.zeros((n_pad, p_pad), jnp.int32)
    elif pad_mask.shape[0] != n_pad:
        pad_mask = jnp.pad(pad_mask, ((0, n_pad - pad_mask.shape[0]), (0, 0)))

    const = lambda i: (0, 0)
    outs = pl.pallas_call(
        functools.partial(_block_bwd_kernel, num_heads=num_heads, scale=scale,
                          eps=eps, residual=residual,
                          masked=masked, padded=padded),
        grid=(n_pad // g,),
        in_specs=[
            pl.BlockSpec((g, p_pad, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((3 * c, c), const),
            pl.BlockSpec((1, 3 * c), const),
            pl.BlockSpec((c, c), const),
            pl.BlockSpec((g, p_pad), lambda i: (i, 0)),
            pl.BlockSpec((g, p_pad), lambda i: (i, 0)),
            pl.BlockSpec((num_heads, p_pad, p_pad), lambda i: (0, 0, 0)),
            pl.BlockSpec((g, p_pad, c), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, p_pad, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((3 * c, c), const),
            pl.BlockSpec((1, 3 * c), const),
            pl.BlockSpec((c, c), const),
            pl.BlockSpec((1, c), const),
            pl.BlockSpec((num_heads, p_pad, p_pad), lambda i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, p_pad, c), wdt),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((3 * c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((num_heads, p_pad, p_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, ln_w.reshape(1, c).astype(wdt), ln_b.reshape(1, c).astype(wdt),
      wqkv.astype(wdt), bqkv.reshape(1, 3 * c).astype(wdt), wo.astype(wdt),
      regions, pad_mask, bias.astype(jnp.float32), g_out)

    dx, dlnw, dlnb, dwqkv, dbqkv, dwo, dbo, dbias = outs
    return (dx[:n, :p],
            dlnw[0].astype(ln_w.dtype), dlnb[0].astype(ln_b.dtype),
            dwqkv.astype(wqkv.dtype), dbqkv[0].astype(bqkv.dtype),
            dwo.astype(wo.dtype), dbo[0].astype(bo.dtype),
            dbias[:, :p, :p].astype(bias.dtype))
