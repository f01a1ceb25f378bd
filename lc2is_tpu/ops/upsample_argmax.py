"""Fused bilinear-upsample + per-pixel argmax for serving.

The flagship models end with ``resize(score_map, x4, bilinear)`` then an
argmax over the 151 classes (``model/final.py:355-356`` + mask generation,
``utils.py:15-22``).  Materialising the upsampled (B, K, 512, 512) map costs
~2.4 GB of HBM traffic per batch-16 step; serving only needs the argmax.
This kernel computes ``argmax_k bilinear_up(score_map)[k]`` tile-by-tile
without ever writing the upsampled map:

- layout (B, K, h, w): K lives on a leading dim, so per-class planes are
  (rows, lanes) tiles; the argmax is a leading-dim reduction (cheap VPU);
- H taps come from a prev/cur/next row-block halo (same scheme as
  ops/upsample); W taps are lane rolls with iota edge masks;
- ties resolve to the LOWEST class index (min-trick), matching
  jnp.argmax/torch.argmax first-occurrence semantics bit-exactly.

Forward-only (serving path — not differentiable, like argmax itself).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lc2is_tpu.ops.upsample import _phase_weights


def _kernel(prv_ref, cur_ref, nxt_ref, o_ref, wide, *, hb, r, n_classes):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    k, w = cur_ref.shape[2], cur_ref.shape[3]

    # slab layout (hb+2, K, w): row reads are leading-dim indexing (Mosaic
    # rejects middle-axis row gathers as unsupported shape casts)
    wide[1 : hb + 1] = cur_ref[0]
    wide[0] = prv_ref[0, hb - 1]
    wide[hb + 1] = nxt_ref[0, 0]

    @pl.when(i == 0)
    def _():
        wide[0] = wide[1]

    @pl.when(i == n_i - 1)
    def _():
        wide[hb + 1] = wide[hb]

    ids = jax.lax.broadcasted_iota(jnp.int32, (k, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, w), 1)
    phases = _phase_weights(r)

    for j in range(hb):
        for mh, (h_prev, h_wo, h_wc) in enumerate(phases):
            other = wide[j if h_prev else j + 2].astype(jnp.float32)
            cur = wide[j + 1].astype(jnp.float32)
            hrow = h_wo * other + h_wc * cur  # (K, w)
            left = jnp.where(col == 0, hrow, pltpu.roll(hrow, 1, 1))
            right = jnp.where(col == w - 1, hrow, pltpu.roll(hrow, w - 1, 1))
            for mw, (w_prev, w_wo, w_wc) in enumerate(phases):
                oth = left if w_prev else right
                blended = w_wo * oth + w_wc * hrow
                mx = jnp.max(blended, axis=0, keepdims=True)
                sel = jnp.where(blended == mx, ids, n_classes)
                idx = jnp.min(sel, axis=0, keepdims=True)  # (1, w)
                o_ref[0, (r * j + mh) * r + mw] = idx[0]


def upsample_argmax(
    score_map: jnp.ndarray,  # (B, K, h, w)
    r: int = 4,
    interpret: bool = False,
    block_rows: Optional[int] = None,
) -> jnp.ndarray:
    """argmax_k of the torch-bilinear r× upsample of score_map: (B, rh, rw)
    int32, identical to jnp.argmax(resize(score_map, scale_factor=r), 1)."""
    b, k, h, w = score_map.shape
    hb = block_rows or 8
    while h % hb:
        hb //= 2
    n_blocks = h // hb
    score_map = jnp.swapaxes(score_map, 1, 2)  # (B, h, K, w)

    blk = (1, hb, k, w)
    out = pl.pallas_call(
        functools.partial(_kernel, hb=hb, r=r, n_classes=k),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(blk, lambda bb, ii: (bb, jnp.maximum(ii - 1, 0), 0, 0)),
            pl.BlockSpec(blk, lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec(blk, lambda bb, ii, nb=n_blocks: (bb, jnp.minimum(ii + 1, nb - 1), 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r * hb * r, w), lambda bb, ii: (bb, ii, 0)),
        out_shape=jax.ShapeDtypeStruct((b, r * h * r, w), jnp.int32),
        scratch_shapes=[pltpu.VMEM((hb + 2, k, w), score_map.dtype)],
        interpret=interpret,
    )(score_map, score_map, score_map)
    # rows are stored (h_out, w_phase): (B, rh·r, w) -> (B, rh, rw)
    out = out.reshape(b, r * h, r, w).transpose(0, 1, 3, 2).reshape(b, r * h, r * w)
    return out


# ---------------------------------------------------------------------------
# Fully fused serving head: L2-normalise + 151-way cosine classification +
# bilinear x4 upsample + argmax in ONE kernel.  The separate path
# (zoo._score_map einsum -> (B,K,h,w) transpose -> upsample_argmax) spends
# most of its 4.4 ms (512²/b16 measured) in the pathological minor->major
# XLA transpose of the (B,P,K) matmul output; here the scores are computed
# as (K, w) tiles directly (t_n @ v_rowᵀ), so no score map and no transpose
# ever touch HBM.  Matches model/final.py:349-356 + utils.py:15-22.
# ---------------------------------------------------------------------------


def _score_kernel(tn_ref, prv_ref, cur_ref, nxt_ref, o_ref, wide,
                  *, hb, r, n_classes, eps):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    k_pad, w = wide.shape[1], wide.shape[2]
    c = cur_ref.shape[3]

    tn = tn_ref[0]  # (k_pad, c), L2-normalised outside, zero pad rows

    rid = jax.lax.broadcasted_iota(jnp.int32, (k_pad, w), 0)

    def normalize(rows):  # (n, c) -> torch F.normalize rows
        f = rows.astype(jnp.float32)
        nrm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
        return rows / jnp.maximum(nrm, eps).astype(rows.dtype)

    def round_mask(s, iota_shape):
        # round to the input dtype so masks match the unfused path's
        # materialised score map bit-for-bit; pad class rows forced to NEG
        # so they can never win the argmax
        ri = jax.lax.broadcasted_iota(jnp.int32, iota_shape, 0)
        return jnp.where(ri >= n_classes, NEG,
                         s.astype(cur_ref.dtype).astype(jnp.float32))

    if w % 128 == 0:
        # ONE matmul for the whole slab: (k_pad, c) @ (c, (hb+2)·w) keeps
        # the MXU N-dim large (per-row (k,c)@(c,w) matmuls measured too
        # small); the j·w lane slices below are tile-aligned
        rows = jnp.concatenate(
            [prv_ref[0, hb - 1]] + [cur_ref[0, j] for j in range(hb)]
            + [nxt_ref[0, 0]], axis=0)  # ((hb+2)·w, c)
        s_all = jax.lax.dot_general(tn, normalize(rows),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        s_all = round_mask(s_all, s_all.shape)
        for j in range(hb + 2):
            wide[j] = s_all[:, j * w:(j + 1) * w]
    else:
        def scores(row):  # (w, c) -> (k_pad, w)
            s = jax.lax.dot_general(tn, normalize(row),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return round_mask(s, (k_pad, w))

        for j in range(hb):
            wide[j + 1] = scores(cur_ref[0, j])
        wide[0] = scores(prv_ref[0, hb - 1])
        wide[hb + 1] = scores(nxt_ref[0, 0])

    @pl.when(i == 0)
    def _():
        wide[0] = wide[1]

    @pl.when(i == n_i - 1)
    def _():
        wide[hb + 1] = wide[hb]

    ids = jax.lax.broadcasted_iota(jnp.int32, (k_pad, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k_pad, w), 1)
    phases = _phase_weights(r)

    for j in range(hb):
        for mh, (h_prev, h_wo, h_wc) in enumerate(phases):
            other = wide[j if h_prev else j + 2].astype(jnp.float32)
            cur = wide[j + 1].astype(jnp.float32)
            hrow = h_wo * other + h_wc * cur  # (k_pad, w)
            left = jnp.where(col == 0, hrow, pltpu.roll(hrow, 1, 1))
            right = jnp.where(col == w - 1, hrow, pltpu.roll(hrow, w - 1, 1))
            for mw, (w_prev, w_wo, w_wc) in enumerate(phases):
                oth = left if w_prev else right
                blended = w_wo * oth + w_wc * hrow
                mx = jnp.max(blended, axis=0, keepdims=True)
                sel = jnp.where(blended == mx, ids, n_classes)
                idx = jnp.min(sel, axis=0, keepdims=True)  # (1, w)
                o_ref[0, (r * j + mh) * r + mw] = idx[0]


NEG = -1e30


def score_upsample_argmax(
    v_tokens: jnp.ndarray,   # (B, P, C) decoder output tokens (pre-norm)
    t_norm: jnp.ndarray,     # (B, K, C) L2-normalised class embeddings
    grid: int,
    r: int = 4,
    interpret: bool = False,
    block_rows: Optional[int] = None,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """argmax_k bilinear_up(cosine_scores)[k] without materialising the
    score map: (B, r·grid, r·grid) int32.  Equals
    jnp.argmax(resize(_score_map(v, t, grid), scale_factor=r), 1)."""
    b, p, c = v_tokens.shape
    h = w = grid
    k = t_norm.shape[1]
    k_pad = ((k + 7) // 8) * 8
    tn = t_norm
    if k_pad != k:
        tn = jnp.pad(tn, ((0, 0), (0, k_pad - k), (0, 0)))
    v4 = v_tokens.reshape(b, h, w, c)

    hb = block_rows or 8
    while h % hb:
        hb //= 2
    n_blocks = h // hb

    blk = (1, hb, w, c)
    out = pl.pallas_call(
        functools.partial(_score_kernel, hb=hb, r=r, n_classes=k, eps=eps),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, k_pad, c), lambda bb, ii: (bb, 0, 0)),
            pl.BlockSpec(blk, lambda bb, ii: (bb, jnp.maximum(ii - 1, 0), 0, 0)),
            pl.BlockSpec(blk, lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec(blk, lambda bb, ii, nb=n_blocks: (bb, jnp.minimum(ii + 1, nb - 1), 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r * hb * r, w), lambda bb, ii: (bb, ii, 0)),
        out_shape=jax.ShapeDtypeStruct((b, r * h * r, w), jnp.int32),
        scratch_shapes=[pltpu.VMEM((hb + 2, k_pad, w), jnp.float32)],
        interpret=interpret,
    )(tn, v4, v4, v4)
    out = out.reshape(b, r * h, r, w).transpose(0, 1, 3, 2).reshape(b, r * h, r * w)
    return out
