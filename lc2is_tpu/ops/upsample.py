"""Channels-last integer-factor bilinear upsample as a Pallas kernel.

The decoder pyramids upsample (B, H·W, C) token grids ×2 after every block
(``model/hierarchical.py:148``, ``model/decoder.py:109``).  Measured on v5e
at 64²→128²/512ch/batch16 every XLA formulation runs at ~100 GB/s effective
(NCHW matmul 5.5 ms, channels-last einsum 5.3 ms, phase-interleave 8 ms —
all dominated by materialised transposes/concats).  This kernel streams the
grid once per (batch, row-block) step: the 1-row halo comes from passing the
row-blocked input three times (prev/cur/next block index maps — auto-
pipelined by Mosaic, no manual DMA), W is widened with one small MXU matmul
per row (the exact torch [out,in] bilinear matrix), and the H phases are
VPU blends with static row indexing.  HBM traffic ≈ 3·in + out.

Semantics are identical to ops.resize torch-bilinear (half-pixel, integer
factor r: out r·i+m takes taps (m+0.5)/r − 0.5 from rows i−1/i/i+1, edges
clamped).  Backward = XLA-recompute custom VJP (the op is linear).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phase_weights(r: int):
    """[(use_prev, w_other, w_cur)] per phase m: out r·i+m = w_other·x[i∓1] + w_cur·x[i]."""
    out = []
    for m in range(r):
        off = (m + 0.5) / r - 0.5
        if off < 0:
            out.append((True, -off, 1.0 + off))
        else:
            out.append((False, off, 1.0 - off))
    return out


def _kernel(prv_ref, cur_ref, nxt_ref, wmat_ref, o_ref, wide, *, hb, w, r):
    """Per (batch, row-block) step: widen W with one small MXU matmul per
    row (exact torch taps), then blend H phases on the VPU with static row
    indexing; the 1-row halo comes from the prev/next block inputs."""
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    wmat = wmat_ref[...]

    def widen(row):  # (W, C) -> (rW, C)
        return jax.lax.dot_general(
            wmat, row, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(wide.dtype)

    # wide[0] = row above the block, wide[1..hb] = block rows, wide[hb+1] = below
    for j in range(hb):
        wide[1 + j] = widen(cur_ref[0, j * w : (j + 1) * w])
    wide[0] = widen(prv_ref[0, (hb - 1) * w : hb * w])
    wide[hb + 1] = widen(nxt_ref[0, :w])

    @pl.when(i == 0)  # image edge: row above row 0 is row 0
    def _():
        wide[0] = wide[1]

    @pl.when(i == n_i - 1)
    def _():
        wide[hb + 1] = wide[hb]

    for j in range(hb):
        cur = wide[1 + j].astype(jnp.float32)
        prev = wide[j].astype(jnp.float32)
        nxt = wide[2 + j].astype(jnp.float32)
        for m, (use_prev, w_o, w_c) in enumerate(_phase_weights(r)):
            other = prev if use_prev else nxt
            o_ref[0, (r * j + m) * r * w : (r * j + m + 1) * r * w] = (
                w_o * other + w_c * cur
            ).astype(o_ref.dtype)


def _xla_reference(x, grid_hw, r):
    """Matrix-path reference (differentiable, defines the VJP)."""
    from lc2is_tpu.ops.resize import resize

    b, p, c = x.shape
    h, w = grid_hw
    nchw = jnp.moveaxis(x.reshape(b, h, w, c), -1, 1)
    y = resize(nchw, scale_factor=float(r), method="bilinear")
    return jnp.moveaxis(y, 1, -1).reshape(b, h * r * w * r, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _upsample_vjp(x, grid_hw, r, interpret):
    return _fwd_impl(x, grid_hw, r, interpret)


def _vjp_fwd(x, grid_hw, r, interpret):
    return _upsample_vjp(x, grid_hw, r, interpret), (x,)


def _vjp_bwd(grid_hw, r, interpret, res, g):
    (x,) = res
    if r == 2:
        # Pallas adjoint kernel — the 1-row halo replication only reproduces
        # the clamped-tap adjoint for r=2 (symmetric phase weights); other
        # factors (unused by the models' training paths) fall back to XLA
        return (_adjoint_impl(g, grid_hw, r, interpret),)
    _, vjp = jax.vjp(lambda v: _xla_reference(v, grid_hw, r), x)
    return vjp(g)


_upsample_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def _fwd_impl(x, grid_hw, r, interpret):
    from lc2is_tpu.ops.resize import _torch_resize_matrix_jnp

    b, p, c = x.shape
    h, w = grid_hw

    # hb: rows per block, VMEM-adaptive (3 input blocks double-buffered +
    # wide scratch + double-buffered out must stay well under the 16 MB limit)
    it = jnp.dtype(x.dtype).itemsize
    hb = 8
    while h % hb:
        hb //= 2
    while hb > 1:
        vmem = (3 * 2 * hb * w * c + (hb + 2) * r * w * c
                + 2 * r * r * hb * w * c + r * w * w) * it
        if vmem <= 12 * 1024 * 1024:
            break
        hb //= 2
    if (hb * w) % 8 != 0:
        # Mosaic needs the block row-dim % 8 or == the full array dim; odd
        # grids (e.g. 15² at sliding-eval 0.75 scale) go whole-image-per-step
        # when that fits, else fall back to the XLA matrix path
        vmem_full = (3 * 2 * h * w * c + (h + 2) * r * w * c
                     + 2 * r * r * h * w * c + r * w * w) * it
        if vmem_full <= 12 * 1024 * 1024:
            hb = h
        else:
            return _xla_reference(x, grid_hw, r)
    n_blocks = h // hb

    wm = _torch_resize_matrix_jnp(w, r * w, "bilinear", 1.0 / r, x.dtype)

    blk = (1, hb * w, c)
    out = pl.pallas_call(
        functools.partial(_kernel, hb=hb, w=w, r=r),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(blk, lambda bb, ii: (bb, jnp.maximum(ii - 1, 0), 0)),
            pl.BlockSpec(blk, lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec(blk, lambda bb, ii, nb=n_blocks: (bb, jnp.minimum(ii + 1, nb - 1), 0)),
            pl.BlockSpec((r * w, w), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r * hb * r * w, c), lambda bb, ii: (bb, ii, 0)),
        out_shape=jax.ShapeDtypeStruct((b, r * h * r * w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hb + 2, r * w, c), x.dtype),
        ],
        interpret=interpret,
    )(x, x, x, wm)
    return out


def upsample_tokens(
    x: jnp.ndarray,  # (B, H*W, C)
    grid_hw: Tuple[int, int],
    r: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H·W, C) -> (B, rH·rW, C), torch-bilinear half-pixel semantics."""
    assert r >= 2 and int(r) == r
    return _upsample_vjp(x, tuple(grid_hw), int(r), interpret)


# ---------------------------------------------------------------------------
# Adjoint (backward) kernel — the op is linear, so vjp(g) = adjoint(g).
# Same halo structure as the forward on the OUTPUT-grad side: replicating
# the edge row in the halo reproduces the clamped-tap adjoint exactly
# (out[0] = w·x[clamp(-1)=0] + ... ⇒ dx[0] absorbs the clamped weight).
# ---------------------------------------------------------------------------


def _adj_kernel(prv_ref, cur_ref, nxt_ref, wmt_ref, o_ref, narrow, *, hb, w, r):
    """cur block = r·hb output-grad rows (flat (r·hb·rW, C)); writes the hb
    input-grad rows.  W-adjoint per row by MXU matmul with wmᵀ, H-adjoint by
    static VPU tap blends."""
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    rw = r * w
    wmt = wmt_ref[...]  # (w, r·w)

    def narrow_row(row):  # (rW, C) -> (W, C)
        return jax.lax.dot_general(
            wmt, row, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(narrow.dtype)

    rows = r * hb
    for l in range(rows):
        narrow[1 + l] = narrow_row(cur_ref[0, l * rw : (l + 1) * rw])
    narrow[0] = narrow_row(prv_ref[0, (rows - 1) * rw : rows * rw])
    narrow[rows + 1] = narrow_row(nxt_ref[0, :rw])

    @pl.when(i == 0)
    def _():
        narrow[0] = narrow[1]

    @pl.when(i == n_i - 1)
    def _():
        narrow[rows + 1] = narrow[rows]

    # dx[j] taps: phase m of out row r·j+m contributes w_cur to dx[j] and
    # w_other to dx[j∓1] — i.e. dx[j] collects w_cur from g[r·j+m] plus
    # w_other from g[r·(j+1)+m] (prev-phases) / g[r·(j-1)+m] (next-phases).
    phases = _phase_weights(r)
    for j in range(hb):
        acc = None
        for m, (use_prev, w_o, w_c) in enumerate(phases):
            own = narrow[1 + r * j + m].astype(jnp.float32) * w_c
            acc = own if acc is None else acc + own
            if use_prev:  # that phase's "prev" row is j when emitted from j+1
                src = 1 + r * j + r + m  # g row r·(j+1)+m in slab coords
            else:
                src = 1 + r * j - r + m  # g row r·(j-1)+m
            acc = acc + narrow[src].astype(jnp.float32) * w_o
        o_ref[0, j * w : (j + 1) * w] = acc.astype(o_ref.dtype)


def _adjoint_impl(g, grid_hw, r, interpret):
    from lc2is_tpu.ops.resize import _torch_resize_matrix_jnp

    b, p_out, c = g.shape
    h, w = grid_hw  # INPUT grid (dx shape)
    rw = r * w

    it = jnp.dtype(g.dtype).itemsize
    hb = 8
    while h % hb:
        hb //= 2
    while hb > 1:
        vmem = (3 * 2 * r * hb * rw * c + (r * hb + 2) * w * c + 2 * hb * w * c) * it
        if vmem <= 12 * 1024 * 1024:
            break
        hb //= 2
    if (hb * w) % 8 != 0 or (r * hb * rw) % 8 != 0:
        vmem_full = (3 * 2 * r * h * rw * c + (r * h + 2) * w * c + 2 * h * w * c) * it
        if vmem_full <= 12 * 1024 * 1024:
            hb = h
        else:
            (x_placeholder,) = (jnp.zeros((b, h * w, c), g.dtype),)
            _, vjp = jax.vjp(lambda v: _xla_reference(v, grid_hw, r), x_placeholder)
            return vjp(g)[0]
    n_blocks = h // hb

    wm = _torch_resize_matrix_jnp(w, rw, "bilinear", 1.0 / r, g.dtype)
    wmt = wm.T  # (w, rw) adjoint taps (clamping included)

    gblk = (1, r * hb * rw, c)
    out = pl.pallas_call(
        functools.partial(_adj_kernel, hb=hb, w=w, r=r),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(gblk, lambda bb, ii: (bb, jnp.maximum(ii - 1, 0), 0)),
            pl.BlockSpec(gblk, lambda bb, ii: (bb, ii, 0)),
            pl.BlockSpec(gblk, lambda bb, ii, nb=n_blocks: (bb, jnp.minimum(ii + 1, nb - 1), 0)),
            pl.BlockSpec((w, rw), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb * w, c), lambda bb, ii: (bb, ii, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((r * hb + 2, w, c), g.dtype),
        ],
        interpret=interpret,
    )(g, g, g, wmt)
    return out
