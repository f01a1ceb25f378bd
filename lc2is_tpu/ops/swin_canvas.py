"""Canvas-direct fused Swin window-attention kernel (no-roll, no-partition).

The windowed path (nn/swin.py + ops/window_attention.py) spends more HBM
time on layout than on attention at 512²: pad, roll, window-partition
(reshape+transpose), window-reverse, roll-back, crop — ~6 full-canvas
traversals per block, two of them 7-granular transposes XLA executes far
below bandwidth (measured: swin fwd 17.4 GB HBM, 507 GB/s, 1 TFLOP/s).

This kernel reads the RAW (B, H, W, C) canvas and does everything inside:

- grid (B, n_strips); each step loads one window-row strip directly from the
  canvas via two overlapping row-blocks (the shifted grid's offset is not a
  multiple of the window, so a strip spans two window-aligned blocks);
- the shifted-window roll is replaced by OFFSET WINDOWS: window (i, j) covers
  canvas rows/cols [i·win − o, …) with o = (win − shift) % win.  Under the
  9-region mask this is numerically IDENTICAL to HF's roll + mask: every
  token only attends within its region, and the roll is pure transport (see
  the region-label arithmetic below);
- HF's zero-pad-after-layernorm semantics (transformers SwinLayer.maybe_pad)
  are reproduced by labels computed from iota: tokens at HF-pad positions
  (row ≥ H or col ≥ W, inside the HF-padded canvas) are forced to post-LN
  zero but PARTICIPATE in attention (keys bk, values bv), exactly like HF's
  zero pad rows; positions outside the HF canvas ("void": the offset
  windows' leading fragments and the geometric 7→8 padding) are masked out
  of attention entirely;
- in-VMEM layout: strips (ns, 8, Wc, C) → per-strip transpose → (ns, Wc, 8,
  C) → split/pad cols → (ns·nw, 64, C) token blocks (token order c·8+r —
  the relative-position bias is permuted to match outside the kernel), one
  packed QKV matmul, per-head attention with label masking, out-proj +
  residual, inverse layout, strip write.

HBM traffic per block becomes read 2×canvas + write 1×canvas (+1 crop copy
outside) with zero XLA layout ops.  Matches HF SwinModel semantics
(reference anchor: model/encoder.py:121-131); parity pinned by
tests/test_swin_canvas.py against the windowed XLA reference.

Backward: reconstructs the windowed layout with XLA (pad/roll/partition) and
reuses ops/window_attention's Pallas backward kernel — training cost is
unchanged; the canvas path accelerates the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
PW = 8  # padded window (win=7 → 8): legal f32 sublane merges


def _geom(h: int, w: int, win: int, shift: int):
    o = (win - shift) % win if shift else 0
    hp = ((h + win - 1) // win) * win  # HF padded canvas
    wp = ((w + win - 1) // win) * win
    ns = -(-(h + o) // win)  # strips cover rows [-o, ns·win − o) ⊇ [0, h]
    nw = -(-(w + o) // win)
    return o, hp, wp, ns, nw


@functools.lru_cache(maxsize=8)
def _token_perm(win: int, rowmajor: bool = False) -> np.ndarray:
    """(64,) map from kernel token order (t = c·8 + r column-major, or
    t = r·8 + c row-major) to standard r·win + c; invalid slots (r ≥ win or
    c ≥ win) point at 0 (they are label-masked)."""
    idx = np.zeros(PW * PW, np.int64)
    for c in range(win):
        for r in range(win):
            idx[(r * PW + c) if rowmajor else (c * PW + r)] = r * win + c
    return idx


def permute_bias(bias: jnp.ndarray, win: int, rowmajor: bool = False) -> jnp.ndarray:
    """(H, win², win²) → (H, 64, 64) in kernel token order."""
    idx = jnp.asarray(_token_perm(win, rowmajor))
    return bias[:, idx][:, :, idx].astype(jnp.float32)


def _labels_all(ns, nw, win, o, shift, H, W, Hp, Wp, npi, nwin, ntile, pack,
                rowmajor=False, rolled=False):
    """(ntile, pack·64) region labels (-1 = void), built straight from iota
    at the PACKED shape (no reshapes — Mosaic rejects lane/sublane-merging
    vector reshapes on int32).  Token tt of tile ti is token tt%64 of global
    window g = ti·pack + tt//64; g covers all images (labels repeat with
    period npi = ns·nw); windows g ≥ nwin are pack-padding → void.  Each
    pack slot offsets labels by 16·slot so cross-window pairs inside a tile
    always mismatch (region labels are < 9).  HF-pad tokens (row ≥ H or
    col ≥ W inside the HF Hp×Wp canvas) keep their region label: they
    participate in attention with k/v = bqkv (the qkv of a post-LN-zero
    token — the layout pads zeros and the bias is added after)."""
    T = pack * PW * PW
    tt = jax.lax.broadcasted_iota(jnp.int32, (ntile, T), 1)
    ti = jax.lax.broadcasted_iota(jnp.int32, (ntile, T), 0)
    slot = tt // (PW * PW)
    t = tt - slot * (PW * PW)
    g = ti * pack + slot
    w = g % npi
    i = w // nw
    j = w - i * nw
    if rowmajor:  # t = r·8 + c
        r_in = t // PW
        c_in = t - r_in * PW
    else:  # t = c·8 + r
        c_in = t // PW
        r_in = t - c_in * PW
    row = i * win - o + r_in
    col = j * win - o + c_in
    if rolled:
        # tokens are coordinates of the ROLLED (Hp, Wp) canvas: windows are
        # aligned (o == 0), the only voids are the 7→8 slot pads, and HF's
        # 9-region mask is the plain slice classification on rolled coords
        # (transformers SwinLayer h_slices/w_slices)
        void = (r_in >= win) | (c_in >= win) | (g >= nwin)
        rh = (row >= Hp - win).astype(jnp.int32) + (row >= Hp - shift).astype(jnp.int32)
        rc = (col >= Wp - win).astype(jnp.int32) + (col >= Wp - shift).astype(jnp.int32)
        lab = rh * 3 + rc
        lab = lab + slot * 16
        return jnp.where(void, -1, lab)
    void = ((r_in >= win) | (row < 0) | (row >= Hp)
            | (c_in >= win) | (col < 0) | (col >= Wp) | (g >= nwin))
    if shift:
        rrow = row - shift + jnp.where(row < shift, Hp, 0)
        rcol = col - shift + jnp.where(col < shift, Wp, 0)
        rh = (rrow >= Hp - win).astype(jnp.int32) + (rrow >= Hp - shift).astype(jnp.int32)
        rc = (rcol >= Wp - win).astype(jnp.int32) + (rcol >= Wp - shift).astype(jnp.int32)
        lab = rh * 3 + rc
    else:
        lab = jnp.zeros((ntile, T), jnp.int32)
    lab = lab + slot * 16
    return jnp.where(void, -1, lab)


def _make_layout(ns, nw, win, o, W, wc, rowmajor, w_in=None):
    """In-VMEM canvas ↔ window-token layout maps (exact adjoints of each
    other: transform places every canvas position in exactly one window
    slot, zero-filling pads; inverse reads each slot back and drops pads).

    - transform: (hb_rows, w_in, ch) canvas → (ns·nw, 64, ch) tokens.  Strips
      tile the row range [-o, ns·win − o) CONTIGUOUSLY, so the per-strip
      extraction is one top/left zero pad — no slicing loop.  ``w_in``
      defaults to W; when the caller pre-loads a WIDER block (w_in == wc,
      garbage cols already zeroed — the o == 0 fast path) the column pad
      concat disappears entirely.
    - inverse: tokens → canvas (cropped back to W cols).
    """
    hb_rows = ns * win
    w_in = W if w_in is None else w_in

    def _offset_pad(canvas):
        ch, dtp = canvas.shape[-1], canvas.dtype
        cat = canvas  # (hb_rows, w_in, ch)
        if o:
            cat = jnp.concatenate(
                [jnp.zeros((o, w_in, ch), dtp), cat[: hb_rows - o]], axis=0)
        cols = [cat]
        if o:
            cols.insert(0, jnp.zeros((hb_rows, o, ch), dtp))
        if wc - o - w_in:
            cols.append(jnp.zeros((hb_rows, wc - o - w_in, ch), dtp))
        return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cat

    def transform_cm(canvas):
        # (t = c_in·8 + r_in) token order; the sublane↔major exchange runs
        # per-strip ((8, wc) ↔ (wc, 8) under the ns batch dim) and the
        # strip-major window split lands the (c_in, r_in) dims ALREADY
        # adjacent, so no trailing (ns, nw, 8, 8) major-permute pass is
        # needed.  An earlier formulation (one whole-canvas swapaxes(0,1)
        # plus a moveaxis(2,0) — git: round ≤4) measured equal-or-worse on
        # every r5 A/B leg (whole swin fwd 26.38 vs 26.17 ms, stage-3
        # fwd+bwd 37.71 vs 37.10 ms, stage-1/2 single blocks no worse) and
        # was deleted per win-or-delete.
        ch, dtp = canvas.shape[-1], canvas.dtype
        cat = _offset_pad(canvas)                          # (hb, wc, ch)
        cat = cat.reshape(ns, win, wc, ch)
        cat = jnp.concatenate(
            [cat, jnp.zeros((ns, PW - win, wc, ch), dtp)], axis=1)  # pad rows
        cat = jnp.swapaxes(cat, 1, 2)                      # (ns, wc, 8, ch)
        cat = cat.reshape(ns, nw, win, PW, ch)             # split wc (major)
        cat = jnp.concatenate(
            [cat, jnp.zeros((ns, nw, PW - win, PW, ch), dtp)], axis=2)
        return cat.reshape(ns * nw, PW * PW, ch)           # t = c_in·8 + r_in

    def _unshift(y):
        ch = y.shape[-1]
        if o:
            # undo the offset-window shift: canvas (row, col) lives at strip
            # position (row + o, col + o)
            y = y[:, o:]
            y = jnp.concatenate(
                [y[o:], jnp.zeros((o, y.shape[1], ch), y.dtype)], axis=0)
        return y[:, :W]

    def inverse_cm(toks):
        # exact mirror of transform_cm (drop pads, per-strip swapaxes back)
        ch = toks.shape[-1]
        y = toks.reshape(ns, nw, PW, PW, ch)[:, :, :win]         # (ns, nw, 7, 8, ch)
        y = y.reshape(ns, wc, PW, ch)                            # merge cols (major)
        y = jnp.swapaxes(y, 1, 2)                                # (ns, 8, wc, ch)
        y = y[:, :win].reshape(ns * win, wc, ch)                 # drop row pads
        return _unshift(y)

    # A selection-MATMUL layout (both regroup axes as 0/1-matrix matmuls,
    # exact adjoints) was built and DELETED (win-or-delete): Mosaic rejects
    # the multi-free-dim dot ("infer-vector-layout: unsupported shape cast"
    # on the (hb, W, ch) rhs), and the batched-matmul rewrite that would
    # lower cleanly loses on tile-cycle accounting — the hb=133 contraction
    # is >99% zeros but the MXU pays M·ceil(K/128)·ceil(N/128) cycles
    # regardless: ~0.5-0.7 ms/block at stage-1 geometry vs ~0.4-0.6 for the
    # copy chain it would replace.  All 14 canvas tests passed with it
    # (interpret mode), so the deletion is for performance, not correctness.
    # NOTE: a row-major token order (t = r·8 + c; pads + split reshapes +
    # one major-dim transpose instead of the sublane↔major swapaxes) was
    # built and parity-tested, but Mosaic rejects its win=7 sublane-split
    # reshapes on the real chip — deleted (win-or-delete); `rowmajor` stays
    # in the signatures for the bias/label plumbing.
    assert not rowmajor, "row-major canvas layout removed (no TPU lowering)"
    return transform_cm, inverse_cm


def _canvas_kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref,
                   wo_ref, bo_ref, bias_ref, o_ref,
                   num_heads, scale, eps, win, shift, o, H, W, Hp, Wp,
                   ns, nw, wc, residual=True, rowmajor=False, ablate="",
                   rolled=False, wl=None):
    """``ipg`` images per grid step (x_ref.shape[0]): LN+QKV once over the
    canvases, per-strip window layout in VMEM, attention batched over ALL
    ipg·ns·nw windows — small canvases (stages 3-4) batch several images to
    keep the matmul M-dims MXU-sized; big canvases (stage 1) run one at a
    time for VMEM.

    ``wl`` is the LOADED block width: when o == 0 (unshifted, and rolled)
    the block reads wl == wc cols straight from HBM — cols ≥ W are garbage
    zeroed by the same post-LN mask that handles rows ≥ H, and the layout's
    column-pad concat (a full canvas VMEM copy per block) disappears."""
    hb_rows = ns * win
    ipg = x_ref.shape[0]
    c = x_ref.shape[-1]
    dh = c // num_heads
    wl = W if wl is None else wl
    Xb = x_ref[...]  # (ipg, Hb, wl, C) compute dtype; rows >= H / cols >= W garbage
    # unsqueeze the int32 iotas BEFORE comparing — Mosaic rejects minor-dim
    # inserts on i1 vectors ("Insertion of minor dim … only for 32-bit")
    rr4 = jax.lax.broadcasted_iota(jnp.int32, (hb_rows, wl), 0)[None, :, :, None]
    if wl > W:
        cc4 = jax.lax.broadcasted_iota(jnp.int32, (hb_rows, wl), 1)[None, :, :, None]
        padm = (rr4 >= H) | (cc4 >= W)
    else:
        padm = rr4 >= H

    # ---- whole-canvas LN + HF pad-after-LN zeroing (canvas-global mask) ----
    if Xb.dtype == jnp.bfloat16:
        # lean bf16 LN: stats accumulate in f32 (sums of bf16 values), the
        # normalise/affine runs in bf16 — the f32 canvas (X4) and the f32
        # normalised canvas (hn) are never materialised.  The layout-ablate
        # probe put LN+transform at 0.86 of the 1.18 ms stage-1 block (the
        # matmuls and attention are at floor); halving LN's VPU bytes is the
        # cheap half of that.  Downstream consumers (QKV matmul) are bf16
        # anyway; the extra rounding is below the kernels' bf16 noise
        # (cf. fast-gelu: 4e-4 abs err, full-model mask agreement 1.0).
        xl = Xb.reshape(ipg * hb_rows * wl, c)
        xf = xl.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)
        scl = (jax.lax.rsqrt(var + eps)).astype(jnp.bfloat16)
        hn = (xl - mean.astype(jnp.bfloat16)) * scl
        hn = (hn * lnw_ref[...].astype(jnp.bfloat16)
              + lnb_ref[...].astype(jnp.bfloat16))
        h4 = hn.reshape(ipg, hb_rows, wl, c)
        h4 = jnp.where(padm, jnp.bfloat16(0.0), h4)
    else:
        x2 = Xb.astype(jnp.float32).reshape(ipg * hb_rows * wl, c)
        mean = x2.mean(axis=-1, keepdims=True)
        var = ((x2 - mean) ** 2).mean(axis=-1, keepdims=True)
        hn = (x2 - mean) * jax.lax.rsqrt(var + eps)
        hn = hn * lnw_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
        h4 = hn.reshape(ipg, hb_rows, wl, c)
        # where (not multiply): kills NaN from uninitialised out-of-bounds
        # rows/cols.  The unsqueeze happens on the int32 (bool minor-dim
        # inserts are unsupported on TPU); the comparison yields a 3-D i1
        # directly.
        h4 = jnp.where(padm, 0.0, h4)
    # (cols beyond W do not exist in the block; the strip transform pads
    # them with zeros, which is exactly the HF zero-pad value)

    # The QKV matmul runs on the PADDED window tokens, after the layout
    # transform.  A compact-canvas-first variant (QKV before the layout,
    # bias after, M = real tokens — 2.25× fewer MACs on shifted stage-3
    # blocks) was built and measured SLOWER (swin fwd 28.7 → 34.1 ms at
    # 512²/b16): the layout transform then shuffles a 3C-wide qkv canvas,
    # and its VMEM copy bytes outweigh the matmul savings.  What survives
    # from that experiment: the transform moves compute-dtype (bf16) data,
    # not f32, and the out-projection runs compact after the inverse.
    dt = o_ref.dtype
    h4 = h4.astype(dt)

    if ablate == "ln":  # measurement-only: LN alone, no transform/attn/proj
        for i in range(ipg):
            res = (Xb[i, :H, :W].astype(jnp.float32) if residual else 0.0)
            o_ref[i] = (h4[i, :H, :W].astype(jnp.float32) + res).astype(o_ref.dtype)
        return

    if rolled:
        # ROLLED mode (shifted blocks where it shrinks the window grid —
        # e.g. stage-3 512²: 6×6 offset windows → 5×5 aligned): reproduce
        # HF's actual roll in VMEM (2 concats) on the zero-padded (Hp, Wp)
        # canvas, then window with o = 0.  31% fewer window slots through
        # QKV + attention + layout; hb_rows == Hp here, and the wide block
        # load (wl == Wp) already carries the zeroed pad cols.
        if h4.shape[2] < Wp:
            h4 = jnp.concatenate(
                [h4, jnp.zeros((ipg, hb_rows, Wp - h4.shape[2], c), h4.dtype)],
                axis=2)
        h4 = jnp.concatenate([h4[:, shift:], h4[:, :shift]], axis=1)
        h4 = jnp.concatenate([h4[:, :, shift:], h4[:, :, :shift]], axis=2)
        transform, inverse = _make_layout(ns, nw, win, 0, Wp, Wp, rowmajor,
                                          w_in=Wp)
    else:
        transform, inverse = _make_layout(ns, nw, win, o, W, wc, rowmajor,
                                          w_in=wl)

    nwin = ipg * ns * nw
    if ipg == 1:
        hw = transform(h4[0])  # (ns·nw, 64, C) post-LN tokens, compute dtype
    else:
        hw = jnp.concatenate([transform(h4[i]) for i in range(ipg)], axis=0)

    if ablate == "layout":  # measurement-only: transform+inverse, no compute
        attn = hw
    else:
        # packed QKV over all padded window tokens; zero-padded slots get
        # qkv = bqkv — exactly the qkv of HF's post-LN-zero pad tokens
        qkv2 = jax.lax.dot_general(
            hw.reshape(nwin * PW * PW, c), wqkv_ref[...],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        qkv = (qkv2 + bqkv_ref[...].astype(jnp.float32)).astype(dt).reshape(
            nwin, PW * PW, 3 * c)

    if ablate == "noattn":  # measurement-only: LN+QKV+proj, no attention
        attn = qkv[:, :, :c]
    elif ablate != "layout":
        # NOTE a window-PAIR packing variant (2 windows per attention tile,
        # full 128-wide MXU matmuls, block-diag bias, iota-packed labels)
        # was built and measured a LOSS twice on v5e 512²/b16 (stage 1-2:
        # 10.9 → 12.9 ms; full swin 28.1 → 29.3): the attention is not
        # dispatch-bound, so the 2× logits FLOPs + 2× softmax VPU work cost
        # more than the fuller MXU tiles saved — deleted (win-or-delete).
        lab = _labels_all(ns, nw, win, 0 if rolled else o, shift, H, W, Hp, Wp,
                          ns * nw, nwin, nwin, 1, rowmajor=rowmajor,
                          rolled=rolled)

        # ---- batched window attention, HEAD-PAIR packed matmuls ----
        # (see ops/window_attention.pair_attn_fwd — halves the MXU pass
        # count vs the per-head loop with zero extra exp/softmax work; the
        # only overhead is the lane-masked Kbd/Vbd builds)
        from lc2is_tpu.ops.window_attention import (pair_attn_fwd,
                                                    pair_fwd_enabled,
                                                    pair_masks)

        use_pairs = pair_fwd_enabled(num_heads)
        masked2 = None
        outs = []
        hd = 0
        if use_pairs:
            lab2 = jnp.concatenate([lab, lab], axis=-1)
            masked2 = ((lab[:, :, None] != lab2[:, None, :])
                       | (lab2[:, None, :] == -1))
            m0, m1, l0 = pair_masks(PW * PW, dh, dt)
        while use_pairs and hd + 1 < num_heads:
            qg = qkv[:, :, hd * dh:(hd + 2) * dh]
            kg = qkv[:, :, c + hd * dh: c + (hd + 2) * dh]
            vg = qkv[:, :, 2 * c + hd * dh: 2 * c + (hd + 2) * dh]
            bias2 = jnp.concatenate([bias_ref[hd], bias_ref[hd + 1]], axis=-1)
            outs.append(pair_attn_fwd(qg, kg, vg, bias2, masked2, scale,
                                      m0, m1, l0, o_ref.dtype))
            hd += 2
        masked = (masked2[:, :, :PW * PW] if masked2 is not None else
                  (lab[:, :, None] != lab[:, None, :])
                  | (lab[:, None, :] == -1))
        while hd < num_heads:  # tail: odd head count, or pairs disabled
            qh = qkv[:, :, hd * dh:(hd + 1) * dh]
            kh = qkv[:, :, c + hd * dh: c + (hd + 1) * dh]
            vh = qkv[:, :, 2 * c + hd * dh: 2 * c + (hd + 1) * dh]
            logits = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)
            if scale != 1.0:
                logits = logits * scale
            logits = logits + bias_ref[hd][None]
            logits = jnp.where(masked, NEG, logits)
            e = jnp.exp(logits - 30.0)
            r = 1.0 / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30)
            pv = jax.lax.dot_general(
                e.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            outs.append((pv * r).astype(o_ref.dtype))
            hd += 1
        attn = jnp.concatenate(outs, axis=-1)
    # attn: (ipg·ns·nw, 64, C)

    # ---- inverse layout per image, THEN out-proj on the compact canvas ----
    # The inverse is a pure token permutation/selection, so it commutes with
    # the per-token projection — proj M drops from nwin·64 padded slots to
    # ipg·Hb·W (the zero rows it re-introduces land at rows ≥ H, which the
    # caller crops, so the missing +bo there is invisible).
    npi = ns * nw  # windows per image
    comp = (inverse(attn) if ipg == 1 else jnp.concatenate(
        [inverse(attn[i * npi:(i + 1) * npi]) for i in range(ipg)], axis=0))
    if rolled:
        # unroll (+shift both axes) back to canvas coords, crop the Wp pad;
        # comp is (ipg, Hp, Wp, c) here (hb_rows == Hp)
        comp = comp.reshape(ipg, hb_rows, Wp, c)
        comp = jnp.concatenate([comp[:, -shift:], comp[:, :-shift]], axis=1)
        comp = jnp.concatenate([comp[:, :, -shift:], comp[:, :, :-shift]],
                               axis=2)[:, :, :W]
    pw = W
    if ablate == "layout":
        proj = comp.astype(jnp.float32).reshape(ipg, hb_rows, pw, c)
    else:
        proj = jax.lax.dot_general(
            comp.reshape(ipg * hb_rows * pw, c), wo_ref[...],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        proj = (proj + bo_ref[...].astype(jnp.float32)).reshape(
            ipg, hb_rows, pw, c)
    # o_ref covers exactly the H real rows — a (b, hb_rows, ·) output would
    # force the caller into an out[:, :h] slice COPY of every canvas (~0.75
    # GB/step across the 22 blocks at 512²/b16)
    for i in range(ipg):
        out = proj[i, :H] + (Xb[i, :H, :W].astype(jnp.float32)
                             if residual else 0.0)
        o_ref[i] = out.astype(o_ref.dtype)


def _canvas_fwd_impl(x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias, num_heads,
                     win, shift, eps, interpret, residual=True):
    b, h, w, c = x.shape
    o, hp, wp, ns, nw = _geom(h, w, win, shift)
    wc = nw * win
    dh = c // num_heads
    wdt = x.dtype
    # fold 1/√dh into the q projection (weights AND bias): kills one
    # (nW, 64, 64) f32 multiply per head per image in the kernel
    scl = jnp.asarray(1.0 / np.sqrt(dh), jnp.float32)
    wqkv = jnp.concatenate([wqkv[:c].astype(jnp.float32) * scl,
                            wqkv[c:].astype(jnp.float32)]).astype(wqkv.dtype)
    bqkv = jnp.concatenate([bqkv[:c].astype(jnp.float32) * scl,
                            bqkv[c:].astype(jnp.float32)]).astype(bqkv.dtype)
    scale = 1.0

    import os as _os

    rowmajor = False  # the row-major layout experiment had no TPU lowering
    bias_p = permute_bias(bias, win, rowmajor)
    # measurement-only kernel ablation ("layout" | "noattn"): wrong results,
    # used by scripts/probe_canvas.py to attribute in-kernel time
    ablate = _os.environ.get("LC2IS_CANVAS_ABLATE", "")

    # ROLLED forward for shifted blocks where HF's aligned window grid is
    # strictly smaller than the offset-window grid (stage-3 512²: 25 vs 36
    # windows — offset windows inflate QKV/attention M-rows by the leading
    # void fragments).  Forward-only: the VJP recomputes its own forward.
    # Default ON: round-4 component A/B measured swin fwd 26.3 → 24.7 ms at
    # 512²/b16 (scripts/r4b_measure.sh legs 1-2) and the round-5 END-TO-END
    # bench.py A/B (ADVICE r4) confirmed it: ROLL=1 315.2 vs ROLL=0 313.4
    # device-est img/s in the same healthy-tunnel window (the r4 297.3
    # headline reading was degraded-tunnel noise, not a rolled-mode cost).
    # LC2IS_CANVAS_ROLL=0 restores offset windows.
    rolled = (shift > 0
              and (hp // win) * (wp // win) < ns * nw
              and _os.environ.get("LC2IS_CANVAS_ROLL", "1") == "1")
    if rolled:
        ns, nw, wc, o = hp // win, wp // win, wp, 0

    # o == 0 (unshifted, and rolled): load the block WIDER than the real
    # canvas — cols ≥ w are out-of-bounds garbage that the kernel's post-LN
    # pad mask zeroes, and the layout's column-pad concat (one full canvas
    # VMEM copy per block) disappears.  Mosaic only accepts block widths
    # (dim -2) divisible by 8 or equal to the array width, so the wide load
    # is gated on that; wc = nw·win is rarely 8-divisible at the production
    # geometries, where the concat path remains.
    wl = wc if (o == 0 and (wc == w or wc % 8 == 0)) else w

    kw = dict(num_heads=num_heads, scale=scale, eps=eps, win=win,
              shift=shift, o=o, H=h, W=w, Hp=hp, Wp=wp, ns=ns, nw=nw, wc=wc,
              residual=residual, rowmajor=rowmajor, ablate=ablate,
              rolled=rolled, wl=wl)
    const2 = lambda bb: (0, 0)
    hb_rows = ns * win

    # images per grid step: small canvases (stages 3-4) batch several images
    # so the QKV/attention matmul M-dims stay MXU-sized; the budget bounds
    # the kernel's ~10 f32 canvas-sized intermediates.  Must divide b.
    # Default 24 MB measured best on v5e 512²/b16 in a same-window sweep
    # (swin fwd 24.56 / 25.88 / 25.41 ms at 24/48/96; stage-3 fwd+bwd
    # 36.57 vs 37.83 at 24 vs 48) — the smaller working set double-buffers
    # better than the fatter matmul M-dim pays.
    budget = int(_os.environ.get("LC2IS_CANVAS_IPG_MB", "24")) * 1024 * 1024
    per_img = 10 * hb_rows * max(wc, w) * c * 4
    ipg = max(1, min(b, budget // max(per_img, 1)))
    while b % ipg:
        ipg -= 1

    in_specs = [
        pl.BlockSpec((ipg, hb_rows, wl, c), lambda bb: (bb, 0, 0, 0)),
        pl.BlockSpec((1, c), const2),
        pl.BlockSpec((1, c), const2),
        pl.BlockSpec((3 * c, c), const2),
        pl.BlockSpec((1, 3 * c), const2),
        pl.BlockSpec((c, c), const2),
        pl.BlockSpec((1, c), const2),
        pl.BlockSpec((num_heads, PW * PW, PW * PW), lambda bb: (0, 0, 0)),
    ]
    args = [x, ln_w.reshape(1, c).astype(wdt), ln_b.reshape(1, c).astype(wdt),
            wqkv.astype(wdt), bqkv.reshape(1, 3 * c).astype(wdt),
            wo.astype(wdt), bo.reshape(1, c).astype(wdt), bias_p]

    return pl.pallas_call(
        functools.partial(_canvas_kernel, **kw),
        grid=(b // ipg,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ipg, h, w, c), lambda bb: (bb, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), wdt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _canvas_bwd_kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref,
                       wo_ref, bias_ref, g_ref,
                       dx_ref, dlnw_ref, dlnb_ref, dwqkv_ref, dbqkv_ref,
                       dwo_ref, dbo_ref, dbias_ref,
                       num_heads, scale, eps, win, shift, o, H, W, Hp, Wp,
                       ns, nw, wc, residual=True, rowmajor=False,
                       rolled=False, wl=None):
    """Canvas-direct backward: flash-style in-VMEM forward recompute + the
    full backward chain, reading the raw (ipg, Hb, W, C) canvas and upstream
    gradient — no XLA pad/roll/partition/reverse on either side.  The layout
    maps are exact adjoints of each other (transform places every canvas
    position in exactly one window slot; inverse drops the pads), so
    d(inverse) = transform and d(transform) = inverse.  Weight/bias grads
    accumulate across grid steps in f32 (init at step 0).  Unlike the fwd
    kernel, ``scale`` is applied explicitly (weights arrive UNfolded so the
    emitted dwqkv/dbqkv match the caller's parameters directly)."""
    from lc2is_tpu.ops.window_attention import _ln_bwd

    i = pl.program_id(0)
    hb_rows = ns * win
    ipg = x_ref.shape[0]
    c = x_ref.shape[-1]
    dh = c // num_heads
    wl = W if wl is None else wl  # loaded x width (== wc on the o == 0 path)
    rows = ipg * hb_rows * W      # grad-side row count (g stays at width W)
    rows_l = ipg * hb_rows * wl   # x-side row count

    @pl.when(i == 0)
    def _():
        dlnw_ref[...] = jnp.zeros_like(dlnw_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    if rolled:
        # ROLLED geometry (see _canvas_kernel): windows are o=0-aligned on
        # the rolled (Hp, Wp) canvas.  roll_in = adjoint of (unroll + crop);
        # unroll = adjoint of (pad + roll).  hb_rows == Hp here.
        transform, inverse = _make_layout(ns, nw, win, 0, Wp, Wp, rowmajor)

        def roll_in(t4):  # (ipg, Hp, W, ·) → rolled (ipg, Hp, Wp, ·)
            if Wp > W:
                t4 = jnp.concatenate(
                    [t4, jnp.zeros(t4.shape[:2] + (Wp - W, t4.shape[-1]),
                                   t4.dtype)], axis=2)
            t4 = jnp.concatenate([t4[:, shift:], t4[:, :shift]], axis=1)
            return jnp.concatenate([t4[:, :, shift:], t4[:, :, :shift]], axis=2)

        def unroll(t4):  # rolled (ipg, Hp, Wp, ·) → (ipg, Hp, W, ·)
            t4 = jnp.concatenate([t4[:, -shift:], t4[:, :-shift]], axis=1)
            return jnp.concatenate([t4[:, :, -shift:], t4[:, :, :-shift]],
                                   axis=2)[:, :, :W]

        transform_x = transform_g = transform
        inverse_W = inverse_l = inverse
    else:
        # two input widths share one window-token layout: the x side loads
        # wl (== wc on the o == 0 path — no column-pad concat), the grad
        # side stays at the public width W
        transform_g, inverse_W = _make_layout(ns, nw, win, o, W, wc, rowmajor)
        if wl > W:
            transform_x, inverse_l = _make_layout(ns, nw, win, o, wl, wc,
                                                  rowmajor, w_in=wl)
        else:
            transform_x, inverse_l = transform_g, inverse_W
    dt = dx_ref.dtype

    # ---- forward recompute: LN → window tokens → qkv ----
    X4 = x_ref[...].astype(jnp.float32)
    # unsqueeze the int32 iotas BEFORE comparing (Mosaic: no i1 minor-dim
    # inserts)
    rr4 = jax.lax.broadcasted_iota(jnp.int32, (hb_rows, wl), 0)[None, :, :, None]
    if wl > W:
        cc4 = jax.lax.broadcasted_iota(jnp.int32, (hb_rows, wl), 1)[None, :, :, None]
        padm = (rr4 >= H) | (cc4 >= W)
    else:
        padm = rr4 >= H
    # rows ≥ H / cols ≥ W of the block are uninitialised garbage; zero them
    # BEFORE the LN stats — the backward sums dw_rows = dy·x̂ over every row,
    # and 0·NaN from a garbage row would poison the whole weight-grad sum
    X4 = jnp.where(padm, 0.0, X4)
    x2 = X4.reshape(rows_l, c)
    lnw = lnw_ref[...].astype(jnp.float32)
    lnb = lnb_ref[...].astype(jnp.float32)
    mean = x2.mean(axis=-1, keepdims=True)
    var = ((x2 - mean) ** 2).mean(axis=-1, keepdims=True)
    hn = (x2 - mean) * jax.lax.rsqrt(var + eps) * lnw + lnb
    h4 = hn.reshape(ipg, hb_rows, wl, c)
    h4 = jnp.where(padm, 0.0, h4).astype(dt)

    nwin = ipg * ns * nw
    npi = ns * nw
    h4w = roll_in(h4) if rolled else h4
    if ipg == 1:
        hw = transform_x(h4w[0])
    else:
        hw = jnp.concatenate([transform_x(h4w[i_]) for i_ in range(ipg)],
                             axis=0)
    hw2 = hw.reshape(nwin * PW * PW, c)
    qkv2 = jax.lax.dot_general(hw2, wqkv_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    qkv = (qkv2 + bqkv_ref[...].astype(jnp.float32)).astype(dt).reshape(
        nwin, PW * PW, 3 * c)
    lab = _labels_all(ns, nw, win, 0 if rolled else o, shift, H, W, Hp, Wp,
                      npi, nwin, nwin, 1, rowmajor=rowmajor, rolled=rolled)
    masked = (lab[:, :, None] != lab[:, None, :]) | (lab[:, None, :] == -1)

    # ---- out-proj backward (compact): proj = comp@Woᵀ + bo ----
    # g is loaded at strip height (ipg, hb_rows, W, C) — rows ≥ H are
    # out-of-bounds garbage zeroed here (the crop's adjoint), replacing the
    # former full-canvas pad concat
    rrW = jax.lax.broadcasted_iota(jnp.int32, (hb_rows, W), 0)
    g4 = g_ref[...].astype(jnp.float32)
    if hb_rows > H:
        g4 = jnp.where(rrW[None, :, :, None] >= H, 0.0, g4)
    gout = g4.reshape(rows, c)
    dcomp2 = jax.lax.dot_general(gout.astype(dt), wo_ref[...],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dcomp4 = dcomp2.astype(dt).reshape(ipg, hb_rows, W, c)
    if rolled:  # adjoint of (unroll + crop): zero-pad cols, roll −shift
        dcomp4 = roll_in(dcomp4)
    # d(inverse) = transform: scatter the compact grad back to window slots
    if ipg == 1:
        dattn = transform_g(dcomp4[0])
    else:
        dattn = jnp.concatenate([transform_g(dcomp4[i_]) for i_ in range(ipg)],
                                axis=0)

    # ---- attention fwd recompute + backward, HEAD-PAIR packed ----
    # (ops/window_attention.pair_attn_bwd — halves the MXU pass count;
    # per-head/pair grads held in the compute dtype: the concatenated
    # (nwin, 64, 3C) dqkv is the kernel's fattest tensor, and both its
    # consumers (dwqkv matmul, dhw matmul) cast to dt anyway — only the
    # dbqkv row-sum runs on (f32-accumulated) dt values)
    from lc2is_tpu.ops.window_attention import (pair_attn_bwd,
                                                pair_bwd_enabled, pair_masks)

    use_pairs = pair_bwd_enabled(num_heads)
    masked2 = None
    if use_pairs:
        lab2 = jnp.concatenate([lab, lab], axis=-1)
        masked2 = ((lab[:, :, None] != lab2[:, None, :])
                   | (lab2[:, None, :] == -1))
        pm0, pm1, pl0 = pair_masks(PW * PW, dh, dt)
    att_parts, dqs, dks, dvs = [], [], [], []
    hd = 0
    while use_pairs and hd + 1 < num_heads:
        qg = qkv[:, :, hd * dh:(hd + 2) * dh]
        kg = qkv[:, :, c + hd * dh: c + (hd + 2) * dh]
        vg = qkv[:, :, 2 * c + hd * dh: 2 * c + (hd + 2) * dh]
        dah = dattn[:, :, hd * dh:(hd + 2) * dh]
        bias2 = jnp.concatenate([bias_ref[hd], bias_ref[hd + 1]], axis=-1)
        att2, dqg, dkg, dvg, dbias2 = pair_attn_bwd(
            qg, kg, vg, dah, bias2, masked2, scale, pm0, pm1, pl0, dt)
        att_parts.append(att2)
        dbias_ref[hd] += dbias2[:, :PW * PW].astype(dbias_ref.dtype)
        dbias_ref[hd + 1] += dbias2[:, PW * PW:].astype(dbias_ref.dtype)
        dqs.append(dqg.astype(dt))
        dks.append(dkg.astype(dt))
        dvs.append(dvg.astype(dt))
        hd += 2
    while hd < num_heads:  # tail: odd head count, or pairs disabled
        qh = qkv[:, :, hd * dh:(hd + 1) * dh]
        kh = qkv[:, :, c + hd * dh: c + (hd + 1) * dh]
        vh = qkv[:, :, 2 * c + hd * dh: 2 * c + (hd + 1) * dh]
        logits = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
        logits = logits * scale + bias_ref[hd][None]
        logits = jnp.where(masked, NEG, logits)
        e = jnp.exp(logits - 30.0)
        probs = e * (1.0 / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30))
        pb = probs.astype(dt)
        att_parts.append(jax.lax.dot_general(
            pb, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))

        dah = dattn[:, :, hd * dh:(hd + 1) * dh]
        dprobs = jax.lax.dot_general(dah, vh, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
        dvh = jax.lax.dot_general(pb, dah, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        dlog = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
        dbias_ref[hd] += jnp.sum(dlog, axis=0).astype(dbias_ref.dtype)
        dlogb = (dlog * scale).astype(dt)
        dqs.append(jax.lax.dot_general(
            dlogb, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))
        dks.append(jax.lax.dot_general(
            dlogb, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt))
        dvs.append(dvh.astype(dt))
        hd += 1

    # dWo += goutᵀ @ comp (comp = inverse(attn), recomputed); dbo += Σ gout
    attn = jnp.concatenate(att_parts, axis=-1)
    comp = (inverse_W(attn) if ipg == 1 else jnp.concatenate(
        [inverse_W(attn[i_ * npi:(i_ + 1) * npi]) for i_ in range(ipg)],
        axis=0))
    if rolled:  # proj consumed the UNROLLED, col-cropped canvas
        comp = unroll(comp.reshape(ipg, hb_rows, Wp, c))
    dwo_ref[...] += jax.lax.dot_general(
        gout.astype(dt), comp.reshape(rows, c), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwo_ref.dtype)
    dbo_ref[...] += jnp.sum(gout, axis=0, keepdims=True).astype(dbo_ref.dtype)

    # ---- qkv backward ----
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (nwin, 64, 3C) f32
    dqkv2b = dqkv.reshape(nwin * PW * PW, 3 * c)  # compute dtype
    dbqkv_ref[...] += jnp.sum(
        dqkv2b.astype(jnp.float32), axis=0, keepdims=True
    ).astype(dbqkv_ref.dtype)
    dwqkv_ref[...] += jax.lax.dot_general(
        dqkv2b, hw2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwqkv_ref.dtype)
    dhw = jax.lax.dot_general(dqkv2b, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dhw = dhw.astype(dt).reshape(nwin, PW * PW, c)
    # d(transform) = inverse: gather window-slot grads back to the canvas
    # (at the x side's loaded width wl — the extra cols are about to be
    # zeroed by the pad-mask adjoint, so no crop copy is spent on them)
    dh4 = (inverse_l(dhw) if ipg == 1 else jnp.concatenate(
        [inverse_l(dhw[i_ * npi:(i_ + 1) * npi]) for i_ in range(ipg)],
        axis=0))
    if rolled:  # adjoint of (pad cols + roll −shift) = unroll (+shift, crop)
        dh4 = unroll(dh4.reshape(ipg, hb_rows, Wp, c))
    dhf = dh4.astype(jnp.float32).reshape(ipg, hb_rows, wl, c)
    # adjoint of the post-LN zeroing at HF-pad rows/cols
    dhf = jnp.where(padm, 0.0, dhf).reshape(rows_l, c)

    dx_ln, dw_rows, db_rows = _ln_bwd(dhf, x2, lnw, eps)
    dlnw_ref[...] += jnp.sum(dw_rows, axis=0, keepdims=True).astype(dlnw_ref.dtype)
    dlnb_ref[...] += jnp.sum(db_rows, axis=0, keepdims=True).astype(dlnb_ref.dtype)
    dx4 = dx_ln.reshape(ipg, hb_rows, wl, c)[:, :H, :W]
    if residual:
        dx4 = dx4 + g4[:, :H]
    # dx_ref covers exactly the H real rows (no caller-side crop copy)
    dx_ref[...] = dx4.astype(dx_ref.dtype)


def _canvas_bwd_pallas(x, ln_w, ln_b, wqkv, bqkv, wo, bias, g, num_heads,
                       win, shift, eps, interpret, residual, rowmajor):
    """pallas_call driver for _canvas_bwd_kernel.  ``g`` and ``dx`` stay at
    the PUBLIC (B, H, W, C) shape — the crop's adjoint (zero rows ≥ H) is a
    VMEM concat inside the kernel, not a host-side pad/slice copy.  Returns
    grads for (x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias)."""
    b, h, w, c = x.shape
    o, hp, wp, ns, nw = _geom(h, w, win, shift)
    wc = nw * win
    wdt = x.dtype
    dh = c // num_heads

    bias_p = permute_bias(bias, win, rowmajor)

    import os as _os

    # rolled geometry: same gate as the forward (see _canvas_fwd_impl)
    rolled = (shift > 0
              and (hp // win) * (wp // win) < ns * nw
              and _os.environ.get("LC2IS_CANVAS_ROLL", "1") == "1")
    if rolled:
        ns, nw, wc, o = hp // win, wp // win, wp, 0
    hb_rows = ns * win

    # the backward holds ~2× the forward's intermediates (grads mirror
    # activations): half the images per grid step.  Default 24 MB: see the
    # forward's same-window sweep note (stage-3 fwd+bwd 36.57 vs 37.83 ms
    # at 24 vs 48 on v5e b8)
    budget = int(_os.environ.get("LC2IS_CANVAS_IPG_MB", "24")) * 1024 * 1024
    per_img = 14 * hb_rows * max(wc, w) * c * 4
    ipg = max(1, min(b, budget // max(per_img, 1)))
    while b % ipg:
        ipg -= 1

    # x loads wide on the o == 0 non-rolled path (cols ≥ w garbage, zeroed
    # with the rows ≥ h mask — kills the column-pad concat); rolled keeps
    # wl == w because the LN runs pre-roll at the public width there.
    # Gated on Mosaic's block-width rule (dim -2 divisible by 8 or == array
    # width) — see _canvas_fwd_impl.  g loads at strip HEIGHT (rows ≥ h
    # garbage → masked; only dim -3 changes, always legal) — kills the
    # row-pad concat on the grad side.
    wl = wc if (o == 0 and not rolled and (wc == w or wc % 8 == 0)) else w
    kw = dict(num_heads=num_heads, scale=1.0 / np.sqrt(dh), eps=eps, win=win,
              shift=shift, o=o, H=h, W=w, Hp=hp, Wp=wp, ns=ns, nw=nw, wc=wc,
              residual=residual, rowmajor=rowmajor, rolled=rolled, wl=wl)
    const2 = lambda bb: (0, 0)
    strip_spec = pl.BlockSpec((ipg, hb_rows, w, c), lambda bb: (bb, 0, 0, 0))
    exact_spec = pl.BlockSpec((ipg, h, w, c), lambda bb: (bb, 0, 0, 0))
    in_specs = [
        pl.BlockSpec((ipg, hb_rows, wl, c), lambda bb: (bb, 0, 0, 0)),
        pl.BlockSpec((1, c), const2),
        pl.BlockSpec((1, c), const2),
        pl.BlockSpec((3 * c, c), const2),
        pl.BlockSpec((1, 3 * c), const2),
        pl.BlockSpec((c, c), const2),
        pl.BlockSpec((num_heads, PW * PW, PW * PW), lambda bb: (0, 0, 0)),
        strip_spec,
    ]
    out_specs = [
        exact_spec,
        pl.BlockSpec((1, c), const2),
        pl.BlockSpec((1, c), const2),
        pl.BlockSpec((3 * c, c), const2),
        pl.BlockSpec((1, 3 * c), const2),
        pl.BlockSpec((c, c), const2),
        pl.BlockSpec((1, c), const2),
        pl.BlockSpec((num_heads, PW * PW, PW * PW), lambda bb: (0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, w, c), wdt),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((3 * c, c), jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
        jax.ShapeDtypeStruct((c, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((num_heads, PW * PW, PW * PW), jnp.float32),
    ]
    args = [x, ln_w.reshape(1, c).astype(wdt), ln_b.reshape(1, c).astype(wdt),
            wqkv.astype(wdt), bqkv.reshape(1, 3 * c).astype(wdt),
            wo.astype(wdt), bias_p, g.astype(wdt)]
    outs = pl.pallas_call(
        functools.partial(_canvas_bwd_kernel, **kw),
        grid=(b // ipg,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    dx, dlnw, dlnb, dwqkv, dbqkv, dwo, dbo, dbias_p = outs

    # unpermute dbias from kernel token order back to standard r·win + c
    idx = jnp.asarray(_token_perm(win, rowmajor))  # kernel t → standard rc
    std = jnp.zeros((num_heads, win * win, win * win), jnp.float32)
    std = std.at[:, idx[:, None], idx[None, :]].add(dbias_p)
    # slot 0 also receives every padded slot's (zero) grad via idx=0 — the
    # adds are zero, so the scatter-add is exact
    return (dx, dlnw.reshape(-1), dlnb.reshape(-1), dwqkv,
            dbqkv.reshape(-1), dwo, dbo.reshape(-1), std)


def _xla_canvas_reference(x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias, num_heads,
                          win, shift, eps):
    """HF-semantics reference through the windowed path (defines the VJP)."""
    from lc2is_tpu.nn.swin import window_partition, window_reverse
    from lc2is_tpu.ops.window_attention import (_xla_block_reference,
                                                pad_labels, region_labels)

    b, h, w, c = x.shape
    _, hp, wp, _, _ = _geom(h, w, win, shift)
    xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    if shift:
        xp = jnp.roll(xp, (-shift, -shift), axis=(1, 2))
    xw = window_partition(xp, win)
    nW = (hp // win) * (wp // win)
    regions = region_labels(b, hp, wp, win, shift)
    pads = pad_labels(b, h, w, hp, wp, win, shift)
    yw = _xla_block_reference(xw, ln_w, ln_b, wqkv, bqkv, wo, bo, regions,
                              bias, num_heads, eps, True, pad=pads)
    y = window_reverse(yw, win, hp, wp)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    return y[:, :h, :w]


def _pallas_windowed_reference(x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias,
                               num_heads, win, shift, eps, interpret,
                               residual=True):
    """Same HF semantics as ``_xla_canvas_reference`` but through
    ``fused_window_block`` — whose custom VJP is a Pallas in-VMEM backward.
    Differentiating THIS in ``_canvas_bwd`` makes the canvas block's training
    cost: windowed layout (XLA pad/roll/partition, linear ops) + one Pallas
    forward recompute + one Pallas backward, instead of a full unfused XLA
    forward+backward (measured: the XLA-recompute route erased the canvas
    forward's win in bench_train)."""
    from lc2is_tpu.nn.swin import window_partition, window_reverse
    from lc2is_tpu.ops.window_attention import (fused_window_block,
                                                pad_labels, region_labels)

    b, h, w, c = x.shape
    _, hp, wp, _, _ = _geom(h, w, win, shift)
    xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    if shift:
        xp = jnp.roll(xp, (-shift, -shift), axis=(1, 2))
    xw = window_partition(xp, win)
    regions = region_labels(b, hp, wp, win, shift) if shift else None
    pads = pad_labels(b, h, w, hp, wp, win, shift)
    yw = fused_window_block(xw, ln_w, ln_b, wqkv, bqkv, wo, bo, bias, regions,
                            num_heads, eps=eps, residual=residual,
                            interpret=interpret, pad_mask=pads)
    y = window_reverse(yw, win, hp, wp)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    return y[:, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _canvas_vjp(x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias,
                num_heads, win, shift, eps, interpret, residual=True):
    return _canvas_fwd_impl(x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias,
                            num_heads, win, shift, eps, interpret,
                            residual=residual)


def _canvas_fwd(x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias,
                num_heads, win, shift, eps, interpret, residual=True):
    out = _canvas_vjp(x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias,
                      num_heads, win, shift, eps, interpret, residual)
    return out, (x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias)


def _canvas_bwd(num_heads, win, shift, eps, interpret, residual, res, g):
    """Default: the canvas-direct Pallas backward (_canvas_bwd_kernel) —
    in-VMEM forward recompute + full backward chain straight on the raw
    canvas, no XLA pad/roll/partition/reverse on either side.
    LC2IS_CANVAS_BWD=windowed falls back to the windowed-layout
    reconstruction + the fused window block's Pallas backward."""
    import os as _os

    x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias = res
    if _os.environ.get("LC2IS_CANVAS_BWD", "pallas") == "pallas":
        rowmajor = False
        dx, dlnw, dlnb, dwqkv, dbqkv, dwo, dbo, dbias = _canvas_bwd_pallas(
            x, ln_w, ln_b, wqkv, bqkv, wo, bias, g, num_heads, win, shift,
            eps, interpret, residual, rowmajor)
        return (dx.astype(x.dtype), dlnw.astype(ln_w.dtype),
                dlnb.astype(ln_b.dtype), dwqkv.astype(wqkv.dtype),
                dbqkv.astype(bqkv.dtype), dwo.astype(wo.dtype),
                dbo.astype(bo.dtype), dbias.astype(bias.dtype))
    _, vjp = jax.vjp(
        lambda x_, lw, lb, wq, bq, wo_, bo_, bi: _pallas_windowed_reference(
            x_, lw, lb, wq, bq, wo_, bo_, bi, num_heads, win, shift, eps,
            interpret, residual=residual),
        x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias)
    return vjp(g)


_canvas_vjp.defvjp(_canvas_fwd, _canvas_bwd)


def swin_canvas_block(
    x: jnp.ndarray,  # (B, H, W, C) raw canvas (channels-last)
    ln_w: jnp.ndarray, ln_b: jnp.ndarray,
    wqkv: jnp.ndarray, bqkv: jnp.ndarray,  # packed (3C, C) / (3C,)
    wo: jnp.ndarray, bo: jnp.ndarray,
    bias: jnp.ndarray,  # (heads, win², win²) standard token order
    num_heads: int,
    win: int,
    shift: int,
    eps: float = 1e-5,
    interpret: bool = False,
    residual: bool = True,  # False → branch-only output (drop-path training)
) -> jnp.ndarray:
    """out = [x +] proj(window_attn(qkv(LN(x)))) straight on the canvas.

    A merged attn+MLP variant of this kernel was built and measured a LOSS
    twice on v5e 512²/b16 (swin fwd 28.7 → 40.3 ms; headline 293.3 → 255.9
    img/s): the saved canvas HBM traffic doesn't pay for the serialized VPU
    gelu + f32 canvas VMEM pressure — deleted per the win-or-delete rule."""
    return _canvas_vjp(x, ln_w, ln_b, wqkv, bqkv, wo, bo, bias,
                       num_heads, win, shift, eps, interpret, residual)
