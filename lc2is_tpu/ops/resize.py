"""Separable image resize with exact torch / PIL semantics, as MXU matmuls.

Three resize semantics coexist in the reference (SURVEY.md §7 "hard parts"):

1. torch ``F.interpolate`` (no antialias): bicubic a=-0.75 / bilinear with
   half-pixel centers, nearest with ``floor(i*in/out)``.  Sites:
   ``model/model.py:43`` (bicubic x4), ``metrics.py:27,67,89`` (bicubic),
   ``model/hierarchical.py:43,148`` + ``model/final.py:44`` (bilinear x2/x4),
   ``metrics.py:28,90`` (nearest), ``model/encoder.py:40`` (pos-emb bicubic).
2. PIL (via HF CLIPFeatureExtractor, ``evaluate.py:58-60``): bicubic a=-0.5
   WITH antialias (support scaled on downscale, weights normalised), and PIL
   NEAREST (``floor((i+0.5)*scale)``).
3. Label nearest via the HF extractor path (``collator.py:89-91``).

TPU-first design: interpolation along an axis is a dense [out,in] weight
matrix, so a 2-D resize is two matmuls that ride the MXU — no gather/scatter
on the hot path.  Weight matrices are pure functions of the *static* shapes,
computed in numpy at trace time and embedded as constants; everything here is
jit-compatible with static shapes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Weight-matrix construction (numpy, trace-time)
# ---------------------------------------------------------------------------


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=512)
def _torch_resize_matrix(
    in_size: int, out_size: int, method: str, scale: Optional[float] = None
) -> np.ndarray:
    """[out,in] matrix replicating torch F.interpolate (align_corners=False).

    ``scale`` is in/out; torch uses 1/scale_factor when a scale_factor is
    passed, in/out when a size is passed — identical for the integer factors
    the reference uses.
    """
    s = scale if scale is not None else in_size / out_size
    W = np.zeros((out_size, in_size), dtype=np.float64)
    i = np.arange(out_size, dtype=np.float64)
    src = (i + 0.5) * s - 0.5
    if method == "bilinear":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for tap, wt in ((i0, 1.0 - frac), (i0 + 1, frac)):
            idx = np.clip(tap, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), wt)
    elif method == "bicubic":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for k in range(-1, 3):
            wt = _cubic_kernel(k - frac, a=-0.75)
            idx = np.clip(i0 + k, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), wt)
    else:
        raise ValueError(method)
    return W.astype(np.float32)


def _pil_filter(name: str):
    if name == "bicubic":
        return (lambda x: _cubic_kernel(x, a=-0.5)), 2.0
    if name == "bilinear":
        return (lambda x: np.clip(1.0 - np.abs(x), 0.0, None)), 1.0
    if name == "lanczos":
        def _lanczos(x, a=3.0):
            x = np.asarray(x, dtype=np.float64)
            out = np.sinc(x) * np.sinc(x / a)
            return np.where(np.abs(x) < a, out, 0.0)
        return _lanczos, 3.0
    if name == "box":
        return (lambda x: np.where(np.abs(x) <= 0.5, 1.0, 0.0)), 0.5
    raise ValueError(name)


@functools.lru_cache(maxsize=512)
def _pil_resize_matrix(in_size: int, out_size: int, method: str) -> np.ndarray:
    """[out,in] matrix replicating PIL.Image.resize (always antialiased)."""
    filt, support = _pil_filter(method)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    sup = support * filterscale
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - sup + 0.5), 0)
        xmax = min(int(center + sup + 0.5), in_size)
        xs = np.arange(xmin, xmax, dtype=np.float64)
        w = filt((xs + 0.5 - center) / filterscale)
        tot = w.sum()
        if tot != 0:
            w = w / tot
        W[i, xmin:xmax] = w
    return W.astype(np.float32)


# ---------------------------------------------------------------------------
# On-device (traced) weight-matrix construction.  Embedding the matrices as
# literal constants bloats the StableHLO payload by megabytes per distinct
# size (the axon remote-compile relay rejects >~16 MB bodies with HTTP 413),
# so inside jit we build them from iota — a few hundred FLOPs, folded by XLA.
# ---------------------------------------------------------------------------


def _cubic_kernel_jnp(x, a: float):
    ax = jnp.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    return jnp.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        jnp.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )


def _src_coords_exact(in_size: int, out_size: int, scale: Optional[float]):
    """Exact half-pixel source coordinates: src = (i+0.5)*s - 0.5 decomposed
    into an exact integer part and a <1 fraction (int32 arithmetic), so f32
    never loses bits on large indices (worst-case f32 error ~6e-8)."""
    if scale is None or scale == in_size / out_size:
        i = jnp.arange(out_size, dtype=jnp.int32)
        num = (2 * i + 1) * in_size - out_size  # src = num / (2*out)
        den = 2 * out_size
        i0 = jnp.where(num >= 0, num // den, -((-num + den - 1) // den))
        frac = (num - i0 * den).astype(jnp.float32) / den
        return i0.astype(jnp.float32), frac
    # non-rational explicit scale (torch scale_factor path): plain f32
    i = jnp.arange(out_size, dtype=jnp.float32)
    src = (i + 0.5) * scale - 0.5
    i0 = jnp.floor(src)
    return i0, src - i0


def _torch_resize_matrix_jnp(in_size: int, out_size: int, method: str,
                             scale: Optional[float], dtype) -> jnp.ndarray:
    i0, frac = _src_coords_exact(in_size, out_size, scale)
    cols = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    if method == "bilinear":
        taps = ((i0, 1.0 - frac), (i0 + 1.0, frac))
    elif method == "bicubic":
        taps = tuple((i0 + k, _cubic_kernel_jnp(k - frac, -0.75)) for k in range(-1, 3))
    else:
        raise ValueError(method)
    W = jnp.zeros((out_size, in_size), dtype=jnp.float32)
    for tap, wt in taps:
        idx = jnp.clip(tap, 0.0, in_size - 1.0)
        W = W + (cols == idx[:, None]) * wt[:, None]
    return W.astype(dtype)


def _pil_resize_matrix_jnp(in_size: int, out_size: int, method: str, dtype) -> jnp.ndarray:
    if method == "bicubic":
        filt, support = (lambda x: _cubic_kernel_jnp(x, -0.5)), 2.0
    elif method == "bilinear":
        filt, support = (lambda x: jnp.clip(1.0 - jnp.abs(x), 0.0, None)), 1.0
    else:  # lanczos/box stay on the host (np) path
        return jnp.asarray(_pil_resize_matrix(in_size, out_size, method), dtype=dtype)
    scale = in_size / out_size
    fscale = max(scale, 1.0)
    sup = support * fscale
    # exact integer decomposition: center = ((2i+1)*in) / (2*out)
    i = jnp.arange(out_size, dtype=jnp.int32)
    cnum = (2 * i + 1) * in_size
    den = 2 * out_size
    c_int = (cnum // den).astype(jnp.float32)[:, None]
    c_frac = ((cnum % den).astype(jnp.float32) / den)[:, None]
    xs = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    w = filt(((xs - c_int) + (0.5 - c_frac)) / fscale)
    centers = c_int + c_frac
    xmin = jnp.maximum(jnp.trunc(centers - sup + 0.5), 0.0)
    xmax = jnp.minimum(jnp.trunc(centers + sup + 0.5), float(in_size))
    w = jnp.where((xs >= xmin) & (xs < xmax), w, 0.0)
    tot = w.sum(axis=1, keepdims=True)
    w = w / jnp.where(tot == 0, 1.0, tot)
    return w.astype(dtype)


@functools.lru_cache(maxsize=512)
def _nearest_indices(
    in_size: int, out_size: int, semantics: str, scale: Optional[float] = None
) -> np.ndarray:
    s = scale if scale is not None else in_size / out_size
    i = np.arange(out_size, dtype=np.float64)
    if semantics == "torch":  # F.interpolate mode="nearest" (legacy asymmetric)
        idx = np.floor(i * s)
    elif semantics in ("torch-exact", "pil"):  # nearest-exact / PIL NEAREST
        idx = np.floor((i + 0.5) * s)
    else:
        raise ValueError(semantics)
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _hw(size) -> Tuple[int, int]:
    if isinstance(size, int):
        return size, size
    h, w = size
    return int(h), int(w)


def resize(
    x: jnp.ndarray,
    size=None,
    scale_factor: Optional[float] = None,
    method: str = "bilinear",
    semantics: str = "torch",
) -> jnp.ndarray:
    """Resize the last two axes of ``x``.

    method: "bilinear" | "bicubic" | "nearest" | (pil also: "lanczos", "box")
    semantics: "torch" (F.interpolate, no antialias) or "pil" (antialiased).
    Mirrors torch's output-size rule ``out = floor(in * scale_factor)``.
    """
    in_h, in_w = int(x.shape[-2]), int(x.shape[-1])
    if size is not None:
        out_h, out_w = _hw(size)
        scale_h = scale_w = None
    else:
        assert scale_factor is not None
        out_h = int(math.floor(in_h * scale_factor))
        out_w = int(math.floor(in_w * scale_factor))
        scale_h = scale_w = 1.0 / scale_factor

    if (out_h, out_w) == (in_h, in_w) and method != "nearest":
        # torch still applies the kernel at identity scale for bicubic, but
        # the weight matrix reduces to identity taps; fall through for parity.
        pass

    if method == "nearest":
        ih = _nearest_indices(in_h, out_h, semantics, scale_h)
        iw = _nearest_indices(in_w, out_w, semantics, scale_w)
        return x[..., ih, :][..., :, iw]

    orig_dtype = x.dtype
    if orig_dtype == jnp.bfloat16:
        # hot path: keep bf16 end-to-end (MXU-native); exactness paths
        # (metrics, tests) run in fp32/fp64 below
        wdt = jnp.bfloat16
    else:
        wdt = orig_dtype if orig_dtype in (jnp.float32, jnp.float64) else jnp.float32

    if semantics == "torch":
        wh = _torch_resize_matrix_jnp(in_h, out_h, method, scale_h, wdt)
        ww = _torch_resize_matrix_jnp(in_w, out_w, method, scale_w, wdt)
    elif semantics == "pil":
        wh = _pil_resize_matrix_jnp(in_h, out_h, method, wdt)
        ww = _pil_resize_matrix_jnp(in_w, out_w, method, wdt)
    else:
        raise ValueError(semantics)

    if orig_dtype == jnp.bfloat16:
        y = jnp.einsum("oh,...hw->...ow", wh, x, preferred_element_type=jnp.float32)
        y = jnp.einsum("pw,...ow->...op", ww, y.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return y.astype(orig_dtype)
    xc = x.astype(wdt)
    # Two MXU matmuls: rows then columns.
    y = jnp.einsum("oh,...hw->...ow", wh, xc, precision="highest")
    y = jnp.einsum("pw,...ow->...op", ww, y, precision="highest")
    return y.astype(orig_dtype)


def resize_tokens(
    tokens: jnp.ndarray,
    grid_hw: Tuple[int, int],
    size=None,
    scale_factor: Optional[float] = None,
    method: str = "bilinear",
    impl: str = "auto",
) -> jnp.ndarray:
    """Resize a (B, H*W, C) token grid spatially, staying channels-last.

    Replaces the reference's rearrange->interpolate->rearrange dance
    (e.g. ``model/hierarchical.py:42-48``) without materialising NCHW.

    Integer-factor bilinear upsampling (the models' x2/x4 block upsamples)
    uses a channels-last phase-interleave path: measured 131 GB/s for the
    NCHW-matmul route at 64²→128²/512ch vs streaming-rate VPU blends here.
    """
    b, p, c = tokens.shape
    h, w = grid_hw
    assert h * w == p, (h, w, p)
    if (
        method == "bilinear"
        and size is None
        and scale_factor is not None
        and float(scale_factor).is_integer()
        and scale_factor >= 2
    ):
        from lc2is_tpu.ops.dispatch import pallas_enabled, pallas_interpret

        if pallas_enabled(impl):
            from lc2is_tpu.ops.upsample import upsample_tokens

            return upsample_tokens(tokens, (h, w), int(scale_factor),
                                   interpret=pallas_interpret())
    # general sizes: matrix path on the last two axes
    x = tokens.reshape(b, h, w, c)
    x = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
    y = resize(x, size=size, scale_factor=scale_factor, method=method)
    y = jnp.moveaxis(y, 1, -1)
    oh, ow = y.shape[1], y.shape[2]
    return y.reshape(b, oh * ow, c)
