"""Dissect the canvas kernel's in-kernel time on the real chip.

    python scripts/probe_canvas.py <stage> <ablate>

stage: 1 (128x128, C=96, 3 heads), 2 (64x64, C=192, 6), 3 (32x32, C=384, 12)
ablate: full | noattn (LN+QKV+proj, attention skipped) | layout
        | ln (LN alone, no transform/attention/proj)
        (transform+inverse only, no matmuls)

Each case runs ONE swin block geometry (shift=3, the expensive offset-window
case) at batch 16 through swin_canvas_block via the LC2IS_CANVAS_ABLATE env
(measurement-only kernel ablation — results are numerically wrong for
anything but "full").
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GEOM = {"1": (128, 96, 3), "2": (64, 192, 6), "3": (32, 384, 12)}
B, WIN = 16, 7


def main(stage, ablate):
    os.environ["LC2IS_CANVAS_ABLATE"] = "" if ablate == "full" else ablate

    import jax
    import jax.numpy as jnp

    from lc2is_tpu.engine.tpu_bench import bench_steps
    from lc2is_tpu.ops.swin_canvas import swin_canvas_block

    grid, c, heads = GEOM[stage]
    rs = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * 0.05, jnp.bfloat16)

    x = f(B, grid, grid, c)
    lw, lb = f(c), f(c)
    wqkv, bqkv = f(3 * c, c), f(3 * c)
    wo, bo = f(c, c), f(c)
    bias = f(heads, WIN * WIN, WIN * WIN).astype(jnp.float32)

    fn = lambda xx: swin_canvas_block(xx, lw, lb, wqkv, bqkv, wo, bo, bias,
                                      heads, WIN, 3)
    t, _ = bench_steps(jax.jit(fn), x, n=16)
    # subtract the per-call tunnel overhead (a trivial chained op) — without
    # this every sub-3ms kernel reads as ~3 ms of relay round-trip
    t0, _ = bench_steps(jax.jit(lambda xx: xx * jnp.bfloat16(1.0000001)),
                        x[:1, :8, :8], n=16)
    t = max(t - t0, 0.0)
    print(json.dumps(dict(stage=stage, ablate=ablate, ms=round(t * 1e3, 3),
                          tunnel_ms=round(t0 * 1e3, 3))))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "1",
         sys.argv[2] if len(sys.argv) > 2 else "full")
