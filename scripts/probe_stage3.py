"""Dissect the swin stage-3 block cost on the real chip (the VPU-vs-MXU
question from STATUS r2 gap #2).  Stage-3 geometry at the bench shape:
C=384, 12 heads, 32x32 grid per image, batch 16 -> padded 35x35 canvas,
25 windows/img, 400 windows of 49 (padded 64) tokens.

    python scripts/probe_stage3.py <case>

cases: block (full SwinBlock attn+MLP), attn (fused_window_block incl.
pad/partition layout), mlp (fused_mlp alone), layout (partition+reverse
only), attn1h (heads=1 — per-head-loop overhead probe), attn_q (int8).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, GRID, C, HEADS, WIN = 16, 32, 384, 12, 7


def main(case):
    import jax
    import jax.numpy as jnp

    from lc2is_tpu.engine.tpu_bench import bench_steps
    from lc2is_tpu.nn.swin import SwinBlock, window_partition, window_reverse
    from lc2is_tpu.ops.fused_mlp import fused_mlp
    from lc2is_tpu.ops.window_attention import fused_window_block, region_labels

    rs = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * 0.05, jnp.bfloat16)

    p = GRID * GRID
    hp = ((GRID + WIN - 1) // WIN) * WIN
    x = f(B, p, C)

    if case == "block":
        blk = SwinBlock(C, HEADS, WIN, shift=0, drop_path=0.0, param_dtype=jnp.float32)
        params = blk.init(jax.random.PRNGKey(0), x, (GRID, GRID))
        fn = lambda xx: blk.apply(params, xx, (GRID, GRID))
    elif case == "mlp":
        lnw, lnb = f(C), f(C)
        w1, b1, w2, b2 = f(4 * C, C), f(4 * C), f(C, 4 * C), f(C)
        fn = lambda xx: fused_mlp(xx, lnw, lnb, w1, b1, w2, b2,
                                  activation="gelu", ln_position="pre")
    elif case == "layout":
        def fn(xx):
            c4 = xx.reshape(B, GRID, GRID, C)
            c4 = jnp.pad(c4, ((0, 0), (0, hp - GRID), (0, hp - GRID), (0, 0)))
            xw = window_partition(c4, WIN)
            y = window_reverse(xw * jnp.bfloat16(1.000001), WIN, hp, hp)
            return y[:, :GRID, :GRID].reshape(B, p, C)
    elif case in ("attn", "attn1h", "attn_q"):
        heads = 1 if case == "attn1h" else HEADS
        lnw, lnb = f(C), f(C)
        wqkv, bqkv = f(3 * C, C), f(3 * C)
        wo, bo = f(C, C), f(C)
        bias = f(heads, 49, 49).astype(jnp.float32)

        def fn(xx):
            c4 = xx.reshape(B, GRID, GRID, C)
            c4 = jnp.pad(c4, ((0, 0), (0, hp - GRID), (0, hp - GRID), (0, 0)))
            xw = window_partition(c4, WIN)
            yw = fused_window_block(xw, lnw, lnb, wqkv, bqkv, wo, bo, bias,
                                    None, heads, quant=case == "attn_q")
            y = window_reverse(yw, WIN, hp, hp)
            return y[:, :GRID, :GRID].reshape(B, p, C)
    else:
        raise SystemExit(f"unknown case {case}")

    t, _ = bench_steps(jax.jit(fn), x, n=16)
    print(json.dumps(dict(case=case, ms=round(t * 1e3, 3))))




# sweep helper: LC2IS_WINBLOCK_MB budgets for the attn case
# usage: python scripts/probe_stage3.py sweep
def sweep():
    import subprocess

    for mb in (6, 12, 24, 48):
        env = dict(os.environ, LC2IS_WINBLOCK_MB=str(mb))
        r = subprocess.run([sys.executable, os.path.abspath(__file__), "attn"],
                           env=env, capture_output=True, text=True)
        line = (r.stdout.strip().splitlines() or ["?"])[-1]
        print(f"budget {mb} MB: {line}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep()
    else:
        main(sys.argv[1] if len(sys.argv) > 1 else "block")
