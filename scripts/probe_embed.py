"""Dissect the swin embed/merging chain on the real chip.

The swin_embed profile part (patch embed + 3 patch mergings + LNs, depths
(0,0,0,0)) measures 2.34 ms moving 2.17 GB at the HBM roof — far more bytes
than the logical tensors (~0.4 GB).  This probe times each piece in its own
jit to find the fat intermediate:

    python scripts/probe_embed.py embed|embed_s2d|merge1|merge2|merge3|ln|chain

Measured (v5e, b16, bf16): embed (lax.conv) 0.218 ms; an NCHW-direct
space-to-depth embed variant read 0.899 ms (4× worse — deleted); full chain
(embed + 3 merges + LN) 2.188 ms with strided-slice merging.

embed      SwinPatchEmbed at (16, 3, 512, 512) (default path: lax.conv at C=3)
embed_s2d  same via the space-to-depth matmul (LC2IS_S2D_MINC=0)
mergeN     SwinPatchMerging at stage-N geometry
ln         embed LayerNorm at (16, 16384, 96)
chain      whole hidden_states[:1] pipeline (= the swin_embed profile part)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 16


def main(part):
    if part == "embed_s2d":
        os.environ["LC2IS_S2D_MINC"] = "0"
        part = "embed"

    import jax
    import jax.numpy as jnp

    from lc2is_tpu.engine.tpu_bench import bench_steps
    from lc2is_tpu.nn.layers import LayerNorm
    from lc2is_tpu.nn.swin import SwinModel, SwinPatchEmbed, SwinPatchMerging

    rs = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * 0.05, jnp.bfloat16)

    if part == "embed":
        model = SwinPatchEmbed(embed_dim=96, patch_size=4)
        x = f(B, 3, 512, 512)
        params = model.init(jax.random.PRNGKey(0), x)
        fn = lambda xx: model.apply(params, xx)[0]
    elif part.startswith("merge"):
        grid, c = {"1": (128, 96), "2": (64, 192), "3": (32, 384)}[part[-1]]
        model = SwinPatchMerging(dim=c)
        x = f(B, grid * grid, c)
        params = model.init(jax.random.PRNGKey(0), x, (grid, grid))
        fn = lambda xx: model.apply(params, xx, (grid, grid))
    elif part == "ln":
        model = LayerNorm()
        x = f(B, 16384, 96)
        params = model.init(jax.random.PRNGKey(0), x)
        fn = lambda xx: model.apply(params, xx)
    elif part == "chain":
        model = SwinModel(dtype=jnp.bfloat16, depths=(0, 0, 0, 0))
        x = f(B, 3, 512, 512)
        params = model.init(jax.random.PRNGKey(0), x)
        fn = lambda xx: model.apply(params, xx)[3]
    else:
        raise SystemExit(f"unknown part {part}")

    t, _ = bench_steps(jax.jit(fn), x, n=16)
    t0, _ = bench_steps(jax.jit(lambda xx: xx * jnp.bfloat16(1.0000001)),
                        f(1, 8, 128), n=16)
    t = max(t - t0, 0.0)
    print(json.dumps(dict(part=part, ms=round(t * 1e3, 3),
                          tunnel_ms=round(t0 * 1e3, 3))))


if __name__ == "__main__":
    main(sys.argv[1])
