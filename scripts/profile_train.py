"""Per-component fwd+bwd TPU timing at the training operating point (b8,
512², bf16).  One part per process (relay payload limits — CLAUDE.md):

    python scripts/profile_train.py swin|swin_stage12|swin_stage3|swin_stage4|decoder|text|full

Prints one JSON line with grad_step_ms (value_and_grad) and fwd_ms.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("LC2IS_PROFILE_BATCH", "8"))
IMG = 512
ITERS = 6


def main(part):
    import jax
    import jax.numpy as jnp

    from lc2is_tpu.nn.swin import SwinModel
    from lc2is_tpu.nn.decoders import HierarchicalCrossA
    from lc2is_tpu.models import zoo

    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    def t(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32), dtype=bf)

    # LC2IS_PROFILE_DET=0 → deterministic=False + dropout rng, i.e. the path
    # the REAL train step takes (drop-path active → windowed kernels, not the
    # inference-only canvas kernels).  Default (det) matches serving.
    det = os.environ.get("LC2IS_PROFILE_DET", "1") != "0"
    rngs = None if det else {"dropout": __import__("jax").random.PRNGKey(0)}

    if part.startswith("swin"):
        kw = {}
        if part == "swin_stage12":
            kw = dict(depths=(2, 2, 0, 0))
        if part == "swin_stage3":
            # default embed 96 → stage-3 dim 96·2² = 384, the real geometry
            # (embed_dim=384 here would make stage 3 1536-wide, 16× the FLOPs)
            kw = dict(depths=(0, 0, 18, 0))
        if part == "swin_stage4":
            kw = dict(depths=(0, 0, 0, 2), embed_dim=96)
        model = SwinModel(dtype=bf, **kw)
        x = t(BATCH, 3, IMG, IMG)
        fn = lambda p, x: model.apply(p, x, deterministic=det, rngs=rngs)[-1].astype(jnp.float32).sum()
        init, args = model.init, (x,)
    elif part == "decoder":
        # dropout=0.0 matches the v4 zoo default (canonical train config) —
        # the class default 0.1 would force the unfused path under det=False
        model = HierarchicalCrossA(in_dims=(96, 192, 384, 768), depth=(1, 1, 1),
                                   dim=512, dropout=0.0)
        v = [t(BATCH, 16384, 96), t(BATCH, 4096, 192), t(BATCH, 1024, 384), t(BATCH, 256, 768)]
        txt = t(BATCH, 151, 512)
        fn = lambda p, *a: model.apply(p, list(a[:4]), a[4], deterministic=det,
                                       rngs=rngs).astype(jnp.float32).sum()
        init = lambda key, *a: model.init(key, list(a[:4]), a[4])
        args = (*v, txt)
    elif part == "text":
        model = zoo.PromptContextBase(
            cfg=zoo.default_denseclip_cfg(),
            class_names=tuple(f"thing {i}" for i in range(151)),
            visual_dim=384,
        )
        v3 = t(BATCH, 1024, 384)
        fn = lambda p, x: model.apply(p, x).astype(jnp.float32).sum()
        init, args = model.init, (v3,)
    elif part == "full":
        from lc2is_tpu.ops.fused_ce import upsampled_cross_entropy

        model = zoo.PromptAuxCrossA(class_names=tuple(f"t{i}" for i in range(151)),
                                    dtype=bf, return_score_map=True)
        x = t(BATCH, 3, IMG, IMG)
        y = jnp.asarray(rng.randint(0, 151, size=(BATCH, IMG, IMG)), jnp.int32)

        def fn(p, x):
            out = model.apply(p, {"pixel_values": x})
            return (upsampled_cross_entropy(out["outputs"], y, 4)
                    + 0.4 * upsampled_cross_entropy(out["low_score_map"], y, 16))

        init, args = (lambda key, xx: model.init(key, {"pixel_values": xx[:1]})), (x,)
    else:
        raise SystemExit(f"unknown part {part}")

    shapes = jax.eval_shape(init, jax.random.PRNGKey(0), *args)
    counter = [0]

    def mk(s):
        counter[0] += 1
        return jnp.asarray(0.02 * np.random.RandomState(counter[0]).randn(*s.shape), dtype=s.dtype)

    params = jax.tree_util.tree_map(mk, shapes)

    def gstep(p, a, eps):
        a = [a[0] + eps.astype(a[0].dtype), *a[1:]]
        l, g = jax.value_and_grad(lambda pp: fn(pp, *a))(p)
        # consume EVERY grad leaf: returning just one leaf lets XLA
        # dead-code-eliminate the other weight-grad matmuls (measured: the
        # 'full' grad step shrank to its aux-head subgraph, 49.5 ms vs the
        # real 136 ms train step)
        gs = sum(leaf.astype(jnp.float32).mean()
                 for leaf in jax.tree_util.tree_leaves(g))
        return l.astype(jnp.float32) * 1e-6 + gs * 1e-9

    def fstep(p, a, eps):
        a = [a[0] + eps.astype(a[0].dtype), *a[1:]]
        return fn(p, *a).astype(jnp.float32) * 1e-6

    eps0 = jnp.asarray(0.0, jnp.float32)
    todo = [("grad_step_ms", gstep)]
    if os.environ.get("LC2IS_PROFILE_GRAD_ONLY", "1") != "1":
        todo.append(("fwd_ms", fstep))

    def chain(comp):
        eps = eps0
        for _ in range(ITERS):
            eps = comp(params, list(args), eps)
        return float(eps)

    out = {}
    for name, fn_ in todo:
        comp = jax.jit(fn_).lower(params, list(args), eps0).compile()
        try:
            cost = comp.cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            out[name.replace("_ms", "_gbytes")] = round(
                float(cost.get("bytes accessed", 0.0)) / 1e9, 2)
        except Exception:
            pass
        chain(comp)
        t0 = time.perf_counter()
        chain(comp)
        out[name] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)
    out.update(part=part, batch=BATCH)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "full")
