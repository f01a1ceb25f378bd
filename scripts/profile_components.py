"""Per-component TPU timing for the flagship PromptAuxCrossA pipeline.

Each invocation profiles ONE part in its own process (the axon remote-compile
relay rejects several large payloads per process — CLAUDE.md):

    python scripts/profile_components.py swin|decoder|text|head|full

Synthetic inputs at the canonical bench shape (batch 16, 512², bf16,
swin-small dims).  Prints one JSON line with step_ms, gflops (XLA cost
analysis), and the implied TFLOP/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 16
IMG = 512
ITERS = 8


def materialize(shapes):
    import jax
    import jax.numpy as jnp

    counter = [0]

    def mk(s):
        counter[0] += 1
        r = np.random.RandomState(counter[0])
        return jnp.asarray(0.02 * r.randn(*s.shape), dtype=s.dtype)

    return jax.tree_util.tree_map(mk, shapes)


def build(part):
    import jax
    import jax.numpy as jnp

    from lc2is_tpu.models import zoo
    from lc2is_tpu.nn.swin import SwinModel
    from lc2is_tpu.nn.decoders import HierarchicalCrossA
    from lc2is_tpu.ops.resize import resize

    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    def t(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32), dtype=bf)

    if part.startswith("swin"):
        # swin / swin_shallow3 (stage3 depth 2 instead of 18) / swin_xla
        kw = {}
        if part == "swin_shallow3":
            kw = dict(depths=(2, 2, 2, 2))
        if part == "swin_stage12":
            kw = dict(depths=(2, 2, 0, 0))
        if part == "swin_stage1":
            kw = dict(depths=(2, 0, 0, 0))
        if part == "swin_embed":
            kw = dict(depths=(0, 0, 0, 0))
        if part == "swin_xla":
            kw = dict(attn_impl="xla")
        model = SwinModel(dtype=bf, **kw)
        x = t(BATCH, 3, IMG, IMG)
        fn = lambda p, x: model.apply(p, x)[3]
        return model.init, (x,), fn
    if part == "decoder":
        model = HierarchicalCrossA(in_dims=(96, 192, 384, 768), depth=(1, 1, 1), dim=512)
        v = [t(BATCH, 16384, 96), t(BATCH, 4096, 192), t(BATCH, 1024, 384), t(BATCH, 256, 768)]
        txt = t(BATCH, 151, 512)
        fn = lambda p, *a: model.apply(p, list(a[:4]), a[4])
        init = lambda key, *a: model.init(key, list(a[:4]), a[4])
        return init, (*v, txt), fn
    if part in ("srlayer", "srlayer_xla"):
        from lc2is_tpu.nn.layers import SRTransformerDecoderLayer

        impl = "xla" if part.endswith("xla") else "auto"
        model = SRTransformerDecoderLayer(d_model=512, nhead=8, sr_ratio=2,
                                          dropout=0.0, attn_impl=impl)
        x = t(BATCH, 4096, 512)
        mem = t(BATCH, 151, 512)
        fn = lambda p, x, m: model.apply(p, x, m)
        return model.init, (x, mem), fn
    if part == "upsample":
        from lc2is_tpu.ops.resize import resize_tokens

        x = t(BATCH, 4096, 512)
        fn = lambda x: resize_tokens(x, (64, 64), scale_factor=2, method="bilinear")
        return None, (x,), fn
    if part == "optstep":
        # AdamW update alone on the flagship param tree (frozen text masked)
        import optax
        from lc2is_tpu.engine.optim import make_optimizer
        from lc2is_tpu.models import zoo as _zoo

        model = _zoo.PromptAuxCrossA(class_names=tuple(f"t{i}" for i in range(151)),
                                     dtype=bf)
        pv = t(1, 3, 512, 512)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), {"pixel_values": pv})
        params = materialize(shapes)["params"]
        tx = make_optimizer(params, lr=1e-5, total_steps=100,
                            frozen_prefixes=_zoo.FROZEN_PREFIXES["prompt_aux_cross_a"])
        opt_state = tx.init(params)
        grads = jax.tree_util.tree_map(lambda p: p * 1e-3, params)

        def fn(bundle, eps):  # consumed by the RAW branch in main()
            p, o, g = bundle
            g = jax.tree_util.tree_map(lambda x: x + eps.astype(x.dtype), g)
            updates, o2 = tx.update(g, o, p)
            p2 = optax.apply_updates(p, updates)
            # consume EVERY leaf — returning one lets XLA DCE the rest of
            # the update
            return sum(l.astype(jnp.float32).mean()
                       for l in jax.tree_util.tree_leaves(p2))

        return "raw", ((params, opt_state, grads),), fn
    if part in ("losspath", "losspath_fused"):
        # training-loss tail: finish-resize + CE + aux CE (batch 8 like bench_train)
        from lc2is_tpu.nn.losses import auxiliary_loss, cross_entropy
        from lc2is_tpu.ops.fused_ce import upsampled_cross_entropy
        from lc2is_tpu.ops.resize import resize

        fused = part.endswith("fused")
        b = 8
        x = t(b, 512, 128, 128)  # low score map (pre-upsample), bf16
        low = t(b, 151, 32, 32)
        y = jnp.asarray(rng.randint(0, 151, size=(b, 512, 512)), jnp.int32)

        def fn(x, low, y):
            if fused:
                return (upsampled_cross_entropy(x[:, :151], y, 4)
                        + 0.4 * upsampled_cross_entropy(low, y, 16))
            sm = resize(x[:, :151], scale_factor=4, method="bilinear")
            loss = cross_entropy(sm, y) + 0.4 * auxiliary_loss(low, y)
            return loss

        def gfn(x, low, y):
            l, (gx, gl) = jax.value_and_grad(lambda a, b_: fn(a, b_, y), argnums=(0, 1))(x, low)
            return l + gx.astype(jnp.float32).mean() + gl.astype(jnp.float32).mean()

        return None, (x, low, y), lambda *a: gfn(*a)
    if part == "text":
        from lc2is_tpu.models.zoo import PromptContextBase

        model = PromptContextBase(
            cfg=zoo.default_denseclip_cfg(),
            class_names=tuple(f"thing {i}" for i in range(151)),
            visual_dim=384,
        )
        v3 = t(BATCH, 1024, 384)
        fn = lambda p, x: model.apply(p, x)
        return model.init, (v3,), fn
    if part == "head":
        from lc2is_tpu.models.zoo import _score_map

        x = t(BATCH, 16384, 512)
        txt = t(BATCH, 151, 512)

        def fn(x, txt):
            sm = _score_map(x, txt, 128)
            up = resize(sm, scale_factor=4, method="bilinear")
            return jnp.argmax(up, axis=1)

        return None, (x, txt), fn
    if part == "head_fused":
        # the serving head bench.py actually runs (zoo._FinalBase._finish,
        # predict_masks=True): normalise+classify+x4 upsample+argmax fused
        from lc2is_tpu.models.zoo import _norm
        from lc2is_tpu.ops.upsample_argmax import score_upsample_argmax

        x = t(BATCH, 16384, 512)
        txt = t(BATCH, 151, 512)
        fn = lambda x, txt: score_upsample_argmax(x, _norm(txt, axis=2), 128, r=4)
        return None, (x, txt), fn
    if part == "text_ctx":
        # per-step prompt cost when text_static is precomputed (bench path):
        # just the ContextDecoder over the stage-3 visual context + residual
        from lc2is_tpu.models.zoo import PromptContextBase

        model = PromptContextBase(
            cfg=zoo.default_denseclip_cfg(),
            class_names=tuple(f"thing {i}" for i in range(151)),
            visual_dim=384,
        )
        v3 = t(BATCH, 1024, 384)
        ts = t(151, 512)
        fn = lambda p, x, s: model.apply(p, x, text_static=s)
        init = lambda key, x, s: model.init(key, x)
        return init, (v3, ts), fn
    if part == "full":
        model = zoo.PromptAuxCrossA(
            class_names=tuple(f"thing {i}" for i in range(151)), dtype=bf
        )
        x = t(BATCH, 3, IMG, IMG)
        fn = lambda p, x: jnp.argmax(model.apply(p, {"pixel_values": x})["outputs"], axis=1)
        init = lambda key, x: model.init(key, {"pixel_values": x})
        return init, (x,), fn
    raise SystemExit(f"unknown part {part}")


def main():
    import jax
    import jax.numpy as jnp

    part = sys.argv[1]
    grad_mode = part.endswith("+grad")
    if grad_mode:
        part = part[: -len("+grad")]
    init, args, fn = build(part)
    if grad_mode:
        base_fn = fn

        def fn(p, *a):
            def loss(p):
                out = base_fn(p, *a)
                leaves = jax.tree_util.tree_leaves(out)
                return sum((l.astype(jnp.float32) ** 2).mean() for l in leaves)

            grads = jax.grad(loss)(p)
            return sum(l.astype(jnp.float32).mean()
                       for l in jax.tree_util.tree_leaves(grads))

    # params go through as jit ARGS — closing over them embeds every weight
    # as a multi-MB dense literal and blows the relay payload limit
    if init == "raw":
        # fn takes (pytree_bundle, eps) directly
        params = args[0]
        args = ()
        step_fn = lambda p, eps: (
            jnp.asarray(fn(p, eps), jnp.float32).mean() * jnp.asarray(1e-8, jnp.float32)
        )
    elif init is not None:
        shapes = jax.eval_shape(init, jax.random.PRNGKey(0),
                                *jax.tree_util.tree_map(lambda a: a[:1], args))
        params = materialize(shapes)
        step_fn = lambda p, eps, *a: (
            jnp.asarray(fn(p, *(x + eps.astype(x.dtype) for x in a)),
                        jnp.float32).mean() * jnp.asarray(1e-8, jnp.float32)
        )
    else:
        params = {}
        step_fn = lambda p, eps, *a: (
            jnp.asarray(fn(*(x + eps.astype(x.dtype) for x in a)),
                        jnp.float32).mean() * jnp.asarray(1e-8, jnp.float32)
        )

    eps0 = jnp.asarray(0.0, jnp.float32)
    compiled = jax.jit(step_fn).lower(params, eps0, *args).compile()
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        hbm_bytes = float(cost.get("bytes accessed", 0.0))
    except Exception:
        flops, hbm_bytes = 0.0, 0.0

    def chain():
        eps = eps0
        for _ in range(ITERS):
            eps = compiled(params, eps, *args)
        return float(eps)

    chain()
    t0 = time.perf_counter()
    chain()
    dt = (time.perf_counter() - t0) / ITERS

    # calibrate the axon tunnel's per-call dispatch overhead (~3.4 ms) with a
    # trivial chained op and subtract it — without this every micro-benchmark
    # is dominated by the relay round-trip, not device time
    def tiny(eps):
        return eps * jnp.asarray(1.0000001, jnp.float32) + jnp.asarray(1e-20, jnp.float32)

    tinyc = jax.jit(tiny).lower(eps0).compile()

    def tiny_chain():
        eps = eps0
        for _ in range(ITERS):
            eps = tinyc(eps)
        return float(eps)

    tiny_chain()
    t0 = time.perf_counter()
    tiny_chain()
    overhead = (time.perf_counter() - t0) / ITERS
    dt = max(dt - overhead, 1e-9)

    print(json.dumps({
        "part": part,
        "tunnel_ms": round(overhead * 1e3, 2),
        "step_ms": round(dt * 1e3, 2),
        "gflops": round(flops / 1e9, 1),
        "tflops_s": round(flops / dt / 1e12, 1),
        "hbm_gb": round(hbm_bytes / 1e9, 2),
        "hbm_gb_s": round(hbm_bytes / dt / 1e9, 1),
        "img_s": round(BATCH / dt, 1),
    }))


if __name__ == "__main__":
    main()
