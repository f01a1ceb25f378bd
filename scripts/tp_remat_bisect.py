"""Bisect which TP sharding rules trigger XLA SPMD "Involuntary full
rematerialization" warnings on the (4,2) mesh (VERDICT r4 #6 / MULTICHIP_r04
tail).  Compile-only: the partitioner emits the warnings during lowering.

Usage (CPU mesh):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/tp_remat_bisect.py [exclude_prefix ...]

Prints compile seconds + remat-warning count (warnings go to stderr via absl;
run under `2>&1 | grep -c` or read the printed count from the captured log).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(exclude_prefixes):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lc2is_tpu.core.mesh import DATA_AXIS, make_mesh
    from lc2is_tpu.models import zoo
    from lc2is_tpu.nn.losses import auxiliary_loss, cross_entropy
    from lc2is_tpu.parallel import sharding as sh

    tiny_swin = dict(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window=4)
    cfg = dict(
        text_encoder=dict(context_length=8, vocab_size=49408, transformer_width=512,
                          transformer_heads=8, transformer_layers=1, embed_dim=512),
        context_decoder=dict(transformer_width=64, transformer_heads=4, transformer_layers=1),
        context_length=4,
        text_dim=512,
    )
    model = zoo.PromptAuxCrossA(
        class_names=("wall", "sky", "tree", "road"), cfg=cfg, swin_cfg=tiny_swin, dropout=0.0,
    )
    img, batch = 64, 8
    rng = np.random.RandomState(0)
    inputs = {"pixel_values": np.asarray(rng.randn(batch, 3, img, img), np.float32)}
    labels = rng.randint(0, 4, size=(batch, img, img)).astype(np.int32)

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), inputs)["params"]
    counter = [0]

    def mk(s):
        counter[0] += 1
        r = np.random.RandomState(counter[0])
        return (0.02 * r.randn(*s.shape)).astype(s.dtype)

    params0 = jax.tree_util.tree_map(mk, shapes)

    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    specs = sh.infer_param_specs(params0, mesh)

    # apply exclusions: replicate any param whose dotted path starts with one
    def filt(path, spec):
        name = ".".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)
        if any(name.startswith(px) for px in exclude_prefixes):
            return P()
        return spec

    specs = jax.tree_util.tree_map_with_path(lambda p, _, s: filt(p, s), params0, specs)
    n_sharded = sum(1 for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)) if s != P())
    print(f"[bisect] exclusions={exclude_prefixes} sharded_params={n_sharded}", flush=True)

    bspec = NamedSharding(mesh, P(DATA_AXIS))
    pshard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)

    def loss_fn(pp, x, y):
        out = model.apply({"params": pp}, x)
        return cross_entropy(out["outputs"], y) + 0.4 * auxiliary_loss(out["low_score_map"], y)

    full_step = "--full-step" in exclude_prefixes
    shard_opt = "--shard-opt" in exclude_prefixes
    exclude_prefixes = [p for p in exclude_prefixes if not p.startswith("--")]

    if full_step:
        import optax

        from lc2is_tpu.engine.optim import make_optimizer

        tx = make_optimizer(params0, lr=1e-4, total_steps=1,
                            frozen_prefixes=zoo.FROZEN_PREFIXES["prompt_aux_cross_a"])
        opt_state0 = tx.init(jax.tree_util.tree_map(jnp.asarray, params0))
        if shard_opt:
            ospecs = sh.infer_opt_specs(opt_state0, params0, specs)
            oshard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), ospecs)
        else:
            oshard = NamedSharding(mesh, P())

        def train_step(p, o, x, y):
            loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
            updates, o2 = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, loss

        fn = jax.jit(train_step,
                     in_shardings=(pshard, oshard, {"pixel_values": bspec}, bspec),
                     out_shardings=(pshard, oshard, NamedSharding(mesh, P())))
        lower_args = (jax.tree_util.tree_map(jnp.asarray, params0), opt_state0)
    else:
        fn = jax.jit(jax.value_and_grad(loss_fn),
                     in_shardings=(pshard, {"pixel_values": bspec}, bspec),
                     out_shardings=(NamedSharding(mesh, P()), pshard))
        lower_args = (jax.tree_util.tree_map(jnp.asarray, params0),)
    t0 = time.perf_counter()
    x = {"pixel_values": jnp.asarray(inputs["pixel_values"])}
    y = jnp.asarray(labels)
    compiled = fn.lower(*lower_args, x, y).compile()
    tc = time.perf_counter() - t0
    params = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(jnp.asarray(p), s), params0, pshard)
    xs = {"pixel_values": jax.device_put(x["pixel_values"], bspec)}
    ys = jax.device_put(y, bspec)
    if full_step:
        call = lambda: compiled(params, opt_state0, xs, ys)[2]
    else:
        call = lambda: compiled(params, xs, ys)[0]
    loss = call()
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(3):
        loss = call()
    jax.block_until_ready(loss)
    ts = (time.perf_counter() - t0) / 3
    print(f"[bisect] full_step={full_step} shard_opt={shard_opt} "
          f"compile={tc:.1f}s step={ts * 1e3:.0f}ms loss={float(loss):.6f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
