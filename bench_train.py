"""Training-step throughput (secondary benchmark; bench.py is the headline).

One jitted, donated train step on the canonical model (PromptAuxCrossA):
CE + 0.4*aux loss, AdamW with frozen text encoder, bf16 compute / fp32
params, 512² inputs.  Prints one JSON line.
"""

import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("LC2IS_BENCH_BATCH", "8"))  # throughput-optimal on v5e (b16 measured 46.3 vs 48.1 img/s)
IMG = 512
ITERS = 6


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from lc2is_tpu.engine.optim import make_optimizer
    from lc2is_tpu.models import zoo
    from lc2is_tpu.nn.losses import auxiliary_loss, cross_entropy

    model = zoo.PromptAuxCrossA(class_names=tuple(f"t{i}" for i in range(151)), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    pv = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32), dtype=jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, 151, size=(BATCH, IMG, IMG)).astype(np.int32))

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), {"pixel_values": pv[:1]})
    counter = [0]

    def mk(s):
        counter[0] += 1
        return jnp.asarray(0.02 * np.random.RandomState(counter[0]).randn(*s.shape), dtype=s.dtype)

    variables = jax.tree_util.tree_map(mk, shapes)
    params = variables["params"]
    tx = make_optimizer(params, lr=1e-5, total_steps=100,
                        frozen_prefixes=zoo.FROZEN_PREFIXES["prompt_aux_cross_a"])
    opt_state = tx.init(params)

    # training fast path: low-res score map + fused upsample+CE (same math
    # as cross_entropy(resize(outputs)) — see ops/fused_ce.py)
    from lc2is_tpu.ops.fused_ce import upsampled_cross_entropy

    train_model = model.clone(return_score_map=True)

    # stop_gradient on the frozen text tower — the optimizer zeroes its
    # updates but XLA would otherwise still compute its whole backward
    from lc2is_tpu.engine.optim import frozen_mask

    fmask = frozen_mask(params, zoo.FROZEN_PREFIXES["prompt_aux_cross_a"])

    def train_step(p, o, x, y, eps):
        def loss_fn(pp):
            pp = jax.tree_util.tree_map(
                lambda leaf, trainable: leaf if trainable else jax.lax.stop_gradient(leaf),
                pp, fmask)
            out = train_model.apply({"params": pp}, {"pixel_values": x + eps.astype(x.dtype)},
                                    deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
            sm = out["outputs"]  # (B, K, 128, 128)
            low = out["low_score_map"]  # (B, K, 32, 32)
            main = upsampled_cross_entropy(sm, y, IMG // sm.shape[-1])
            aux = upsampled_cross_entropy(low, y, IMG // low.shape[-1])
            return main + 0.4 * aux

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss * jnp.asarray(1e-8, jnp.float32)

    eps0 = jnp.asarray(0.0, jnp.float32)

    # ITERS steps per device program (lax.scan) so the ~3.5 ms/call axon
    # relay cost is paid once per measurement, not once per step (local
    # hardware has no relay).  LC2IS_BENCH_CHAIN=1 restores per-call mode.
    use_chain = os.environ.get("LC2IS_BENCH_CHAIN", "0") == "1"

    if use_chain:
        compiled = jax.jit(train_step, donate_argnums=(0, 1)).lower(
            params, opt_state, pv, labels, eps0
        ).compile()

        def chain(p, o, n):
            eps = eps0
            for _ in range(n):
                p, o, eps = compiled(p, o, pv, labels, eps)
            return p, o, float(eps)
    else:
        def multi(p, o, x, y, eps):
            def body(carry, _):
                return train_step(*carry[:2], x, y, carry[2]), None

            return jax.lax.scan(body, (p, o, eps), None, length=ITERS)[0]

        compiled = jax.jit(multi, donate_argnums=(0, 1)).lower(
            params, opt_state, pv, labels, eps0
        ).compile()

        def chain(p, o, n):  # n is per-call in chain mode; here one call = ITERS steps
            p, o, eps = compiled(p, o, pv, labels, eps0)
            return p, o, float(eps)

    params, opt_state, _ = chain(params, opt_state, 2)  # warmup
    t0 = time.perf_counter()
    params, opt_state, _ = chain(params, opt_state, ITERS)
    dt = (time.perf_counter() - t0) / ITERS

    # XLA cost analysis of the whole step: bytes vs flops says whether the
    # step is HBM- or MXU-bound (Pallas-internal flops are not counted, but
    # bytes accessed are the meaningful signal here)
    extras = {}
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        div = 1 if use_chain else ITERS
        extras = {
            "xla_gflops": round(float(cost.get("flops", 0.0)) / 1e9 / div, 1),
            "xla_gbytes": round(float(cost.get("bytes accessed", 0.0)) / 1e9 / div, 2),
        }
        extras["hbm_bound_ms_at_600GBps"] = round(extras["xla_gbytes"] / 600 * 1e3, 1)
    except Exception:
        pass

    print(json.dumps({
        "metric": "ade20k_512_train_throughput",
        "value": round(BATCH / dt, 3),
        "unit": "images/sec/chip",
        "batch": BATCH,
        "img": IMG,
        "dtype": "bfloat16",
        "model": "prompt_aux_cross_a",
        "step_ms": round(dt * 1e3, 2),
        "timing": "chain" if use_chain else f"scan{ITERS}",
        **extras,
    }))


if __name__ == "__main__":
    main()
