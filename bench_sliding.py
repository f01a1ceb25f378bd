"""640² multi-scale sliding-window eval throughput (BASELINE.json config #5).

One jitted multi-scale (0.75/1.0/1.25 + horizontal flip) sliding-window
sweep over 640² inputs with 512² crops on the flagship hierarchical model
(PromptAuxCrossA).  Writes BENCH_SLIDING.json next to this file and prints
the same JSON line.
"""

import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("LC2IS_BENCH_BATCH", "4"))
IMG = 640
ITERS = 4


def main():
    import jax
    import jax.numpy as jnp

    from lc2is_tpu.engine.sliding import multi_scale_sliding_eval
    from lc2is_tpu.models import zoo

    model = zoo.PromptAuxCrossA(class_names=tuple(f"t{i}" for i in range(151)),
                                dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    pv = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32), jnp.bfloat16)

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), {"pixel_values": pv[:1, :, :512, :512]})
    counter = [0]

    def mk(s):
        counter[0] += 1
        r = np.random.RandomState(counter[0])
        return jnp.asarray(0.02 * r.randn(*s.shape), dtype=s.dtype)

    params = jax.tree_util.tree_map(mk, shapes)

    # serving precompute, same as bench.py: the prompt-text transformer is
    # image-independent (~8 ms per forward call of the 512² profile) and the
    # sliding sweep calls the model once per scale — cache it once per
    # checkpoint instead of re-embedding 3× per step
    text_static = jax.jit(lambda p: model.apply(p, method="embed_text"))(params)

    def step(p, x, ts, eps):
        fwd = lambda tiles: model.apply(
            p, {"pixel_values": tiles, "text_static": ts})["outputs"]
        probs = multi_scale_sliding_eval(fwd, x + eps.astype(x.dtype))
        pred = jnp.argmax(probs, axis=1)
        return pred.astype(jnp.float32).mean() * jnp.asarray(1e-8, jnp.float32)

    eps0 = jnp.asarray(0.0, jnp.float32)
    compiled = jax.jit(step).lower(params, pv, text_static, eps0).compile()

    def chain():
        eps = eps0
        for _ in range(ITERS):
            eps = compiled(params, pv, text_static, eps)
        return float(eps)

    chain()
    t0 = time.perf_counter()
    chain()
    dt = (time.perf_counter() - t0) / ITERS

    out = {
        "metric": "ade20k_640_multiscale_sliding_throughput",
        "value": round(BATCH / dt, 3),
        "unit": "images/sec/chip",
        "batch": BATCH,
        "img": IMG,
        "scales": [0.75, 1.0, 1.25],
        "flip": True,
        "crop": 512,
        "stride": 341,
        "dtype": "bfloat16",
        "model": "prompt_aux_cross_a",
        "step_ms": round(dt * 1e3, 2),
        "text_cached": True,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SLIDING.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
