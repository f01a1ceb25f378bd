"""Argmax-agreement noise floor: bf16 vs f32 masks on the bench protocol's
random-init weights.

Why: bench.py's int8_mask_agreement compares int8 masks to bf16 masks on
RANDOM weights, where the 151-way cosine score margins are tiny — any
numerical noise flips many pixels.  This control quantifies how much
disagreement pure bf16 rounding already produces vs f32 on the identical
protocol, giving the denominator for reading the int8 number.

    python scripts/mask_noise_floor.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("LC2IS_BENCH_BATCH", "16"))
IMG = 512


def main():
    import jax
    import jax.numpy as jnp

    from lc2is_tpu.models import zoo

    class_names = tuple(f"thing {i}" for i in range(151))
    rng = np.random.RandomState(0)
    pv32 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))

    masks = {}
    for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        model = zoo.PromptAuxCrossA(class_names=class_names, dtype=dt,
                                    predict_masks=True)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                {"pixel_values": pv32[:1].astype(dt)})
        counter = [0]

        def mk(s):
            counter[0] += 1
            r = np.random.RandomState(counter[0])
            return jnp.asarray(0.02 * r.randn(*s.shape), dtype=s.dtype)

        params = jax.tree_util.tree_map(mk, shapes)
        ts = jax.jit(lambda p: model.apply(p, method="embed_text"))(params)
        pred = jax.jit(lambda p, x, t: model.apply(
            p, {"pixel_values": x, "text_static": t})["outputs"])(
                params, pv32.astype(dt), ts)
        masks[dtype_name] = np.asarray(pred)
        del params, ts, pred

    agree = float((masks["bf16"] == masks["f32"]).mean())
    print(json.dumps({"bf16_vs_f32_mask_agreement": round(agree, 5),
                      "batch": BATCH, "img": IMG, "weights": "random-init"}))


if __name__ == "__main__":
    main()
