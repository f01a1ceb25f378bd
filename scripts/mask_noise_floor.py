"""Argmax-agreement noise floor: bf16 vs f32 masks on the bench protocol's
random-init weights.

Why: bench.py's int8_mask_agreement compares int8 masks to bf16 masks on
RANDOM weights, where the 151-way cosine score margins are tiny — any
numerical noise flips many pixels.  This control quantifies how much
disagreement pure bf16 rounding already produces vs f32 on the identical
protocol, giving the denominator for reading the int8 number.

One dtype per PROCESS (each full-model compile is a large remote-compile
relay payload — CLAUDE.md):

    python scripts/mask_noise_floor.py bf16     # writes /tmp/noise_mask_bf16.npy
    python scripts/mask_noise_floor.py f32      # writes /tmp/noise_mask_f32.npy
    python scripts/mask_noise_floor.py compare  # prints the agreement JSON
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("LC2IS_BENCH_BATCH", "8"))
IMG = 512


def run(dtype_name: str) -> None:
    import jax
    import jax.numpy as jnp

    from lc2is_tpu.models import zoo

    dt = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_name]
    class_names = tuple(f"thing {i}" for i in range(151))
    rng = np.random.RandomState(0)
    pv32 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))

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
    np.save(f"/tmp/noise_mask_{dtype_name}.npy", np.asarray(pred))


def compare() -> None:
    a = np.load("/tmp/noise_mask_bf16.npy")
    b = np.load("/tmp/noise_mask_f32.npy")
    agree = float((a == b).mean())
    print(json.dumps({"bf16_vs_f32_mask_agreement": round(agree, 5),
                      "batch": BATCH, "img": IMG, "weights": "random-init"}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if mode in ("bf16", "f32"):
        run(mode)
    else:
        compare()
