"""Mask agreement of LC2IS_FAST_GELU=1 vs exact erf-gelu on the real chip.

The poly gelu's 4.1e-4 max abs error is below bf16 resolution, so argmax
masks should agree at (or above) the bf16-vs-f32 noise floor measured by
scripts/mask_noise_floor.py.  Random-init weights make 151-way cosine
margins tiny (see BASELINE.md int8 note) — interpret the number against
that floor, not against 1.0.

Two compiles in one process (the relay's practical limit): same params,
same input, kernels traced with exact vs poly gelu.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 8
IMG = 512


def build(fast: bool):
    # _act_fn reads the env at TRACE time — set before building/tracing
    if fast:
        os.environ["LC2IS_FAST_GELU"] = "1"
    else:
        os.environ.pop("LC2IS_FAST_GELU", None)
    import jax
    import jax.numpy as jnp

    from lc2is_tpu.models import zoo

    model = zoo.PromptAuxCrossA(class_names=tuple(f"t{i}" for i in range(151)),
                                dtype=jnp.bfloat16, predict_masks=True)
    return model


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    pv = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32), jnp.bfloat16)

    model = build(False)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), {"pixel_values": pv[:1]})
    counter = [0]

    def mk(s):
        counter[0] += 1
        r = np.random.RandomState(counter[0])
        return jnp.asarray(0.02 * r.randn(*s.shape), dtype=s.dtype)

    params = jax.tree_util.tree_map(mk, shapes)

    masks = {}
    for fast in (False, True):
        m = build(fast)
        fn = jax.jit(lambda p, x: m.apply(p, {"pixel_values": x})["outputs"])
        masks[fast] = np.asarray(fn(params, pv))

    agree = float((masks[True] == masks[False]).mean())
    print(json.dumps({"metric": "fastgelu_mask_agreement", "value": round(agree, 5),
                      "batch": BATCH, "img": IMG}))


if __name__ == "__main__":
    main()
