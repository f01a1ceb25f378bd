"""Drive the canvas kernel fwd+bwd on the REAL TPU and dump grads to npz.

Run once with JAX_PLATFORMS default (TPU, Pallas kernel) and once on CPU
(`env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu LC2IS_DRIVE_REF=1`, XLA
reference path); compare with scripts/compare_canvas_npz.py.  Geometry 1
(shift=0, W=50, win=7 -> wc=56 %8==0) exercises the wide-load fast path;
geometry 2 (shift=3) exercises the concat path + strip-height g load.
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from lc2is_tpu.ops import swin_canvas as sc

REF = os.environ.get("LC2IS_DRIVE_REF") == "1"
OUT = "/tmp/canvas_drive_ref.npz" if REF else "/tmp/canvas_drive_tpu.npz"


def make_args(seed, h, w, c, heads, win):
    r = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32) * 0.1)
    return (f(1, h, w, c), f(c), f(c), f(3 * c, c), f(3 * c), f(c, c), f(c),
            f(heads, win * win, win * win))


def run(shift):
    args = make_args(7 + shift, 50, 50, 64, 2, 7)

    def loss(*a):
        if REF:
            y = sc._xla_canvas_reference(*a, 2, 7, shift, 1e-5)
        else:
            y = sc.swin_canvas_block(*a, 2, 7, shift)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size, dtype=jnp.float32)
                                   .reshape(y.shape)))

    val, grads = jax.jit(jax.value_and_grad(loss, argnums=tuple(range(8))))(*args)
    return [np.asarray(jax.device_get(t)) for t in (val, *grads)]


out = {}
for shift in (0, 3):
    for i, t in enumerate(run(shift)):
        out[f"s{shift}_{i}"] = t
    print(f"shift={shift} done, loss={out[f's{shift}_0']}")
np.savez(OUT, **out)
print("wrote", OUT)
