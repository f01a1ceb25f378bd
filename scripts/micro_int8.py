"""Micro-benchmark: int8 vs bf16 matmul throughput on the v5e MXU.

Answers the BASELINE.md ceiling question empirically before building the
int8 serving kernels: does s8×s8→s32 ``dot_general`` actually run ~2× bf16
at this model's matmul shapes, from XLA and from a Pallas kernel with
in-kernel dynamic activation quantization?

    python scripts/micro_int8.py

Prints one JSON line per case.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 16

# (M, K, N): swin stage-3 MLP up (b16: 16·1024 tokens × 384 → 1536),
# decoder MLP (16·16384 × 512 → 2048), square proj
SHAPES = [
    (16384, 384, 1536),
    (16384, 512, 2048),
    (16384, 512, 512),
    (32768, 768, 768),
]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    eps0 = jnp.asarray(0.0, jnp.float32)

    def timed(compiled, args):
        def chain():
            eps = eps0
            for _ in range(ITERS):
                eps = compiled(*args, eps)
            return float(eps)

        chain()
        t0 = time.perf_counter()
        chain()
        return (time.perf_counter() - t0) / ITERS

    # tunnel overhead calibration
    x0 = jnp.zeros((8, 128), jnp.float32)
    tiny = jax.jit(lambda x, e: e * 1.0000001 + x[0, 0] * 1e-20).lower(x0, eps0).compile()
    overhead = timed(tiny, (x0,))

    results = []
    for m, k, n in SHAPES:
        x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        w = jnp.asarray(rng.randn(n, k), jnp.bfloat16)
        xq = jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8)
        wq = jnp.asarray(rng.randint(-127, 127, (n, k)), jnp.int8)
        flops = 2.0 * m * k * n

        def bf16_mm(x, w, eps):
            y = jax.lax.dot_general(x + eps.astype(x.dtype), w, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return y[0, 0] * 1e-20 + eps * 1.0000001

        def int8_mm(xq, wq, eps):
            xq = xq + eps.astype(jnp.int8)
            y = jax.lax.dot_general(xq, wq, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return y[0, 0].astype(jnp.float32) * 1e-20 + eps * 1.0000001

        # Pallas: bf16 in, dynamic per-row-block quant inside, s8 MXU matmul,
        # f32 dequant out — the pattern the fused kernels would use
        BM = 512

        def qmm_kernel(x_ref, wq_ref, ws_ref, o_ref):
            xf = x_ref[...].astype(jnp.float32)
            s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            s = jnp.maximum(s, 1e-12)
            xi = jnp.round(xf / s).astype(jnp.int8)
            acc = jax.lax.dot_general(xi, wq_ref[...], (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            o_ref[...] = (acc.astype(jnp.float32) * s * ws_ref[...]).astype(o_ref.dtype)

        ws = jnp.ones((1, n), jnp.float32)

        @jax.jit
        def pallas_qmm(x, wq, ws, eps):
            y = pl.pallas_call(
                qmm_kernel,
                grid=(m // BM,),
                in_specs=[
                    pl.BlockSpec((BM, k), lambda i: (i, 0)),
                    pl.BlockSpec((n, k), lambda i: (0, 0)),
                    pl.BlockSpec((1, n), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((BM, n), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x + eps.astype(x.dtype), wq, ws)
            return y[0, 0].astype(jnp.float32) * 1e-20 + eps * 1.0000001

        # Pallas bf16 baseline (same blocking, no quant) for apples-to-apples
        def mm_kernel(x_ref, w_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

        @jax.jit
        def pallas_mm(x, w, eps):
            y = pl.pallas_call(
                mm_kernel,
                grid=(m // BM,),
                in_specs=[
                    pl.BlockSpec((BM, k), lambda i: (i, 0)),
                    pl.BlockSpec((n, k), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((BM, n), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x + eps.astype(x.dtype), w)
            return y[0, 0].astype(jnp.float32) * 1e-20 + eps * 1.0000001

        cases = [
            ("xla_bf16", jax.jit(bf16_mm).lower(x, w, eps0).compile(), (x, w)),
            ("xla_int8", jax.jit(int8_mm).lower(xq, wq, eps0).compile(), (xq, wq)),
            ("pallas_bf16", pallas_mm.lower(x, w, eps0).compile(), (x, w)),
            ("pallas_int8_dynq", pallas_qmm.lower(x, wq, ws, eps0).compile(), (x, wq, ws)),
        ]
        for name, comp, args in cases:
            try:
                dt = max(timed(comp, args) - overhead, 1e-9)
                results.append(dict(case=name, shape=[m, k, n],
                                    ms=round(dt * 1e3, 3),
                                    tops=round(flops / dt / 1e12, 1)))
            except Exception as e:  # noqa: BLE001
                results.append(dict(case=name, shape=[m, k, n],
                                    error=str(e)[:200]))
            print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
