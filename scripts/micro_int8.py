"""Micro-benchmark: int8 vs bf16 matmul throughput on the v5e MXU.

Each case runs R serially-dependent square matmuls INSIDE one jitted call
(lax.fori_loop carrying the activation), so device work per tunnel dispatch
is tens of ms and the ~3.5 ms relay overhead is noise.  x feeds forward
through every matmul — XLA cannot dead-code any of them.

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

ITERS = 4
R = 128  # matmuls per dispatch
M = 16384
CS = [384, 512, 768]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))  # host fetch
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
        return (time.perf_counter() - t0) / ITERS

    for c in CS:
        flops = 2.0 * M * c * c * R
        x = jnp.asarray(rng.randn(M, c) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.randn(c, c) / np.sqrt(c), jnp.bfloat16)
        xq = jnp.asarray(rng.randint(-127, 128, (M, c)), jnp.int8)
        wq = jnp.asarray(rng.randint(-127, 128, (c, c)), jnp.int8)

        @jax.jit
        def xla_bf16(x, w):
            def body(i, xx):
                y = jax.lax.dot_general(xx, w, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                return (y * jnp.float32(1.0 / np.sqrt(c))).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, R, body, x)

        @jax.jit
        def xla_int8(xq, wq):
            def body(i, xx):
                y = jax.lax.dot_general(xx, wq, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                return (y & 127).astype(jnp.int8)

            return jax.lax.fori_loop(0, R, body, xq)

        def mm_kernel(x_ref, w_ref, o_ref):
            xx = x_ref[...]
            for _ in range(8):  # 8 chained matmuls per kernel call
                y = jax.lax.dot_general(xx, w_ref[...], (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                xx = (y * jnp.float32(1.0 / np.sqrt(c))).astype(x_ref.dtype)
            o_ref[...] = xx

        BM = 2048

        @jax.jit
        def pallas_bf16(x, w):
            def body(i, xx):
                return pl.pallas_call(
                    mm_kernel,
                    grid=(M // BM,),
                    in_specs=[pl.BlockSpec((BM, c), lambda i: (i, 0)),
                              pl.BlockSpec((c, c), lambda i: (0, 0))],
                    out_specs=pl.BlockSpec((BM, c), lambda i: (i, 0)),
                    out_shape=jax.ShapeDtypeStruct((M, c), jnp.bfloat16),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(xx, w)

            return jax.lax.fori_loop(0, R // 8, body, x)

        def qmm_kernel(x_ref, wq_ref, o_ref):
            xx = x_ref[...]
            for _ in range(8):
                xf = xx.astype(jnp.float32)
                s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
                xi = jnp.round(xf / s).astype(jnp.int8)
                acc = jax.lax.dot_general(xi, wq_ref[...], (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                xx = (acc.astype(jnp.float32) * s * jnp.float32(1e-4)).astype(x_ref.dtype)
            o_ref[...] = xx

        @jax.jit
        def pallas_int8_dynq(x, wq):
            def body(i, xx):
                return pl.pallas_call(
                    qmm_kernel,
                    grid=(M // BM,),
                    in_specs=[pl.BlockSpec((BM, c), lambda i: (i, 0)),
                              pl.BlockSpec((c, c), lambda i: (0, 0))],
                    out_specs=pl.BlockSpec((BM, c), lambda i: (i, 0)),
                    out_shape=jax.ShapeDtypeStruct((M, c), jnp.bfloat16),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(xx, wq)

            return jax.lax.fori_loop(0, R // 8, body, x)

        for name, fn, args in [
            ("xla_bf16", xla_bf16, (x, w)),
            ("xla_int8", xla_int8, (xq, wq)),
            ("pallas_bf16", pallas_bf16, (x, w)),
            ("pallas_int8_dynq", pallas_int8_dynq, (x, wq)),
        ]:
            try:
                dt = timed(fn, *args)
                print(json.dumps(dict(case=name, c=c, ms=round(dt * 1e3, 2),
                                      tops=round(flops / dt / 1e12, 1))), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps(dict(case=name, c=c, error=str(e)[:200])), flush=True)


if __name__ == "__main__":
    main()
