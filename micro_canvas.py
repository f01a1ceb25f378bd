import sys, numpy as np, jax, jax.numpy as jnp
from lc2is_tpu.engine.tpu_bench import bench_steps
from lc2is_tpu.ops.swin_canvas import swin_canvas_block

h, w, c, heads = (int(x) for x in sys.argv[1:5])
shift = int(sys.argv[5])
rs = np.random.RandomState(0)
f = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * 0.05, jnp.bfloat16)
p = dict(x=f(16, h, w, c), lnw=f(c), lnb=f(c), wqkv=f(3*c, c), bqkv=f(3*c),
         wo=f(c, c), bo=f(c), bias=f(heads, 49, 49))
fn = jax.jit(lambda x: swin_canvas_block(
    x, p['lnw'], p['lnb'], p['wqkv'], p['bqkv'], p['wo'], p['bo'], p['bias'],
    heads, 7, shift))
t, _ = bench_steps(fn, p['x'], n=16)
print(f"C={c} shift={shift}: {t*1e3:.3f} ms")
