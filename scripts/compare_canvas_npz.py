"""Compare TPU canvas-kernel grads vs TPU XLA-reference grads (npz files
dumped by the drive probes).  Both sides run on the same chip, so MXU
default-precision f32 matmul noise cancels; tolerance is tight."""
import numpy as np

names = ["dx", "dlnw", "dlnb", "dwqkv", "dbqkv", "dwo", "dbo", "dbias"]
worst = 0.0
for shift, pal in ((0, "/tmp/canvas_drive_tpu_s0.npz"),
                   (3, "/tmp/canvas_drive_pallas_s3.npz")):
    a = np.load(pal)
    b = np.load(f"/tmp/canvas_drive_xla_s{shift}.npz")
    lerr = abs(float(a["val"]) - float(b["val"])) / max(abs(float(b["val"])), 1e-6)
    print(f"shift={shift} loss rel_err={lerr:.2e}")
    worst = max(worst, lerr)
    for i, nm in enumerate(names):
        x, y = a[f"g{i}"], b[f"g{i}"]
        scale = max(np.abs(y).max(), 1e-6)
        err = np.abs(x - y).max() / scale
        worst = max(worst, err)
        print(f"shift={shift} {nm:6s} rel_max_err={err:.2e}")
# measured on v5e (2026-08, wide-load diff): worst 6.7e-3 on dwo; both
# paths sit the SAME distance (up to 2.7e-1 rel) from the CPU-f32 truth —
# MXU default-precision weight-grad accumulation noise, not kernel error
assert worst < 1e-2, worst
print("OK worst", worst)
