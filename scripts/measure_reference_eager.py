"""Measure the REFERENCE model eager on CPU torch to anchor the A100-eager
denominator (VERDICT r2 #6: "measure the reference model eager on the CPU
torch install and publish the op-mix-based extrapolation method").

Method
------
The A100 baseline in BASELINE.md is `peak_fp16 * assumed_eager_MFU /
flops_per_img`.  The assumed MFU (12%) is the contested constant.  This
script measures the same quantity — eager-PyTorch MFU on THIS op mix — on
the only torch hardware in the sealed image (CPU):

1. practical peak: best-of large f32 GEMM throughput (torch.matmul),
2. eager model: the reference's SwinTransformer + HierarchicalCrossA +
   score-map forward (model/final.py:152-253 minus the DenseCLIP prompt
   tower, whose submodule is absent from the reference checkout), built at
   the bench geometry (512**2, swin-small dims, 151 classes), random init
   (zero egress: from_pretrained is monkeypatched to config-init),
3. eager MFU = model_flops / (time * practical_peak).

The claim being tested is NOT "CPU speed predicts A100 speed"; it is that
eager-mode dispatch/layout overhead on this op mix keeps achieved-vs-peak
LOW on any backend.  The measured CPU eager MFU is published next to the
assumed A100 figure in BASELINE.md as a sanity anchor.

Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/reference")

import torch

torch.manual_seed(0)

BATCH = 2  # CPU: keep the wall time sane; throughput is per-image anyway
IMG = 512
# swin-small + HierarchicalCrossA flops/img at 512**2 from the repo's pinned
# XLA cost analysis (bench.py): full flagship is 238.4 GF/img; the prompt
# text tower (~877 GF/forward, batch-shared) and ContextDecoder are excluded
# here, leaving encoder+decoder+head ≈ 225 GF/img.
FLOPS_PER_IMG = 225e9


def practical_peak_gemm():
    n = 1024
    a = torch.randn(n, n)
    b = torch.randn(n, n)
    for _ in range(3):
        a @ b
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        a @ b
        best = min(best, time.perf_counter() - t0)
    return 2 * n**3 / best


def build_model():
    import transformers
    from transformers import SwinConfig, SwinModel

    def fake_from_pretrained(path, *a, **k):
        # swin-small ade-sized config (matches the checkpoint the reference
        # names in model/encoder.py:127), random init — zero egress
        cfg = SwinConfig(
            image_size=IMG, embed_dim=96, depths=(2, 2, 18, 2),
            num_heads=(3, 6, 12, 24), window_size=7,
            out_features=None,
        )
        return SwinModel(cfg)

    SwinModel.from_pretrained = classmethod(
        lambda cls, path, *a, **k: fake_from_pretrained(path))
    from model.encoder import SwinTransformer
    from model.hierarchical import HierarchicalCrossA

    class EagerRef(torch.nn.Module):
        """final.py's BaseCrossA wiring (encoder→decoder→score map),
        prompt tower omitted (DenseCLIP submodule absent upstream)."""

        def __init__(self):
            super().__init__()
            self.vision_encoder = SwinTransformer()
            self.vision_decoder = HierarchicalCrossA(
                in_dims=[96, 192, 384, 768], depth=[1, 1, 1], dim=512)
            self.classes = torch.nn.Linear(512, 151, bias=False)

        def forward(self, pixel_values):
            v = self.vision_encoder(pixel_values=pixel_values)
            b = pixel_values.shape[0]
            t = self.classes.weight.expand(b, -1, -1)
            x = self.vision_decoder(visual=list(v), textual=t)
            h = int(x.shape[1] ** 0.5)
            x = x.reshape(b, h, h, -1).permute(0, 3, 1, 2)
            sm = torch.einsum("bchw,bkc->bkhw", x, t)
            sm = torch.nn.functional.interpolate(
                sm, scale_factor=4, mode="bilinear", align_corners=False)
            return sm.argmax(1)

    return EagerRef().eval()


def main():
    peak = practical_peak_gemm()
    model = build_model()
    x = torch.randn(BATCH, 3, IMG, IMG)
    with torch.no_grad():
        model(x)  # warmup (allocator, algo choice)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            model(x)
            times.append(time.perf_counter() - t0)
    dt = min(times)
    img_s = BATCH / dt
    mfu = FLOPS_PER_IMG * img_s / peak
    print(json.dumps({
        "metric": "reference_eager_cpu",
        "img_per_s": round(img_s, 4),
        "practical_peak_gflops": round(peak / 1e9, 1),
        "flops_per_img_g": FLOPS_PER_IMG / 1e9,
        "eager_mfu_pct": round(100 * mfu, 2),
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
