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

import os

BATCH = int(os.environ.get("LC2IS_EAGER_BATCH", "2"))  # CPU wall-time guard
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
    from model.hierarchical import (HierarchicalCrossA, SRTransformerCrossA,
                                    SRTransformerSelfA)

    # torch-version shim: the reference overrides torch's private
    # _sa_block(x, attn_mask, key_padding_mask); newer torch also passes
    # is_causal.  Accept-and-drop so the reference runs unmodified.
    for klass in (SRTransformerCrossA, SRTransformerSelfA):
        orig_sa = klass._sa_block
        klass._sa_block = (
            lambda self, x, attn_mask, key_padding_mask, *a,
                   _o=orig_sa, **k: _o(self, x, attn_mask, key_padding_mask))

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


class OpTrace(torch.utils._python_dispatch.TorchDispatchMode):
    """Per-aten-op byte/flop census of one eager forward.

    bytes: inputs read + outputs written (fp16 on A100 → 2 B/elt).
    flops: shape-derived for mm/bmm/conv/einsum-lowered ops; elementwise ops
    contribute numel (they are bandwidth-bound in the max() model anyway).
    """

    def __init__(self):
        super().__init__()
        self.n_ops = 0
        self.bytes = 0
        self.flops = 0

    def __torch_dispatch__(self, func, types, args=(), kwargs=None):
        out = func(*args, **(kwargs or {}))
        self.n_ops += 1

        def tens(o):
            return [t for t in (o if isinstance(o, (tuple, list)) else [o])
                    if isinstance(t, torch.Tensor)]

        ins = [a for a in args if isinstance(a, torch.Tensor)]
        outs = tens(out)
        self.bytes += 2 * (sum(t.numel() for t in ins) + sum(t.numel() for t in outs))
        name = func.__name__
        if name.startswith(("mm", "bmm", "addmm", "baddbmm")):
            a, b = ins[-2], ins[-1]
            k = a.shape[-1]
            self.flops += 2 * k * outs[0].numel()
        elif name.startswith("convolution"):
            w = ins[1]
            self.flops += 2 * outs[0].numel() * w[0].numel()
        else:
            self.flops += sum(t.numel() for t in outs)
        return out


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
        tracer = OpTrace()
        with tracer:
            model(x)
    dt = min(times)
    img_s = BATCH / dt
    mfu = FLOPS_PER_IMG * img_s / peak

    # ---- analytic A100-eager extrapolation from the op census ----------
    # eager time >= per-op max(compute, HBM traffic) + launch overhead;
    # zero fusion (each aten op round-trips HBM) — that IS eager semantics.
    A100_PEAK = 312e12  # fp16 tensor-core
    A100_BW = 1.55e12   # 40GB SXM HBM2e
    LAUNCH_S = 6e-6     # measured-typical CUDA launch+dispatch per eager op
    t_roof = max(tracer.flops / A100_PEAK, tracer.bytes / A100_BW)
    # per-op roofline sum is tighter than the global roofline: small ops
    # can't reach either peak, but we lack per-op split here, so report the
    # optimistic global roofline + launch floor as the BOUND (the truth is
    # slower → the bound favours the baseline, not us)
    t_launch = tracer.n_ops * LAUNCH_S
    a100_eager_optimistic = BATCH / (t_roof + t_launch)

    print(json.dumps({
        "metric": "reference_eager_cpu",
        "img_per_s": round(img_s, 4),
        "practical_peak_gflops": round(peak / 1e9, 1),
        "flops_per_img_g": FLOPS_PER_IMG / 1e9,
        "eager_mfu_pct": round(100 * mfu, 2),
        "threads": torch.get_num_threads(),
        "census_ops_per_fwd": tracer.n_ops,
        "census_gbytes_per_fwd": round(tracer.bytes / 1e9, 2),
        "census_gflops_per_fwd": round(tracer.flops / 1e9, 1),
        "a100_eager_optimistic_img_s": round(a100_eager_optimistic, 1),
        "a100_eager_optimistic_mfu_pct": round(
            100 * a100_eager_optimistic * FLOPS_PER_IMG / A100_PEAK, 2),
    }))


if __name__ == "__main__":
    main()
