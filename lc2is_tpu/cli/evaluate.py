"""Evaluation CLI — the working version of the reference's ``evaluate.py``
(which is stale at HEAD: imports symbols that no longer exist, SURVEY.md §8).
Canonical config per ``evaluate.sh:1-23``: img 512, label 128, batch 16,
seed 1024, checkpoint step-400.pt."""

from __future__ import annotations

import numpy as np

from lc2is_tpu.cli.common import build_arg_parser, build_loaders, build_model
from lc2is_tpu.core.mesh import make_mesh
from lc2is_tpu.engine.checkpoint import import_reference_pt, load_checkpoint
from lc2is_tpu.engine.engine import Engine


def main(argv=None):
    args = build_arg_parser().parse_args(argv)
    np.random.seed(args.seed)

    _, eval_loader, class_names = build_loaders(args)
    model = build_model(args, class_names)
    mesh = make_mesh(data=args.dp, model=args.tp)

    params = None
    if args.checkpoint:
        if args.checkpoint.endswith(".pt"):
            params = {"params": import_reference_pt(args.checkpoint)}
        else:
            state, _ = load_checkpoint(args.checkpoint)
            params = state["params"]

    compute_metrics = None
    if args.gt_metrics:
        import functools

        from lc2is_tpu.metrics.gt import segmentation_metrics

        compute_metrics = functools.partial(segmentation_metrics, bucket=args.gt_bucket)

    engine = Engine(
        name=args.name,
        model=model,
        params=params,
        mesh=mesh,
        fp16=args.fp16,
        eval_loader=eval_loader,
        out_dir=args.out_dir,
        logger=args.logger,
        seed=args.seed,
        keep_eval_outputs=args.gt_metrics,
        compute_metrics=compute_metrics,
    )
    if args.sliding:
        metrics = evaluate_sliding(engine, eval_loader, args)
    else:
        metrics = engine.evaluate()
    print(metrics)
    return metrics


def evaluate_sliding(engine, eval_loader, args):
    """Multi-scale sliding-window eval at the dataset resolution
    (BASELINE config #5: hierarchical variant @ 640²)."""
    import jax
    import jax.numpy as jnp

    from lc2is_tpu.engine.sliding import multi_scale_sliding_eval
    from lc2is_tpu.metrics.miou import per_image_miou

    scales = tuple(float(s) for s in args.scales.split(","))

    # serving precompute: the prompt-text embedding depends only on params
    # (zoo._PromptFinalBase.embed_text) — compute once per checkpoint instead
    # of once per scale per sweep; models without the method skip the cache
    try:
        text_static = jax.jit(
            lambda p: engine.model.apply(p, method="embed_text"))(engine.params)
    except Exception:
        text_static = None

    # params as a jit ARGUMENT (closing over them embeds hundreds of MB of
    # constants in the compile payload — rejected by the axon relay)
    @jax.jit
    def sweep(p, x, ts):
        def tile_forward(t):
            inputs = {"pixel_values": t}
            if ts is not None:
                inputs["text_static"] = ts
            out = engine.model.apply(p, inputs)
            out = out if isinstance(out, dict) else dict(outputs=[o for o in out if o is not None][-1])
            return out["outputs"]

        return multi_scale_sliding_eval(tile_forward, x, scales=scales,
                                        crop=args.crop, stride=args.stride)

    miou_sum, n = 0.0, 0
    for data in eval_loader:
        inputs = dict(data[0]) if isinstance(data, tuple) else dict(data)
        labels = jnp.asarray(inputs.pop("label"))
        x = engine._cast({"pixel_values": inputs["pixel_values"]})["pixel_values"]
        probs = sweep(engine.params, x, text_static)
        miou = per_image_miou(probs.astype(jnp.float32), labels,
                              num_classes=engine.num_classes,
                              upsample_logits_to_label=False)
        b = int(labels.shape[0])
        miou_sum += float(miou) * b
        n += b
    return dict(eval_mIOU_sliding=miou_sum / max(n, 1), scales=scales)


if __name__ == "__main__":
    main()
