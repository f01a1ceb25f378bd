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
    )
    metrics = engine.evaluate()
    print(metrics)
    return metrics


if __name__ == "__main__":
    main()
