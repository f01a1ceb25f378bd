"""Training driver — the reconstruction of the reference's missing
``default.py`` (invoked by ``all_args.sh:29-35``; arg surface from
``all_args.sh:10-27``)."""

from __future__ import annotations

import numpy as np

from lc2is_tpu.cli.common import build_arg_parser, build_loaders, build_model
from lc2is_tpu.core.mesh import make_mesh
from lc2is_tpu.engine.engine import Engine
from lc2is_tpu.models.zoo import FROZEN_PREFIXES


def main(argv=None):
    args = build_arg_parser().parse_args(argv)
    np.random.seed(args.seed)

    train_loader, eval_loader, class_names = build_loaders(args)
    model = build_model(args, class_names)
    mesh = make_mesh(data=args.dp, model=args.tp)

    engine = Engine(
        name=args.name,
        model=model,
        mesh=mesh,
        fp16=args.fp16,
        train_loader=train_loader,
        eval_loader=eval_loader,
        max_epoch=args.max_epoch,
        max_steps=args.max_steps,
        exact_steps=args.exact_steps,
        eval_step=args.eval_step,
        log_step=args.log_step,
        save_step=args.save_step,
        out_dir=args.out_dir,
        logger=args.logger,
        logger_args=dict(project=args.wandb_project) if args.wandb_project else None,
        lr=args.lr,
        weight_decay=args.weight_decay,
        frozen_prefixes=FROZEN_PREFIXES.get(args.model, ()),
        seed=args.seed,
        watch_grads=args.watch_grads or args.logger == "wandb",
    )
    if args.resume:
        start = engine.resume()
        print(f"[train] resumed at step {start}")
    metrics, save_path = engine.train()
    print(metrics)
    return metrics


if __name__ == "__main__":
    main()
