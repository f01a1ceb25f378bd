"""Train/eval harness — the TPU-native ``Engine`` (reference:
``engine.py:14-219``).

Same public surface (ctor args, ``.train()``, ``.evaluate()``, ``.save()``,
hook cadences — ``engine.py:40-42``: eval/save default every 10 epochs, log
every epoch; stop at ``train_step % train_steps == 0``), redesigned inside:

- one jitted, donated train step over a ``jax.sharding.Mesh`` — batch sharded
  on the ``data`` axis, params TP-placed over the ``model`` axis when the
  mesh has one (parallel/sharding.py rules; replicated on a pure-DP mesh),
  optimizer moments inheriting their parameter's sharding, gradient reduction
  inserted by GSPMD (the communication backend the reference lacks,
  SURVEY.md §5.8);
- bf16 compute / fp32 params instead of fp16+GradScaler (``engine.py:59-60``
  equivalent; the ``fp16`` flag maps to bf16 on TPU, no scaler needed);
- eval accumulates losses AND metrics on device per batch (per-image mIoU +
  dataset confusion matrix) instead of hauling every logit to host
  (``engine.py:162-163`` memory hotspot — a compat mode keeps raw outputs for
  the reference-exact ``compute_metrics`` path);
- checkpoints carry params + optimizer + step with resume (reference has no
  resume, SURVEY.md §5.3/5.4) plus torch-``.pt`` export for interop.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jax.sharding import NamedSharding, PartitionSpec as P

from lc2is_tpu.core.mesh import DATA_AXIS, batch_sharding, make_mesh, replicated
from lc2is_tpu.engine import checkpoint as ckpt
from lc2is_tpu.engine.loggers import make_logger
from lc2is_tpu.engine.optim import make_optimizer
from lc2is_tpu.metrics.miou import batch_confusion, per_image_miou
from lc2is_tpu.nn.losses import auxiliary_loss, cross_entropy
from lc2is_tpu.parallel.sharding import infer_opt_specs, infer_param_specs


def _normalize_output(out) -> Dict[str, jnp.ndarray]:
    """Adapt tuple-returning models (v1-v3) to the dict contract the engine
    consumes (``engine.py:82``) — the score map is the last non-None item."""
    if isinstance(out, dict):
        return out
    items = [o for o in out if o is not None]
    return dict(outputs=items[-1])


class Engine:
    def __init__(
        self,
        name: str,
        model,
        params: Optional[Dict] = None,
        optimizer=None,
        criterion: Optional[Callable] = None,
        lr_scheduler: Optional[str] = None,  # schedule kind; steps per opt step
        mesh=None,
        fp16: bool = False,  # mapped to bf16 compute on TPU
        aux_criterion: Optional[Callable] = None,
        aux_weight: float = 0.4,  # engine.py:86,98
        train_loader=None,
        eval_loader=None,
        compute_metrics: Optional[Callable] = None,
        max_epoch: int = 1,
        max_steps: Optional[int] = None,
        exact_steps: bool = False,  # escape hatch for the reference quirk below
        eval_step: Optional[int] = None,
        log_step: Optional[int] = None,
        save_step: Optional[int] = None,
        out_dir: str = "./",
        logger: str = "csv",
        logger_args: Optional[Dict] = None,
        lr: float = 1e-5,
        weight_decay: float = 0.0,
        frozen_prefixes=(),
        num_classes: int = 151,
        seed: int = 1024,
        keep_eval_outputs: bool = False,  # reference-compat raw-logit mode
        donate: bool = True,
        debug_nans: bool = False,  # SURVEY §5.2: sanitizer mode
        checkpoint_on_preemption: bool = True,  # SURVEY §5.3: SIGTERM save
        watch_grads: bool = False,  # wandb.watch equivalent (engine.py:52):
        # log the trainable-grad global norm each step at one-scalar cost
        progress: bool = True,  # tqdm train/eval bars (engine.py:53,138)
    ) -> None:
        if debug_nans:
            jax.config.update("jax_debug_nans", True)
        self._preempted = False
        if checkpoint_on_preemption:
            self._install_preemption_handler()
        self.name = name
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh()
        self.fp16 = fp16
        self._default_loss = criterion is None and aux_criterion is None
        self.criterion = criterion or cross_entropy
        self.aux_criterion = aux_criterion or auxiliary_loss
        self.aux_weight = aux_weight
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.compute_metrics = compute_metrics
        self.num_classes = num_classes
        self.frozen_prefixes = tuple(frozen_prefixes)
        self.keep_eval_outputs = keep_eval_outputs
        self.watch_grads = watch_grads
        self.progress = progress
        self.seed = seed
        self.rng = jax.random.PRNGKey(seed)

        self.steps_in_epoch = len(train_loader) if train_loader is not None else 0
        if max_steps is not None and exact_steps:
            # escape hatch: run exactly max_steps, ignoring the reference's
            # max(steps_in_epoch*max_epoch, max_steps) quirk (engine.py:38-42)
            self.train_steps = max_steps
        elif max_steps is not None:
            self.train_steps = max(self.steps_in_epoch * max_epoch, max_steps)
        else:
            self.train_steps = self.steps_in_epoch * max_epoch
        self.eval_step = self.steps_in_epoch * 10 if eval_step is None else eval_step
        self.log_step = self.steps_in_epoch if log_step is None else log_step
        self.save_step = self.steps_in_epoch * 10 if save_step is None else save_step
        self.out_dir = os.path.join(out_dir, name)
        self.logger = make_logger(logger, self.out_dir, logger_args)

        # --- parameters ---
        if params is None:
            init_batch = self._peek_batch()
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), init_batch)
        # TP: megatron-style param placement over the model axis when the
        # mesh has one (parallel/sharding.py rules); a pure-DP mesh yields
        # all-P() specs == the previous replicated placement.  The spec tree
        # covers the full variables dict (non-"params" collections replicate).
        self._param_shardings = self._variables_shardings(params)
        self.params = jax.device_put(params, self._param_shardings)

        # --- optimizer ---
        if optimizer is None:
            optimizer = make_optimizer(
                self.params["params"] if "params" in self.params else self.params,
                lr=lr, weight_decay=weight_decay,
                schedule=lr_scheduler or "constant",
                total_steps=max(self.train_steps, 1),
                frozen_prefixes=frozen_prefixes,
            )
        self.tx = optimizer
        inner = self.params["params"] if "params" in self.params else self.params
        # optimizer moments inherit their parameter's sharding (shard-local
        # AdamW update under TP; all-P() on a pure-DP mesh)
        opt_state = jax.jit(self.tx.init)(inner)
        self._opt_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s),
            infer_opt_specs(opt_state, inner, self._inner_param_specs))
        self.opt_state = jax.device_put(opt_state, self._opt_shardings)

        self._train_step = None
        self._eval_step = None
        self._build_steps(donate)

        self.train_step_count = 0
        self.train_metrics: Dict = {}
        self.eval_metrics: Dict = {}
        self.all_train_metrics: Dict[str, List[float]] = {}

    # ------------------------------------------------------------------
    def _variables_shardings(self, variables):
        """NamedSharding tree for the full variables dict: the ``params``
        collection follows the TP rules (all-P() on a pure-DP mesh — the
        replicated placement the engine always had), other collections
        replicate.  Also records the raw inner specs for the optimizer."""
        inner = variables["params"] if "params" in variables else variables
        self._inner_param_specs = infer_param_specs(inner, self.mesh)
        inner_sh = jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), self._inner_param_specs)
        if "params" in variables:
            # exact-structure tree (device_put needs a full match, and
            # FrozenDict vs dict must be preserved)
            return type(variables)(
                {k: (inner_sh if k == "params"
                     else jax.tree_util.tree_map(lambda _: replicated(self.mesh), v))
                 for k, v in variables.items()})
        return inner_sh

    # ------------------------------------------------------------------
    def _make_bar(self, total: int, desc: str, leave: bool = True):
        """tqdm progress bar (reference ``engine.py:53,138``); None when
        disabled or tqdm is unavailable."""
        if not self.progress:
            return None
        try:
            from tqdm import tqdm

            return tqdm(total=total, desc=desc, leave=leave, dynamic_ncols=True)
        except Exception:
            return None

    # ------------------------------------------------------------------
    def _install_preemption_handler(self):
        """Failure/elastic-recovery hook the reference lacks (SURVEY §5.3):
        on SIGTERM/SIGUSR1 (typical preemption notices) save a resumable
        checkpoint and stop cleanly at the next step boundary."""
        import signal

        def handler(signum, frame):
            self._preempted = True

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):
                pass  # non-main thread or unsupported platform

    # ------------------------------------------------------------------
    def _peek_batch(self):
        loader = self.train_loader or self.eval_loader
        assert loader is not None, "need a loader (or explicit params) to init"
        batch = next(iter(loader))
        inputs = batch[0] if isinstance(batch, tuple) else batch
        inputs = {k: v for k, v in inputs.items() if k != "label"}
        return self._cast(inputs)

    def _cast(self, inputs):
        if self.fp16:
            return {
                k: (jnp.asarray(v, dtype=jnp.bfloat16) if np.issubdtype(np.asarray(v).dtype, np.floating) else jnp.asarray(v))
                for k, v in inputs.items()
            }
        return {k: jnp.asarray(v) for k, v in inputs.items()}

    def _build_steps(self, donate: bool):
        model, criterion, aux_criterion = self.model, self.criterion, self.aux_criterion
        aux_w, tx, num_classes = self.aux_weight, self.tx, self.num_classes

        # training fast path: with the default CE/aux losses and a model that
        # can emit its LOW-res score map, the x4/x16 upsamples fold into the
        # fused upsample+CE kernels (ops/fused_ce.py) — same loss and grads,
        # the (B, K, 4H, 4W) maps are never materialised
        from lc2is_tpu.ops.dispatch import pallas_enabled, pallas_interpret

        use_fused_loss = (
            self._default_loss
            and getattr(model, "return_score_map", None) is False
            and pallas_enabled(getattr(model, "attn_impl", "auto"))
        )
        self._train_uses_fused_loss = use_fused_loss
        watch_grads = self.watch_grads
        train_model = model.clone(return_score_map=True) if use_fused_loss else model

        # stop_gradient on frozen subtrees: the optimizer already zeroes their
        # updates (optax multi_transform), but without this XLA still COMPUTES
        # the whole frozen backward (e.g. the 12-layer CLIP text tower)
        frozen_prefixes = self.frozen_prefixes

        def _freeze(p):
            if not frozen_prefixes:
                return p
            from lc2is_tpu.engine.optim import frozen_mask

            mask = frozen_mask(p, frozen_prefixes)
            return jax.tree_util.tree_map(
                lambda leaf, trainable: leaf if trainable else jax.lax.stop_gradient(leaf),
                p, mask,
            )

        def _fused_or_plain_ce(sm, labels):
            from lc2is_tpu.ops.fused_ce import upsampled_cross_entropy

            rr = labels.shape[-1] // sm.shape[-1]
            if (rr >= 1 and rr * sm.shape[-1] == labels.shape[-1]
                    and rr * sm.shape[-2] == labels.shape[-2]):
                return upsampled_cross_entropy(sm, labels, rr,
                                               interpret=pallas_interpret())
            from lc2is_tpu.ops.resize import resize

            return criterion(resize(sm, size=labels.shape[-2:], method="bilinear"), labels)

        def train_step(params, opt_state, inputs, labels, rng):
            inner = params["params"] if "params" in params else params

            def loss_fn(p):
                variables = dict(params)
                variables["params"] = _freeze(p)
                out = train_model.apply(variables, inputs, deterministic=False, rngs={"dropout": rng})
                out = _normalize_output(out)
                if use_fused_loss:
                    losses = {"train_loss": _fused_or_plain_ce(out["outputs"], labels)}
                    if "low_score_map" in out:
                        losses["train_aux_loss"] = _fused_or_plain_ce(
                            out["low_score_map"], labels) * aux_w
                else:
                    losses = {"train_loss": criterion(out["outputs"], labels)}
                    if "low_score_map" in out:
                        losses["train_aux_loss"] = aux_criterion(out["low_score_map"], labels) * aux_w
                total = sum(losses.values())
                return total, losses

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(inner)
            if watch_grads:
                # the TPU-native rendering of wandb.watch(model): gradient
                # magnitude tracked on device, one scalar leaves the chip
                losses["train_grad_norm"] = optax.global_norm(grads)
            updates, new_opt = tx.update(grads, opt_state, inner)
            new_inner = jax.tree_util.tree_map(lambda p, u: p + u.astype(p.dtype),
                                               inner, updates)
            new_params = dict(params)
            new_params["params"] = new_inner
            return new_params, new_opt, losses

        def eval_step(params, inputs, labels):
            out = model.apply(params, inputs, deterministic=True)
            out = _normalize_output(out)
            losses = {"eval_loss": criterion(out["outputs"], labels)}
            if "low_score_map" in out:
                losses["eval_aux_loss"] = aux_criterion(out["low_score_map"], labels) * aux_w
            logits = out["outputs"].astype(jnp.float32)
            miou = per_image_miou(logits, labels, num_classes=num_classes)
            cm = batch_confusion(logits, labels, num_classes=num_classes)
            return losses, miou, cm, logits

        rep = replicated(self.mesh)
        # batch args inherit the placement _put_batch chose (data-sharded
        # when divisible, replicated otherwise) — a fixed `bs` in_sharding
        # would crash on any batch not divisible by the data axis
        self._train_step = jax.jit(
            train_step,
            in_shardings=(self._param_shardings, self._opt_shardings, None, None, rep),
            out_shardings=(self._param_shardings, self._opt_shardings, rep),
            donate_argnums=(0, 1) if donate else (),
        )
        self._eval_step = jax.jit(
            eval_step, in_shardings=(self._param_shardings, None, None),
            out_shardings=(rep, rep, rep, None)
        )

    def _put_batch(self, tree):
        """Place a batch with the leading axis over the data mesh axis; fall
        back to replicated when the batch doesn't divide the axis (a 2-image
        debug batch or a partial final batch on an 8-device mesh must run,
        not crash — an odd batch shape recompiles the step either way)."""
        nd = self.mesh.shape[DATA_AXIS]
        leaves = jax.tree_util.tree_leaves(tree)
        ok = all(l.ndim > 0 and l.shape[0] % nd == 0 for l in leaves)
        return jax.device_put(
            tree, batch_sharding(self.mesh) if ok else replicated(self.mesh))

    # ------------------------------------------------------------------
    def train(self):
        self.logger.init()
        self.stop_train = False
        save_path, metrics, log_metrics, eval_metrics = None, {}, {}, {}
        self._train_bar = self._make_bar(self.train_steps, "Training")
        t0 = time.time()
        while not self.stop_train:
            metrics, save_path = self.train_loop()
        if self._train_bar is not None:
            self._train_bar.close()
        self.logger.finish()
        dt = time.time() - t0
        print(f"[engine] trained {self.train_step_count} steps in {dt:.1f}s "
              f"({self.train_step_count / max(dt, 1e-9):.2f} steps/s)")
        return metrics, save_path

    def train_loop(self):
        log_metrics, eval_metrics, save_path = {}, {}, None
        for data in self.train_loader:
            self.train_step_count += 1
            inputs = dict(data[0]) if isinstance(data, tuple) else dict(data)
            labels = jnp.asarray(inputs.pop("label"))
            inputs = self._cast(inputs)
            inputs = self._put_batch(inputs)
            labels = self._put_batch(labels)
            self.rng, step_rng = jax.random.split(self.rng)

            self.params, self.opt_state, losses = self._train_step(
                self.params, self.opt_state, inputs, labels, step_rng
            )
            if getattr(self, "_train_bar", None) is not None:
                self._train_bar.update(1)

            losses = {k: float(v) for k, v in losses.items()}
            for k, v in losses.items():
                self.all_train_metrics.setdefault(k, []).append(v)

            eval_metrics = self.should_eval()
            log_metrics = self.should_log()
            save_path = self.should_save()
            if self._preempted:
                save_path = self.save()
                print(f"[engine] preemption signal: checkpointed at step {self.train_step_count}")
                self.stop_train = True
                break
            if self.should_stop():
                self.stop_train = True
                break
        return {**log_metrics, **eval_metrics}, save_path

    # ------------------------------------------------------------------
    def evaluate(self) -> Dict[str, float]:
        eval_metrics, eval_outputs = self.eval_loop()
        if self.compute_metrics is not None and eval_outputs is not None:
            import inspect

            # reference contract is compute_metrics(**eval_outputs)
            # (engine.py:128-129); drop keys the callable doesn't accept so
            # outputs/labels-only metric fns keep working now that gt_list
            # and sizes ride along
            try:
                sig = inspect.signature(self.compute_metrics)
                if not any(p.kind == p.VAR_KEYWORD for p in sig.parameters.values()):
                    eval_outputs = {k: v for k, v in eval_outputs.items() if k in sig.parameters}
            except (TypeError, ValueError):
                pass
            metrics = self.compute_metrics(**eval_outputs)
            eval_metrics = {**eval_metrics, **{"eval_" + k: v for k, v in metrics.items()}}
        return eval_metrics

    def eval_loop(self):
        assert self.eval_loader is not None
        all_metrics: Dict[str, List[float]] = {}
        miou_sum, n_img = 0.0, 0
        cm_total = np.zeros((self.num_classes, self.num_classes), dtype=np.int64)
        all_outputs, all_labels, gt_list, sizes = [], [], [], []

        eval_bar = self._make_bar(len(self.eval_loader), "Evaluation", leave=False)
        for data in self.eval_loader:
            if eval_bar is not None:
                eval_bar.update(1)
            inputs = dict(data[0]) if isinstance(data, tuple) else dict(data)
            metas = data[1] if isinstance(data, tuple) and len(data) > 1 else None
            labels = jnp.asarray(inputs.pop("label"))
            inputs = self._cast({k: v for k, v in inputs.items() if k != "size"})
            inputs = self._put_batch(inputs)
            labels_dev = self._put_batch(labels)

            losses, miou, cm, logits = self._eval_step(self.params, inputs, labels_dev)
            b = int(labels.shape[0])
            miou_sum += float(miou) * b
            n_img += b
            cm_total += np.asarray(cm)
            for k, v in losses.items():
                all_metrics.setdefault(k, []).append(float(v))
            if self.keep_eval_outputs:
                all_outputs.append(np.asarray(logits))
                all_labels.append(np.asarray(labels))
                if metas is not None and isinstance(metas, list):
                    for m in metas:
                        if isinstance(m, dict) and "size" in m:
                            sizes.append(m["size"])
                        if isinstance(m, dict) and "gt" in m:
                            gt_list.append(np.asarray(m["gt"]))

        if eval_bar is not None:
            eval_bar.close()
        eval_metrics = {k: float(np.mean(v)) for k, v in all_metrics.items()}
        eval_metrics["eval_mIOU_label"] = miou_sum / max(n_img, 1)
        from lc2is_tpu.metrics.miou import dataset_miou

        eval_metrics["eval_mIOU_dataset"] = float(dataset_miou(jnp.asarray(cm_total)))
        self.eval_metrics = eval_metrics

        outputs = None
        if self.keep_eval_outputs and all_outputs:
            outputs = dict(outputs=np.concatenate(all_outputs), labels=np.concatenate(all_labels))
            # the GT path the reference drops at HEAD (metrics.py:45 expects
            # gt_list+sizes; engine.py:166 never collects them) — pass them
            # through whenever the metas carried full-resolution labels
            if gt_list and sizes and len(gt_list) == len(outputs["outputs"]) == len(sizes):
                outputs["gt_list"] = gt_list
                outputs["sizes"] = sizes
        return eval_metrics, outputs

    # ------------------------------------------------------------------
    def log(self) -> Dict:
        train_epoch = round(self.train_step_count / max(self.steps_in_epoch, 1), 4)
        train_metrics = {k: float(np.mean(v)) for k, v in self.all_train_metrics.items()}
        metrics = {
            "train_step": self.train_step_count,
            "train_epoch": train_epoch,
            **train_metrics,
            **self.eval_metrics,
        }
        self.logger.log(metrics)
        print(f"[engine] step {self.train_step_count}: " +
              ", ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}" for k, v in metrics.items()))
        return metrics

    def save(self) -> str:
        checkpoints_dir = os.path.join(self.out_dir, "checkpoints")
        state = dict(params=jax.device_get(self.params), opt_state=jax.device_get(self.opt_state))
        ckpt.save_checkpoint(checkpoints_dir, state, self.train_step_count)
        return checkpoints_dir

    def save_reference_pt(self, path: Optional[str] = None) -> str:
        checkpoints_dir = os.path.join(self.out_dir, "checkpoints")
        os.makedirs(checkpoints_dir, exist_ok=True)
        path = path or os.path.join(checkpoints_dir, f"step-{self.train_step_count}.pt")
        inner = self.params["params"] if "params" in self.params else self.params
        ckpt.export_reference_pt(inner, path)
        return path

    def resume(self, fname: Optional[str] = None) -> int:
        """Resume params+opt+step from the latest (or given) checkpoint —
        the elastic-recovery path the reference lacks (SURVEY.md §5.3)."""
        fname = fname or ckpt.latest_checkpoint(os.path.join(self.out_dir, "checkpoints"))
        if fname is None:
            return 0
        state, meta = ckpt.load_checkpoint(fname)
        self.params = jax.device_put(state["params"], self._param_shardings)
        # the npz round-trip turns optax NamedTuples into plain tuples; zip
        # the flats (leaf order is preserved by the checkpoint format) and
        # unflatten into the CANONICAL optax structure (the sharding tree
        # shares tx.init's treedef) so the jitted step's structured
        # in_shardings match the resumed state
        sh_leaves, sh_def = jax.tree_util.tree_flatten(self._opt_shardings)
        ld_leaves = jax.tree_util.tree_leaves(state["opt_state"])
        if len(sh_leaves) == len(ld_leaves):
            self.opt_state = jax.tree_util.tree_unflatten(
                sh_def, [jax.device_put(x, s) for x, s in zip(ld_leaves, sh_leaves)])
        else:  # structure drifted (e.g. optimizer changed) — replicate
            self.opt_state = jax.device_put(state["opt_state"], replicated(self.mesh))
        self.train_step_count = int(meta.get("step", 0))
        return self.train_step_count

    # --- hooks (engine.py:192-219 semantics) ---------------------------
    def should_eval(self):
        if self.eval_loader is not None and self.train_step_count % max(self.eval_step, 1) == 0:
            m = self.evaluate()
            return m
        return {}

    def should_log(self):
        if self.train_step_count % max(self.log_step, 1) == 0:
            m = self.log()
            self.all_train_metrics = {}
            return m
        return {}

    def should_save(self):
        if self.train_step_count % max(self.save_step, 1) == 0:
            return self.save()
        return None

    def should_stop(self) -> bool:
        return self.train_step_count % max(self.train_steps, 1) == 0
