"""Full checkpoint→CLI→mIoU dress rehearsal (VERDICT r2 item 7).

Exercises the whole acceptance chain that scripts/parity_eval.sh will run the
moment real assets exist, with synthetic stand-ins that keep every step REAL:

1. a synthetic-but-real CLIP merges file drives BOTH tokenizers — HF
   ``CLIPTokenizer`` (what the reference effectively uses,
   ``model/final.py:100``) and ours (``ops/bpe.py``) — and the ids must match;
2. PromptAuxCrossA (the canonical training model) is trained for 2 real
   steps through ``cli/train.py``;
3. the npz checkpoint is exported to a torch-zip ``.pt`` and re-imported via
   the reference path (``core/pt_io.py`` + ``core/torch_import.py``);
4. ``cli/evaluate.py`` runs on BOTH checkpoint formats — metrics must be
   identical, and the predicted masks bit-equal (``evaluate.py:66-80``).

Heavy (full swin-small + prompt tower at 64², fwd+bwd compile on the CPU
mesh) — this is the one test standing in for the real-asset acceptance run.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier (--runslow): VERDICT r4 #5 two-tier split
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_bpe import _write_synthetic_clip_vocab  # noqa: E402

from lc2is_tpu.engine.checkpoint import (  # noqa: E402
    export_reference_pt,
    import_reference_pt,
    latest_checkpoint,
    load_checkpoint,
)


@pytest.fixture()
def synthetic_bpe(tmp_path, monkeypatch):
    import lc2is_tpu.ops.bpe as bpe

    vocab_file, merges_file = _write_synthetic_clip_vocab(tmp_path)
    monkeypatch.setenv("LC2IS_BPE_PATH", merges_file)
    bpe._tokenizers.clear()
    yield vocab_file, merges_file
    bpe._tokenizers.clear()


def test_dress_rehearsal_checkpoint_cli_miou(tmp_path, synthetic_bpe):
    vocab_file, merges_file = synthetic_bpe

    # --- 1. tokenizer parity on BOTH sides of the fence --------------------
    from transformers import CLIPTokenizer

    from lc2is_tpu.ops.bpe import tokenize

    hf = CLIPTokenizer(vocab_file, merges_file)
    probe_names = ["wall", "sky", "tree", "road", "a photo of the wall"]
    ctx = 13
    ours = tokenize(probe_names, context_length=ctx)
    from lc2is_tpu.ops.bpe import EOT, SOT

    for i, name in enumerate(probe_names):
        # content ids must match HF exactly; the specials differ by
        # construction (ours pins CLIP's real 49406/49407 so the ids stay
        # valid rows of the model's 49408-entry embedding, HF derives them
        # from the synthetic vocab size) — same check as test_bpe.py
        want = hf(name.lower())["input_ids"][1:-1][: ctx - 2]
        got = ours[i].tolist()
        assert got[0] == SOT and EOT in got
        assert got[1 : 1 + len(want)] == want, (name, got, want)
        assert got[1 + len(want)] == EOT

    # --- 2. train 2 real steps through the CLI -----------------------------
    from lc2is_tpu.cli import evaluate as evaluate_cli
    from lc2is_tpu.cli import train as train_cli

    out_dir = str(tmp_path / "run")
    common = [
        "--name", "rehearsal", "--out_dir", out_dir, "--seed", "7",
        "--data_name", "synthetic", "--data_size", "8",
        "--model", "prompt_aux_cross_a",
        "--img_size", "64", "--label_size", "16", "--batch_size", "8",
        "--dropout", "0", "--logger", "null",
    ]
    train_cli.main(common + ["--max_epoch", "1", "--max_steps", "2",
                             "--exact_steps", "--save_step", "2",
                             "--eval_step", "1000", "--log_step", "1"])

    npz = latest_checkpoint(os.path.join(out_dir, "rehearsal", "checkpoints"))
    assert npz is not None and npz.endswith("step-2.npz")

    # --- 3. export to torch-zip .pt, re-import via the reference path ------
    state, _ = load_checkpoint(npz)
    pt_path = str(tmp_path / "step-2.pt")
    inner = state["params"]["params"] if "params" in state["params"] else state["params"]
    export_reference_pt(inner, pt_path)
    reimported = import_reference_pt(pt_path)
    import jax

    assert len(jax.tree_util.tree_leaves(reimported)) > 50  # a real tree went through

    # --- 4. evaluate via the CLI on both formats ---------------------------
    m_npz = evaluate_cli.main(common + ["--checkpoint", npz])
    m_pt = evaluate_cli.main(common + ["--checkpoint", pt_path])
    assert set(m_npz) == set(m_pt)
    for k in m_npz:
        assert m_npz[k] == pytest.approx(m_pt[k], abs=1e-7), (k, m_npz[k], m_pt[k])

    # --- 5. bit-equal masks from the two param trees -----------------------
    from lc2is_tpu.data.ade20k import SyntheticADE20K
    from lc2is_tpu.models import zoo

    names = SyntheticADE20K(length=1, img_size=64).class_names
    model = zoo.PromptAuxCrossA(class_names=tuple(names), dropout=0.0)
    rng = np.random.RandomState(0)
    x = {"pixel_values": jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))}
    out_a = model.apply({"params": inner}, x)["outputs"]
    out_b = model.apply({"params": reimported}, x)["outputs"]
    assert np.array_equal(np.asarray(jnp.argmax(out_a, 1)), np.asarray(jnp.argmax(out_b, 1)))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=0.0)


def test_parity_eval_sh_code_path(tmp_path, synthetic_bpe):
    """Drive scripts/parity_eval.sh's EXACT code path (VERDICT r4 #7): the
    flag set is PARSED OUT OF THE SHELL SCRIPT (so script/test drift fails
    here), the checkpoint is a synthesized reference-format torch-zip ``.pt``
    for the script's default model (base_with_text, with the prototype-table
    param the reference trains — model/model.py:22), and the run goes through
    ``cli/evaluate.py`` with ``--gt_metrics --gt_bucket`` exactly as the
    real-asset acceptance run will.  Only dataset identity and sizes are
    substituted (synthetic data, CPU-budget shapes); every other flag the
    script passes is asserted present."""
    import re

    sh = open(os.path.join(os.path.dirname(__file__), "..", "scripts",
                           "parity_eval.sh")).read()
    # the evaluate invocation is the only python block; collect its flags
    block = sh[sh.index("python -m lc2is_tpu.cli.evaluate"):]
    script_flags = re.findall(r"(--[a-z0-9_]+)", block)
    assert "--gt_metrics" in script_flags and "--gt_bucket" in script_flags

    # flags whose VALUES the test overrides for CPU budget / offline data;
    # the flag itself still rides the argv so the parse path is identical
    resized = {"--data_size": "8", "--img_size": "64", "--label_size": "16",
               "--batch_size": "4", "--gt_bucket": "16"}
    # dataset substitution: the only structural difference vs the real run
    substituted = {"--data_name": "synthetic", "--data_root": None, "--split": None}

    # --- synthesize a reference-format checkpoint for the script's model ----
    from argparse import Namespace

    import jax
    import jax.numpy as jnp

    from lc2is_tpu.cli.common import build_arg_parser, build_model
    from lc2is_tpu.data.ade20k import SyntheticADE20K

    names = SyntheticADE20K(length=1, img_size=64).class_names
    seed_args = build_arg_parser().parse_args(
        ["--name", "synth", "--model", "base_with_text", "--img_size", "64",
         "--label_size", "16", "--dropout", "0"])
    model = build_model(seed_args, names)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        {"pixel_values": jnp.zeros((1, 3, 64, 64), jnp.float32),
         "input_ids": jnp.zeros((1, 9), jnp.int64),
         "attention_mask": jnp.ones((1, 9), jnp.int64)})
    c = [0]

    def mk(s):
        c[0] += 1
        return jnp.asarray(0.02 * np.random.RandomState(c[0]).randn(*s.shape), s.dtype)

    inner = jax.tree_util.tree_map(mk, shapes)["params"]
    ckpt = str(tmp_path / "step-400.pt")
    export_reference_pt(inner, ckpt)

    # --- build the argv FROM the script template ----------------------------
    values = {"--name": "parity-eval", "--checkpoint": ckpt, "--seed": "1024",
              "--model": "base_with_text", "--patch_size": "16",
              "--dropout": "0", "--fp16": "False", "--logger": "csv"}
    values.update(resized)
    values.update({k: v for k, v in substituted.items() if v is not None})
    argv = []
    for flag in dict.fromkeys(script_flags):  # script order, deduped
        if flag in substituted and substituted[flag] is None:
            continue
        argv.append(flag)
        if flag in values:
            argv.append(values[flag])
        elif flag not in ("--gt_metrics",):  # store_true flags take no value
            raise AssertionError(f"parity_eval.sh passes {flag} but the "
                                 "rehearsal has no value for it — update the test")
    argv += ["--out_dir", str(tmp_path / "out")]

    from lc2is_tpu.cli import evaluate as evaluate_cli

    metrics = evaluate_cli.main(argv)
    # the three numbers the parity run will quote (script header)
    for key in ("eval_mIOU_label", "eval_mIOU_gt", "eval_mIOU_dataset"):
        assert key in metrics, (key, sorted(metrics))
        assert np.isfinite(metrics[key]), (key, metrics[key])
