"""Tokenizer contract tests (offline fallback path; the real BPE loads when
LC2IS_BPE_PATH points at a CLIP merges file)."""

import numpy as np

from lc2is_tpu.ops.bpe import EOT, SOT, bytes_to_unicode, tokenize, tokenize_batch_padded


def test_tokenize_shape_and_specials():
    out = tokenize("a photo of a wall", context_length=10)
    assert out.shape == (1, 10)
    assert out[0, 0] == SOT
    assert EOT in out[0]
    eot_pos = int(np.argmax(out[0] == EOT))
    assert np.all(out[0, eot_pos + 1 :] == 0)  # zero padding after EOT


def test_tokenize_truncation():
    long = " ".join(["word"] * 50)
    out = tokenize(long, context_length=8, truncate=True)
    assert out.shape == (1, 8)
    assert out[0, -1] == EOT  # truncated sequences end with EOT


def test_tokenize_deterministic():
    a = tokenize(["wall", "sky, tree"], context_length=12)
    b = tokenize(["wall", "sky, tree"], context_length=12)
    assert np.array_equal(a, b)


def test_tokenize_batch_padded():
    ids, mask = tokenize_batch_padded(["wall", "a much longer description of a thing"])
    assert ids.shape == mask.shape
    assert mask[0].sum() < mask[1].sum()  # shorter text -> fewer real tokens
    assert np.all((ids != 0) == (mask == 1))


def test_ids_in_clip_vocab_range():
    out = tokenize("grass; building-facade 42!", context_length=20)
    assert out.max() <= EOT and out.min() >= 0


def test_bytes_to_unicode_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
