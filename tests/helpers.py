"""Shared test fixtures: fake tokenizer, tiny model configs."""

from __future__ import annotations

from typing import List


class FakeTokenizer:
    """Word-level tokenizer with CLIP-like BOS/EOS framing for mapper tests."""

    BOS = 0
    EOS = 1

    def __init__(self):
        self.vocab = {}
        self.inv = {}

    def _id(self, word: str) -> int:
        if word not in self.vocab:
            idx = len(self.vocab) + 2
            self.vocab[word] = idx
            self.inv[idx] = word
        return self.vocab[word]

    def encode(self, text: str) -> List[int]:
        return [self.BOS] + [self._id(w) for w in text.split(" ") if w] + [self.EOS]

    def decode_token(self, token_id: int) -> str:
        return self.inv.get(token_id, "")
