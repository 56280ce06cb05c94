"""Shared test fixtures."""

from image_editing_framework_tpu.models.tokenizer import WordTokenizer


class FakeTokenizer(WordTokenizer):
    """Word-level tokenizer with CLIP-like BOS/EOS framing for mapper tests."""

    def __init__(self):
        super().__init__(vocab_size=64)
