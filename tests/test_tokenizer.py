"""CLIP BPE tokenizer correctness on a handcrafted vocab."""

import numpy as np
import pytest

from image_editing_framework_tpu.models.tokenizer import CLIPTokenizer, WordTokenizer


@pytest.fixture()
def tok():
    # vocab: characters + merged pieces with end-of-word markers
    pieces = [
        "<|startoftext|>", "<|endoftext|>",
        "a", "c", "t", "s", "a</w>", "t</w>", "s</w>",
        "ca", "cat</w>", "at</w>", "ts</w>", "cats</w>",
    ]
    vocab = {p: i for i, p in enumerate(pieces)}
    merges = [
        ("c", "a"),        # c a -> ca
        ("a", "t</w>"),    # a t</w> -> at</w>
        ("ca", "t</w>"),   # ca t</w> -> cat</w>
        ("t", "s</w>"),    # t s</w> -> ts</w>
        ("ca", "ts</w>"),  # ca ts</w> -> cats</w>
    ]
    return CLIPTokenizer(vocab, merges)


def test_bpe_merges(tok):
    # "cat" -> c a t</w> -> ca t</w> -> cat</w>
    ids = tok.encode("cat")
    assert ids == [tok.bos_id, tok.vocab["cat</w>"], tok.eos_id]
    # "cats" -> c a t s</w> -> ca t s</w> -> ca ts</w> -> cats</w>
    ids = tok.encode("cats")
    assert ids == [tok.bos_id, tok.vocab["cats</w>"], tok.eos_id]
    # "a" alone: single char with end-of-word marker, no merge needed
    ids = tok.encode("a")
    assert ids == [tok.bos_id, tok.vocab["a</w>"], tok.eos_id]


def test_whitespace_and_case_cleanup(tok):
    assert tok.encode("  CAT   a ") == tok.encode("cat a")


def test_decode_token_strips_marker(tok):
    assert tok.decode_token(tok.vocab["cat</w>"]) == "cat"
    assert tok.decode_token(tok.vocab["ca"]) == "ca"


def test_encode_padded(tok):
    out = tok.encode_padded(["cat", "cat a"])
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
    assert out[0, 0] == tok.bos_id and out[0, 2] == tok.eos_id
    # padding is EOS (CLIP's pad token)
    assert (out[0, 3:] == tok.eos_id).all()


def test_truncation(tok):
    long = " ".join(["cat"] * 100)
    ids = tok.encode(long)
    assert len(ids) == 77 and ids[-1] == tok.eos_id


def test_word_tokenizer_protocol():
    wt = WordTokenizer(vocab_size=64)
    ids = wt.encode("a cat sat")
    assert ids[0] == wt.bos_id and ids[-1] == wt.eos_id
    assert wt.decode_token(ids[2]) == "cat"
    padded = wt.encode_padded(["a cat"])
    assert padded.shape == (1, 77)
