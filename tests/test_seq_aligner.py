import numpy as np

from image_editing_framework_tpu.ops import seq_aligner, schedules
from tests.helpers import FakeTokenizer


def tok():
    return FakeTokenizer()


def test_replacement_mapper_single_word():
    t = tok()
    m = seq_aligner.get_replacement_mapper_single("a cat sat", "a dog sat", t)
    assert m.shape == (77, 77)
    # one-to-one: permutation-like, identity except the swapped word maps across.
    np.testing.assert_allclose(m.sum(axis=0)[:6], 1.0)
    # token index 2 = "cat"/"dog" (BOS at 0) maps 2 -> 2.
    assert m[2, 2] == 1.0
    assert m[1, 1] == 1.0 and m[3, 3] == 1.0


def test_replacement_mapper_requires_equal_word_count():
    t = tok()
    try:
        seq_aligner.get_replacement_mapper_single("a cat", "a big cat", t)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_refinement_mapper_insertion():
    t = tok()
    mappers, alphas = seq_aligner.get_refinement_mapper(
        ["a cat sat", "a fluffy cat sat"], t
    )
    assert mappers.shape == (1, 77) and alphas.shape == (1, 77)
    m, a = mappers[0], alphas[0]
    # BOS aligns to BOS
    assert m[0] == 0 and a[0] == 1.0
    # "a" -> "a"
    assert m[1] == 1 and a[1] == 1.0
    # "fluffy" (target idx 2) has no source token
    assert a[2] == 0.0
    # "cat" target idx 3 -> source idx 2
    assert m[3] == 2 and a[3] == 1.0
    # "sat" target idx 4 -> source idx 3
    assert m[4] == 3 and a[4] == 1.0


def test_refinement_matrix_equals_gather():
    t = tok()
    mappers, alphas = seq_aligner.get_refinement_mapper(
        ["a cat sat", "a fluffy cat sat"], t
    )
    mat = seq_aligner.refinement_matrix(mappers[0])
    base = np.random.RandomState(0).rand(4, 10, 77).astype(np.float32)
    gathered = base[:, :, np.where(mappers[0] >= 0, mappers[0], 0)]
    via_mat = base @ mat
    valid = alphas[0] > 0
    np.testing.assert_allclose(via_mat[..., valid], gathered[..., valid], rtol=1e-6)


def test_get_word_inds():
    t = tok()
    inds = seq_aligner.get_word_inds("a cat sat on a mat", "cat", t)
    np.testing.assert_array_equal(inds, [2])
    inds = seq_aligner.get_word_inds("a cat sat on a mat", "a", t)
    np.testing.assert_array_equal(inds, [1, 5])


def test_equalizer():
    t = tok()
    eq = seq_aligner.get_equalizer("a smiling cat", "smiling", [2.0, 0.5], t)
    assert eq.shape == (2, 77)
    assert eq[0, 2] == 2.0 and eq[1, 2] == 0.5
    assert eq[0, 1] == 1.0


def test_cross_replace_alpha_default_window():
    t = tok()
    alpha = schedules.cross_replace_alpha(["a cat", "a dog"], 50, 0.8, t)
    assert alpha.shape == (51, 1, 77)
    assert np.all(alpha[: int(0.8 * 51)] == 1.0)
    assert np.all(alpha[int(0.8 * 51):] == 0.0)


def test_cross_replace_alpha_word_override():
    t = tok()
    alpha = schedules.cross_replace_alpha(
        ["a cat sat", "a dog sat"], 50, {"default_": 0.8, "dog": (0.2, 0.6)}, t
    )
    # token idx 2 = "dog" in target prompt
    col = alpha[:, 0, 2]
    assert col[0] == 0.0
    assert col[int(0.2 * 51)] == 1.0
    assert col[int(0.6 * 51)] == 0.0
    # other tokens keep default window
    assert alpha[0, 0, 1] == 1.0


def test_gates():
    g = schedules.self_replace_gate(0.6, 50)
    assert g[:30].all() and not g[30:].any()
    g = schedules.self_replace_gate((0.2, 0.6), 50)
    assert not g[:10].any() and g[10:30].all() and not g[30:].any()

    mg = schedules.masactrl_gate(50, 16, start_step=4, start_layer=10)
    assert mg.shape == (50, 16)
    assert not mg[3].any() and mg[4, 10] and not mg[4, 9]

    qk, conv = schedules.pnp_gates(50, 0.5, 0.8)
    assert qk[:25].all() and not qk[25:].any()
    assert conv[:40].all() and not conv[40:].any()
