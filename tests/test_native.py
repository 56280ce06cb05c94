"""Native C++ safetensors mmap reader vs the reference safetensors package."""

import numpy as np
import pytest

from image_editing_framework_tpu import native


@pytest.fixture(scope="module")
def st_file(tmp_path_factory):
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp("st") / "weights.safetensors"
    rng = np.random.RandomState(0)
    tensors = {
        "a.weight": rng.randn(64, 32).astype(np.float32),
        "a.bias": rng.randn(64).astype(np.float32),
        "b.weight": rng.randn(4, 4, 3, 3).astype(np.float16),
        "c.count": np.arange(10, dtype=np.int64),
    }
    save_file(tensors, str(path))
    return str(path), tensors


def test_native_reader_matches(st_file):
    if not native.available():
        pytest.skip("no C++ toolchain")
    path, tensors = st_file
    f = native.MmapSafetensors(path)
    assert set(f.keys()) == set(tensors)
    for k, v in tensors.items():
        got = f[k]
        assert got.dtype == v.dtype and got.shape == v.shape
        np.testing.assert_array_equal(got, v)
    f.close()


def test_views_outlive_reader(st_file):
    """Regression: tensor views (and CPU-backend jax aliases of them) must
    keep the mmap alive after the reader object is garbage-collected —
    previously __del__ munmap'ed under live views (use-after-free segfault
    in any pipeline whose params aliased the mapping)."""
    if not native.available():
        pytest.skip("no C++ toolchain")
    import gc

    import jax.numpy as jnp

    path, tensors = st_file
    f = native.MmapSafetensors(path)
    view = f["a.weight"]
    jarr = jnp.asarray(f["a.bias"])  # may zero-copy alias on CPU
    del f
    gc.collect()
    np.testing.assert_array_equal(np.asarray(view), tensors["a.weight"])
    np.testing.assert_array_equal(np.asarray(jarr), tensors["a.bias"])


def test_bf16_widening():
    x = np.array([1.5, -2.25, 0.0], np.float32)
    bf = (x.view(np.uint32) >> 16).astype(np.uint16)  # truncate to bf16
    back = native.bf16_to_f32(bf)
    np.testing.assert_array_equal(back, x)  # these values are bf16-exact


def test_loader_uses_native(st_file):
    if not native.available():
        pytest.skip("no C++ toolchain")
    from image_editing_framework_tpu.models.loader import load_safetensors

    path, tensors = st_file
    ckpt = load_safetensors(path)
    np.testing.assert_array_equal(np.asarray(ckpt["a.weight"]), tensors["a.weight"])
