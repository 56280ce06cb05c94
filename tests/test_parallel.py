"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.models import configs
from image_editing_framework_tpu.models.unet import UNet2DCondition
from image_editing_framework_tpu.parallel import mesh as mesh_lib
from image_editing_framework_tpu.parallel import sharding


@pytest.fixture(scope="module")
def devices8():
    assert len(jax.devices()) >= 8, "conftest must set 8 virtual CPU devices"
    return jax.devices()[:8]


def test_mesh_shapes(devices8):
    m = mesh_lib.make_mesh(devices=devices8)
    assert m.shape == {"data": 8, "tensor": 1}
    m = mesh_lib.make_mesh(tensor=4, devices=devices8)
    assert m.shape == {"data": 2, "tensor": 4}


def test_param_specs_pick_attention_kernels():
    unet = UNet2DCondition(configs.TINY_UNET)
    x = jnp.zeros((2, 16, 16, 4))
    ctx = jnp.zeros((2, 77, 32))
    params = unet.init(jax.random.PRNGKey(0), x, 0, ctx)
    specs = sharding.unet_param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    seen_col = seen_row = seen_rep = 0
    for path, spec in flat:
        names = tuple(k.key for k in path)
        if "to_q" in names and names[-1] == "kernel":
            assert spec == jax.sharding.PartitionSpec(None, "tensor")
            seen_col += 1
        if "to_out_0" in names and names[-1] == "kernel":
            assert spec == jax.sharding.PartitionSpec("tensor", None)
            seen_row += 1
        if "conv1" in names and names[-1] == "kernel":
            assert spec == jax.sharding.PartitionSpec()
            seen_rep += 1
    assert seen_col and seen_row and seen_rep


@pytest.mark.slow
def test_sharded_unet_forward_matches_single_device(devices8):
    """TP+DP sharded forward == replicated forward."""
    m = mesh_lib.make_mesh(tensor=4, devices=devices8)
    unet = UNet2DCondition(configs.TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (4, 77, 32))
    params = unet.init(jax.random.PRNGKey(2), x, 0, ctx)
    base, _ = unet.apply(params, x, 10, ctx)

    sharded = sharding.shard_params(params, m)
    data = mesh_lib.data_sharding(m)
    xs = jax.device_put(x, data)
    ctxs = jax.device_put(ctx, data)

    @jax.jit
    def fwd(p, a, c):
        return unet.apply(p, a, 10, c)[0]

    out = fwd(sharded, xs, ctxs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-5)


@pytest.mark.slow
def test_sharded_train_step_runs(devices8):
    m = mesh_lib.make_mesh(tensor=2, devices=devices8)
    unet = UNet2DCondition(configs.TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (4, 77, 32))
    tgt = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    params = unet.init(jax.random.PRNGKey(3), x, 0, ctx)
    init, jitted = sharding.make_sharded_train_step(unet, m)
    sp, opt_state = init(params)
    step = jitted(sp, opt_state)
    t = jnp.asarray(10)
    sp2, opt_state, loss = step(sp, opt_state, x, t, ctx, tgt)
    assert jnp.isfinite(loss)
    # params actually changed
    l0 = jax.tree_util.tree_leaves(sp)[0]
    l1 = jax.tree_util.tree_leaves(sp2)[0]
    assert float(jnp.abs(l0 - l1).max()) > 0
