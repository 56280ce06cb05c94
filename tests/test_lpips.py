"""LPIPS behavior + torchvision-parity (random weights through the mapper)."""

import numpy as np
import pytest

from image_editing_framework_tpu.eval.lpips import LPIPS, _VGG16_CONVS


@pytest.mark.slow
def test_lpips_behavior():
    m = LPIPS()
    # real LPIPS linear heads are non-negative; enforce for the random net
    import jax

    m.params = jax.tree_util.tree_map(lambda x: abs(x), m.params)
    rng = np.random.RandomState(0)
    a = rng.randint(0, 255, (1, 64, 64, 3), np.uint8)
    b = rng.randint(0, 255, (1, 64, 64, 3), np.uint8)
    assert m(a, a) == pytest.approx(0.0, abs=1e-6)
    dab = m(a, b)
    assert dab > 0
    assert m(b, a) == pytest.approx(dab, rel=1e-5)


def test_lpips_vgg_parity_vs_torchvision_arch():
    """Feature-extractor parity vs a PyTorch VGG16 with random weights."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    # build torchvision-like features sequential (conv/relu/pool layout)
    layers, tv_idx = [], {}
    idx = 0
    conv_i = 0
    in_ch = 3
    for ch, expect_idx in _VGG16_CONVS:
        conv = tnn.Conv2d(in_ch, ch, 3, padding=1)
        assert idx == expect_idx, (idx, expect_idx)
        layers.append(conv)
        tv_idx[conv_i] = idx
        idx += 1
        layers.append(tnn.ReLU())
        idx += 1
        if conv_i in (1, 3, 6, 9):
            layers.append(tnn.MaxPool2d(2))
            idx += 1
        in_ch = ch
        conv_i += 1
    torch.manual_seed(0)
    feats = tnn.Sequential(*layers).eval()
    # scale weights down to keep activations finite through 13 layers
    with torch.no_grad():
        for m in feats:
            if isinstance(m, tnn.Conv2d):
                m.weight.mul_(0.1)

    vgg_state = {f"features.{k}": v.numpy() for k, v in feats.state_dict().items()}
    lin_state = {
        f"lin{i}.model.1.weight": np.abs(
            np.random.RandomState(i).randn(1, c, 1, 1).astype(np.float32)
        )
        for i, c in enumerate([64, 128, 256, 512, 512])
    }
    m = LPIPS.from_torch_files(vgg_state, lin_state)

    rng = np.random.RandomState(1)
    a = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    b = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    ours = m(a, b)

    # torch-side LPIPS computation
    from image_editing_framework_tpu.eval.lpips import _SHIFT, _SCALE, _TAPS

    def tv_feats(x):
        x = (x - torch.tensor(_SHIFT).view(1, 3, 1, 1)) / torch.tensor(_SCALE).view(1, 3, 1, 1)
        taps, ci = [], 0
        for mseq in feats:
            x = mseq(x)
            if isinstance(mseq, tnn.ReLU):
                if ci in _TAPS:
                    taps.append(x)
                ci += 1
        return taps

    with torch.no_grad():
        ta = tv_feats(torch.tensor(a.transpose(0, 3, 1, 2)))
        tb = tv_feats(torch.tensor(b.transpose(0, 3, 1, 2)))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(ta, tb)):
            na = xa / (xa.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            nb = xb / (xb.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            d = (na - nb) ** 2
            w = torch.tensor(lin_state[f"lin{i}.model.1.weight"])
            total += (d * w).sum(1, keepdim=True).mean().item()
    assert ours == pytest.approx(total, rel=1e-3)
