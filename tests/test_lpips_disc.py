"""LPIPS (VGG16 + lin heads) parity vs a torch implementation with shared
random weights, and discriminator shape/behavior contracts."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from cvvae_tpu.models.lpips import load_lpips_params, lpips_distance


def build_torch_vgg16_features():
    """torchvision vgg16().features layout (conv indices
    0,2,5,7,10,12,14,17,19,21,24,26,28 with ReLU after each conv and
    MaxPool at 4,9,16,23,30)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    c_in = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(c_in, v, 3, padding=1), nn.ReLU(inplace=False)]
            c_in = v
    return nn.Sequential(*layers)


class TorchLPIPS(nn.Module):
    """The reference metric (lpips/loss/lpips.py:12-147) on torch."""

    def __init__(self):
        super().__init__()
        self.features = build_torch_vgg16_features()
        self.taps = [3, 8, 15, 22, 29]  # after relu1_2..relu5_3
        self.chns = [64, 128, 256, 512, 512]
        self.lins = nn.ModuleList(
            [nn.Conv2d(c, 1, 1, bias=False) for c in self.chns])
        self.register_buffer("shift",
                             torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer("scale",
                             torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def feats(self, x):
        out = []
        h = (x - self.shift) / self.scale
        for i, layer in enumerate(self.features):
            h = layer(h)
            if i in self.taps:
                out.append(h)
        return out

    @staticmethod
    def norm(x, eps=1e-10):
        n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True) + eps)
        return x / (n + eps)

    def forward(self, a, b):
        fa, fb = self.feats(a), self.feats(b)
        val = 0
        for x, y, lin in zip(fa, fb, self.lins):
            d = (self.norm(x) - self.norm(y)) ** 2
            val = val + lin(d).mean([2, 3], keepdim=True)
        return val


def test_lpips_parity():
    torch.manual_seed(0)
    ref = TorchLPIPS().eval()
    with torch.no_grad():
        for lin in ref.lins:
            lin.weight.abs_()
    vgg_state = {k: v for k, v in ref.features.state_dict().items()}
    lin_state = {f"lin{i}.model.1.weight": ref.lins[i].weight.detach()
                 for i in range(5)}
    params = load_lpips_params(vgg_state, lin_state)

    torch.manual_seed(1)
    a = torch.rand(2, 3, 64, 64) * 2 - 1
    b = torch.rand(2, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        ref_val = ref(a, b).numpy().reshape(2)
    got = lpips_distance(params,
                         jnp.asarray(a.numpy().transpose(0, 2, 3, 1)),
                         jnp.asarray(b.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).reshape(2), ref_val,
                               atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_disc3d_output_contract():
    """Reference smoke check (lpips/model/model.py:260-271): input
    (2,3,1,256,256) -> patch logits downsampled 8x."""
    from cvvae_tpu.models.discriminator import (
        Disc3DConfig, apply_disc3d, init_disc3d)
    cfg = Disc3DConfig(ndf=16, n_layers=4, norm_groups=8, half_3d=False)
    params = init_disc3d(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 64, 64, 3))
    y = apply_disc3d(params, x, cfg)
    assert y.shape == (2, 1, 8, 8, 1)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_disc2d_output_contract():
    from cvvae_tpu.models.discriminator import (
        Disc2DConfig, apply_disc2d, init_disc2d)
    cfg = Disc2DConfig(ndf=8, n_layers=3)
    params = init_disc2d(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 64, 64, 3))
    y = apply_disc2d(params, x, cfg, train=True)
    # 4x4 stride-2 x3 then two stride-1: 64 -> 8 - receptive offsets
    assert y.shape[0] == 1 and y.shape[1] == 4 and y.shape[-1] == 1
    assert np.isfinite(np.asarray(y)).all()


def test_batch_norm_train_running_stats_match_torch():
    """batch_norm_train's running update == torch.nn.BatchNorm2d
    (momentum 0.1, unbiased running var)."""
    from cvvae_tpu.ops.norm import batch_norm_train
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 6, 5, 8)).astype(np.float32)  # NCHW for torch
    bn = torch.nn.BatchNorm2d(6, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(
            rng.normal(1.0, 0.02, size=6).astype(np.float32)))
        bn.bias.zero_()
    y_t = bn(torch.from_numpy(x)).detach().numpy()

    params = {
        "scale": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.zeros((6,)),
        "mean": jnp.zeros((6,)),
        "var": jnp.ones((6,)),
    }
    x_j = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))  # NHWC
    y_j, stats = batch_norm_train(x_j, params)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)),
                               y_t, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               bn.running_mean.numpy(), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               bn.running_var.numpy(), atol=1e-6, rtol=1e-5)


def test_disc2d_threads_bn_running_stats():
    """update_stats=True returns advanced BN running stats that the
    inference path then consumes; logits are unchanged by the flag."""
    from cvvae_tpu.models.discriminator import (
        Disc2DConfig, apply_disc2d, init_disc2d)
    cfg = Disc2DConfig(ndf=8, n_layers=3)
    params = init_disc2d(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 32, 32, 3))
    y_plain = apply_disc2d(params, x, cfg, train=True)
    y, new_params = apply_disc2d(params, x, cfg, train=True,
                                 update_stats=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_plain))
    changed = False
    for old, new in zip(params["layers"], new_params["layers"]):
        if "bn" in old:
            assert not np.allclose(np.asarray(old["bn"]["mean"]),
                                   np.asarray(new["bn"]["mean"]))
            changed = True
            # conv params are threaded through untouched
            assert old["conv"] is new["conv"]
    assert changed
    # eval mode consumes the updated stats (different output from the
    # stale-stats eval pass)
    y_eval_new = apply_disc2d(new_params, x, cfg, train=False)
    y_eval_old = apply_disc2d(params, x, cfg, train=False)
    assert not np.allclose(np.asarray(y_eval_new), np.asarray(y_eval_old))


@pytest.mark.slow
def test_disc2d_actnorm_golden_vs_reference():
    """NLayerDiscriminator(use_actnorm=True) golden parity vs the
    reference (lpips/util.py:45-104 ActNorm lazy data-dependent init;
    model.py:36-42 selects it and keeps conv biases).  Two train-mode
    forwards: the first initialises ActNorm from the batch, the second
    consumes the stored loc/scale."""
    import tests.torch_ref as tr
    if not tr.reference_available():
        pytest.skip("reference repo not mounted")
    mod = tr.load_reference_module(
        "lvdm.modules.autoencoding.lpips.model.model")
    from cvvae_tpu.models.discriminator import (
        Disc2DConfig, apply_disc2d, init_disc2d)

    torch.manual_seed(0)
    ref = mod.NLayerDiscriminator(input_nc=3, ndf=8, n_layers=3,
                                  use_actnorm=True).train()
    cfg = Disc2DConfig(ndf=8, n_layers=3, use_actnorm=True)
    params = init_disc2d(jax.random.PRNGKey(0), cfg)
    convs = [m for m in ref.main if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == len(params["layers"])
    for layer, c in zip(params["layers"], convs):
        w = c.weight.detach().numpy()                  # (O, I, 4, 4)
        layer["conv"]["kernel"] = jnp.asarray(
            w.transpose(2, 3, 1, 0))[None]             # (1, 4, 4, I, O)
        assert c.bias is not None  # use_bias=True with ActNorm
        layer["conv"]["bias"] = jnp.asarray(c.bias.detach().numpy())
        if "an" in layer:
            assert layer["an"]["loc"].shape == (w.shape[0],)

    def run_ref(x):
        with torch.no_grad():
            return ref(x).numpy()

    def run_jax(p, x):
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))[:, None]
        y, p2 = apply_disc2d(p, xj, cfg, train=True, update_stats=True)
        return np.asarray(y[:, 0]).transpose(0, 3, 1, 2), p2

    torch.manual_seed(1)
    x1, x2 = torch.randn(2, 3, 32, 32), torch.randn(2, 3, 32, 32)
    y1, params2 = run_jax(params, x1)
    np.testing.assert_allclose(y1, run_ref(x1), atol=1e-4, rtol=1e-4)
    # flag flipped; loc/scale now stored
    for layer in params2["layers"]:
        if "an" in layer:
            assert int(layer["an"]["initialized"]) == 1
            assert not np.allclose(np.asarray(layer["an"]["loc"]), 0.0)
    y2, _ = run_jax(params2, x2)
    np.testing.assert_allclose(y2, run_ref(x2), atol=1e-4, rtol=1e-4)
    # eval mode also consumes the stored statistics
    ref.eval()
    with torch.no_grad():
        y_ref_eval = ref(x2).numpy()
    xj = jnp.asarray(x2.numpy().transpose(0, 2, 3, 1))[:, None]
    y_eval = apply_disc2d(params2, xj, cfg, train=False)
    np.testing.assert_allclose(
        np.asarray(y_eval[:, 0]).transpose(0, 3, 1, 2), y_ref_eval,
        atol=1e-4, rtol=1e-4)


def test_convert_lpips_tool_roundtrip(tmp_path):
    """tools/convert_lpips.py end-to-end on synthetic artifacts shaped
    like the real ones (torchvision vgg16 'features.*' keys; reference
    vgg.pth lin keys + extra scaling_layer buffers): the written blob
    loads through train.py's loader and the resulting JAX LPIPS matches
    the torch metric carrying the same weights."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import convert_lpips

    torch.manual_seed(3)
    ref = TorchLPIPS().eval()
    with torch.no_grad():
        for lin in ref.lins:
            lin.weight.abs_()
    vgg_path, lin_path, out_path = (str(tmp_path / n) for n in
                                    ("vgg16.pth", "vgg.pth", "blob.pth"))
    # torchvision layout: features.N.* plus classifier keys (dropped)
    full = {f"features.{k}": v for k, v in ref.features.state_dict().items()}
    full["classifier.0.weight"] = torch.zeros(1)
    torch.save(full, vgg_path)
    lin_state = {f"lin{i}.model.1.weight": ref.lins[i].weight.detach()
                 for i in range(5)}
    lin_state["scaling_layer.shift"] = torch.zeros(1, 3, 1, 1)  # extra key
    torch.save(lin_state, lin_path)

    blob = convert_lpips.convert(vgg_path, lin_path, out_path,
                                 check_md5=False)
    assert set(blob) == {"vgg", "lins"}
    reloaded = torch.load(out_path, map_location="cpu", weights_only=True)
    from cvvae_tpu.models.lpips import load_lpips_params, lpips_distance
    params = load_lpips_params(reloaded["vgg"], reloaded["lins"])

    torch.manual_seed(4)
    a = torch.rand(2, 3, 64, 64) * 2 - 1
    b = torch.rand(2, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        ref_val = ref(a, b).numpy().reshape(2)
    got = lpips_distance(params,
                         jnp.asarray(a.numpy().transpose(0, 2, 3, 1)),
                         jnp.asarray(b.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).reshape(2), ref_val,
                               atol=1e-5, rtol=1e-4)


def test_convert_lpips_real_artifacts():
    """Golden parity on the REAL pretrained weights when present
    (CVVAE_VGG16_PTH + CVVAE_LPIPS_PTH env vars, or ./artifacts/);
    skipped otherwise — no network in this environment."""
    import os
    vgg = os.environ.get("CVVAE_VGG16_PTH", "artifacts/vgg16-397923af.pth")
    lin = os.environ.get("CVVAE_LPIPS_PTH", "artifacts/vgg.pth")
    if not (os.path.exists(vgg) and os.path.exists(lin)):
        pytest.skip("pretrained LPIPS artifacts not present")
    import sys
    import tempfile
    sys.path.insert(0, "/root/repo/tools")
    import convert_lpips
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "blob.pth")
        blob = convert_lpips.convert(vgg, lin, out)
    ref = TorchLPIPS().eval()
    ref.features.load_state_dict(blob["vgg"])
    for i in range(5):
        ref.lins[i].weight.data.copy_(blob["lins"][f"lin{i}.model.1.weight"])
    from cvvae_tpu.models.lpips import load_lpips_params, lpips_distance
    params = load_lpips_params(blob["vgg"], blob["lins"])
    torch.manual_seed(5)
    a = torch.rand(2, 3, 64, 64) * 2 - 1
    b = torch.rand(2, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        ref_val = ref(a, b).numpy().reshape(2)
    got = lpips_distance(params,
                         jnp.asarray(a.numpy().transpose(0, 2, 3, 1)),
                         jnp.asarray(b.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).reshape(2), ref_val,
                               atol=1e-5, rtol=1e-4)
