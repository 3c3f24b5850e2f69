"""Bit-parity of the zero-window + thin-slab-fix conv decomposition.

`_conv3d_edge_fast` (ops/conv.py) lowers replicate ("edge") padding on
any axes as a zero-window conv plus boundary corrections instead of
materialising a padded copy of the whole tensor.  On this chip it
measured SLOWER in-chain than the materialised pad (PERF.md round 4),
so it ships gated OFF (CVVAE_EDGE_FAST=1 for A/B runs) — but like the
Pallas kernels it stays bit-parity-tested against the materialised-pad
lowering for every padding family the reference uses
(/root/reference/models/vae_blocks3d_sd3.py:16-104,
models/vae_models.py:238-328), including strided downsamplers and
degenerate (window-runs-off-both-ends) extents.  The time-axis-only
special case (`_conv3d_edge_time_fast`) IS the shipping path for causal
convs and is covered both here and by the goldens in test_ops.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from cvvae_tpu.ops.conv import (Conv3DSpec, _DIMENSION_NUMBERS,
                                _conv3d_edge_fast, _edge_pad, conv3d,
                                conv_init)


def _materialized(x, params, spec):
    xp = _edge_pad(x, spec.pads, spec.modes)
    lax_padding = [tuple(p) if m == "zero" else (0, 0)
                   for p, m in zip(spec.pads, spec.modes)]
    y = lax.conv_general_dilated(
        xp, params["kernel"], window_strides=spec.stride,
        padding=lax_padding, dimension_numbers=_DIMENSION_NUMBERS)
    if "bias" in params:
        y = y + params["bias"]
    return y


SPECS = {
    "sd3_plain": Conv3DSpec.sd3_plain(),
    "sd3_causal": Conv3DSpec.sd3_causal(),
    "sd3_down_time": Conv3DSpec.sd3_causal(stride=(2, 2, 2)),
    "sd3_down_space": Conv3DSpec.sd3_plain(stride=(1, 2, 2)),
    "v1_causal": Conv3DSpec.v1_causal(),
    "v1_downsample": Conv3DSpec.v1_downsample(True),
}

SHAPES = [
    (1, 5, 12, 10, 16),
    (1, 1, 12, 10, 16),   # single frame: T window off both ends
    (1, 5, 3, 3, 16),     # minimal spatial extent
    (1, 2, 4, 4, 16),
    (2, 3, 8, 8, 16),
]


@pytest.mark.parametrize("name", sorted(SPECS))
def test_edge_fast_matches_materialized(name):
    spec = SPECS[name]
    for shp in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(1), shp, jnp.float32)
        p = conv_init(jax.random.PRNGKey(2), spec, shp[-1], 24)
        a = _conv3d_edge_fast(x, p["kernel"], spec, None) + p["bias"]
        b = _materialized(x, p, spec)
        assert a.shape == b.shape, (name, shp, a.shape, b.shape)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5,
                                   err_msg=f"{name} {shp}")


@pytest.mark.parametrize("name", sorted(SPECS))
def test_shipping_dispatch_matches_materialized(name):
    """The default conv3d dispatch (time-fast for causal, materialised
    pad for space-edge) equals the straightforward lowering."""
    spec = SPECS[name]
    for shp in SHAPES[:3]:
        x = jax.random.normal(jax.random.PRNGKey(3), shp, jnp.float32)
        p = conv_init(jax.random.PRNGKey(4), spec, shp[-1], 24)
        a = conv3d(x, p, spec)
        b = _materialized(x, p, spec)
        assert a.shape == b.shape, (name, shp, a.shape, b.shape)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5,
                                   err_msg=f"{name} {shp}")


def test_edge_fast_int8_close_to_fp():
    """The gated int8 edge-fast path (quant.conv3d_int8 under
    CVVAE_EDGE_FAST) stays close to the fp conv."""
    from cvvae_tpu.ops import conv as conv_mod
    from cvvae_tpu.ops.quant import quantize_conv_params

    spec = Conv3DSpec.sd3_causal()
    # above INT8_MIN_POSITIONS so the int8 path is taken
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 6, 64, 64, 64),
                          jnp.float32)
    p = conv_init(jax.random.PRNGKey(6), spec, 64, 64)
    ref = conv3d(x, p, spec)
    qp = quantize_conv_params({"c": p}, min_cin=64)["c"]
    assert "kernel_q" in qp

    def check():
        out = conv3d(x, qp, spec)
        err = float(jnp.sqrt(jnp.mean((out - ref) ** 2)))
        sig = float(jnp.sqrt(jnp.mean(ref ** 2)))
        assert err / sig < 0.02, err / sig

    check()                      # default: materialised int8 pad
    old = conv_mod.EDGE_FAST_SPACE
    conv_mod.EDGE_FAST_SPACE = True
    try:
        check()                  # gated: zero-window + slab fixes
    finally:
        conv_mod.EDGE_FAST_SPACE = old
