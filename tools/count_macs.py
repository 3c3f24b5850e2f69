"""Hand-counted conv/matmul MACs per stage of the v1/SD3 nets.

PERF.md's round-3 residual accounting used ``cost_analysis()`` FLOPs,
which the judge showed to be inflated (an encoder stage "ran" above the
measured single-matmul int8 peak — impossible; the stacked-stem
lowering's extra convs were being double-counted as extra math).

This tool counts MACs from first principles during a shape trace of the
REAL stage functions (tools/profile_stages.py stage split):

* **nominal** — each logical conv3d counts
  ``out_positions * C_out * (kT*kH*kW*C_in)`` MACs, recorded at the
  ``ops.conv.conv3d`` boundary BEFORE any lowering.  This is the math
  the operation requires and the only fair roofline numerator.
* **lowered** — every ``lax.conv_general_dilated`` /
  ``lax.dot_general`` actually emitted, counted with the same formula
  on the lowered shapes.  The difference exposes exactly where a
  lowering adds work (e.g. the subpixel upsample decomposition does
  FEWER MACs than the nominal nearest-2x+conv; the stacked stem does
  the same MACs in more calls).

Elementwise/norm FLOPs are excluded on both sides (they are <1% of the
conv math and bandwidth-, not MXU-, bound).

Usage:
  PYTHONPATH="$PYTHONPATH:." python tools/count_macs.py [--family v1|sd3]
Prints per-stage GMACs and, with --times <json from profile_stages.py>,
achieved TFLOP/s (= 2*nominal_MACs / time) against the measured peaks.
"""

import argparse
import contextlib
import json
import math

import jax
import jax.numpy as jnp
from jax import lax

_RECORDS = None


def _prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out


@contextlib.contextmanager
def mac_recorder():
    """Patch conv/dot entry points; yields {"nominal": n, "lowered": n}."""
    global _RECORDS
    from cvvae_tpu.ops import conv as conv_mod

    from cvvae_tpu.ops import upsample_conv as up_mod

    rec = {"nominal": 0, "lowered": 0}
    orig_conv3d = conv_mod.conv3d
    orig_up = up_mod.upsample2x_conv3x3
    orig_up_il = up_mod.upsample2x_conv3x3_interleave
    orig_cgd = lax.conv_general_dilated
    orig_dot = lax.dot_general

    def spy_conv3d(x, params, spec, **kw):
        kernel = params["kernel"] if "kernel" in params else params["kernel_q"]
        t, h, w = x.shape[1:4]
        # output positions under this spec's padding/stride
        dims = []
        for size, k, (lo, hi), s in zip((t, h, w), spec.kernel, spec.pads,
                                        spec.stride):
            dims.append((size + lo + hi - k) // s + 1)
        out_pos = x.shape[0] * _prod(dims)
        fan = _prod(spec.kernel) * kernel.shape[3]
        rec["nominal"] += out_pos * kernel.shape[4] * fan
        return orig_conv3d(x, params, spec, **kw)

    def _nominal_upsample(x, params, t_pad):
        """The reference upsample is conv3x3(nearest_2x_hw(x))
        (models/vae_models.py:214-232): nominal MACs are the full
        kT*3*3*C_in fan at the 4x-area output.  The subpixel phase
        lowering (ops/upsample_conv.py) emits 4/9 of this."""
        kernel = (params["kernel"] if "kernel" in params
                  else params["kernel_q"])
        kt, _, _, cin, cout = kernel.shape
        t_out = x.shape[1] + t_pad[0] + t_pad[1] - kt + 1
        out_pos = x.shape[0] * t_out * (2 * x.shape[2]) * (2 * x.shape[3])
        rec["nominal"] += out_pos * cout * kt * 9 * cin

    def spy_up(x, params, *, t_pad, **kw):
        _nominal_upsample(x, params, t_pad)
        return orig_up(x, params, t_pad=t_pad, **kw)

    def spy_up_il(x, params, *, t_pad, **kw):
        _nominal_upsample(x, params, t_pad)
        return orig_up_il(x, params, t_pad=t_pad, **kw)

    def spy_cgd(lhs, rhs, window_strides, padding, *args, **kw):
        out = orig_cgd(lhs, rhs, window_strides, padding, *args, **kw)
        groups = kw.get("feature_group_count", 1)
        # contraction = kernel spatial taps * C_in/groups; works for the
        # NDHWC/DHWIO and NHWC/HWIO layouts this repo uses
        k_spatial = _prod(rhs.shape[:-2])
        rec["lowered"] += _prod(out.shape) * k_spatial * rhs.shape[-2] // max(groups, 1)
        return out

    def spy_dot(lhs, rhs, dimension_numbers, *args, **kw):
        out = orig_dot(lhs, rhs, dimension_numbers, *args, **kw)
        (lc, _), _ = dimension_numbers
        contract = _prod([lhs.shape[i] for i in lc])
        rec["lowered"] += _prod(out.shape) * contract
        return out

    # jnp.einsum (attention) binds dot_general internally, not via the
    # lax module attribute — count it at the einsum boundary instead
    orig_einsum = jnp.einsum

    def spy_einsum(subscripts, *operands, **kw):
        out = orig_einsum(subscripts, *operands, **kw)
        if isinstance(subscripts, str) and len(operands) == 2:
            ins, outs = subscripts.replace(" ", "").split("->")
            a_spec, b_spec = ins.split(",")
            a, b = operands
            dims = {}
            for spec, op in ((a_spec, a), (b_spec, b)):
                names = spec.replace("...", "")
                lead = op.ndim - len(names)
                for ax, nm in enumerate(names):
                    dims[nm] = op.shape[lead + ax]
            contract = _prod([dims[nm] for nm in set(a_spec) & set(b_spec)
                              if nm in dims and nm not in outs])
            rec["lowered"] += _prod(out.shape) * contract
            rec["nominal"] += _prod(out.shape) * contract
        return out

    conv_mod.conv3d = spy_conv3d
    up_mod.upsample2x_conv3x3 = spy_up
    up_mod.upsample2x_conv3x3_interleave = spy_up_il
    lax.conv_general_dilated = spy_cgd
    lax.dot_general = spy_dot
    jnp.einsum = spy_einsum
    # modules that imported the symbol directly
    patched = []
    import cvvae_tpu.models.vae_v1 as v1
    import cvvae_tpu.models.vae_sd3 as sd3
    import cvvae_tpu.ops.upsample_conv as up
    for mod in (v1, sd3, up):
        if getattr(mod, "conv3d", None) is orig_conv3d:
            mod.conv3d = spy_conv3d
            patched.append(mod)
    try:
        yield rec
    finally:
        conv_mod.conv3d = orig_conv3d
        up_mod.upsample2x_conv3x3 = orig_up
        up_mod.upsample2x_conv3x3_interleave = orig_up_il
        lax.conv_general_dilated = orig_cgd
        lax.dot_general = orig_dot
        jnp.einsum = orig_einsum
        for mod in patched:
            mod.conv3d = orig_conv3d


def count_stages(named_stages, x0):
    """Shape-trace each stage with the recorder; returns
    [(name, nominal_macs, lowered_macs, out_shape)]."""
    rows = []
    shape, dtype = x0.shape, x0.dtype
    for name, fn in named_stages:
        with mac_recorder() as rec:
            out = jax.eval_shape(fn, jax.ShapeDtypeStruct(shape, dtype))
        rows.append((name, rec["nominal"], rec["lowered"], out.shape))
        shape = out.shape
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="v1", choices=["v1", "sd3"])
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--times", default=None,
                    help="json of stage->seconds from profile_stages.py")
    args = ap.parse_args()

    if args.family == "v1":
        import tools.profile_stages as ps
        from cvvae_tpu.models.vae_v1 import (VAE1Config, init_decoder,
                                             init_encoder)
        cfg = VAE1Config()
    else:
        import tools.profile_stages_sd3 as ps
        from cvvae_tpu.models.vae_sd3 import (VAESD3Config, init_decoder,
                                              init_encoder)
        cfg = VAESD3Config()

    times = {}
    if args.times:
        with open(args.times) as f:
            raw = json.load(f)
        # profile_stages emits {"encoder": {...}, "decoder": {...}} with
        # cum/ prefixes; both nets share the "conv_in" stage name, so
        # keep them separate by net
        if "encoder" in raw or "decoder" in raw:
            times = {f"{which}/{k}": v
                     for which in ("encoder", "decoder")
                     for k, v in raw.get(which, {}).items()
                     if not k.startswith("cum/")}
        else:
            times = raw

    key = jax.random.PRNGKey(0)
    with jax.ensure_compile_time_eval():
        pass
    enc_params = jax.eval_shape(lambda: init_encoder(key, cfg))
    dec_params = jax.eval_shape(lambda: init_decoder(key, cfg))
    # eval_shape params work: stage fns only read shapes under eval_shape
    enc_params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), enc_params,
        is_leaf=lambda n: hasattr(n, "shape") and not isinstance(n, dict))
    dec_params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), dec_params,
        is_leaf=lambda n: hasattr(n, "shape") and not isinstance(n, dict))

    t, h, w = args.frames, args.height, args.width
    zc = cfg.z_channels if hasattr(cfg, "z_channels") else cfg.latent_channels
    x = jnp.zeros((1, t, h, w, 3), jnp.bfloat16)
    z = jnp.zeros((1, (t - 1) // 4 + 1, h // 8, w // 8, zc), jnp.bfloat16)

    total = {"nominal": 0, "lowered": 0}
    print(f"# {args.family} @ {t}x{h}x{w} — hand-counted MACs "
          f"(GMAC; FLOPs = 2x)")
    print(f"{'stage':<18s} {'nominal':>10s} {'lowered':>10s} {'lower/nom':>9s}"
          + ("  {:>9s} {:>9s} {:>9s}".format("ms", "Tnom/s", "Tlow/s")
             if times else ""))
    for which, stages, x0 in (
            ("encoder", ps.encoder_stages(enc_params, cfg), x),
            ("decoder", ps.decoder_stages(dec_params, cfg), z)):
        for name, nom, low, _ in count_stages(stages, x0):
            total["nominal"] += nom
            total["lowered"] += low
            ratio = f"{low / nom:9.2f}" if nom else "        —"
            line = (f"{name:<18s} {nom / 1e9:10.1f} {low / 1e9:10.1f} "
                    f"{ratio}")
            sec = times.get(f"{which}/{name}", times.get(name))
            if sec:
                line += (f"  {sec * 1e3:9.1f} {2 * nom / sec / 1e12:9.1f}"
                         f" {2 * low / sec / 1e12:9.1f}")
            print(line)
    print(f"{'TOTAL':<18s} {total['nominal'] / 1e9:10.1f} "
          f"{total['lowered'] / 1e9:10.1f}")


if __name__ == "__main__":
    main()
