"""Checkpoint conversion tests: HF dir -> VideoVAE end-to-end, plus
Lightning-style state dicts."""

import json

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import tests.torch_ref as tr

if not tr.reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    """Build a tiny HF checkpoint dir from the reference CVVAEModel."""
    from safetensors.torch import save_file
    mv = tr.load_reference_module("models.modeling_vae")
    torch.manual_seed(0)
    model = mv.CVVAEModel(ch=32, ch_mult=[1, 2, 4, 4], num_res_blocks=2,
                          z_channels=4, tile_spatial_size=None).eval()
    d = tmp_path_factory.mktemp("ckpt")
    cfg = {
        "_class_name": "CVVAEModel", "z_channels": 4, "ch": 32,
        "ch_mult": [1, 2, 4, 4], "num_res_blocks": 2,
        "scaling_factor": 0.18215, "tile_spatial_size": None,
        "en_de_n_frames_a_time": 16,
    }
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file(model.state_dict(), str(d / "model.safetensors"))
    return str(d), model


@pytest.mark.slow
def test_from_pretrained_matches_reference(hf_dir):
    path, ref = hf_dir
    from cvvae_tpu.models.video_vae import VideoVAE
    vae = VideoVAE.from_pretrained(path)
    assert vae.config.family == "v1"
    assert vae.config.net.ch == 32
    assert vae.config.tile_spatial_size is None

    torch.manual_seed(1)
    x = torch.randn(1, 3, 5, 16, 16)
    with torch.no_grad():
        z_ref = ref.encode(x).latent_dist.mode().numpy()
    z = vae.encode(jnp.asarray(x.numpy()), channels_first=True).mode()
    np.testing.assert_allclose(np.asarray(z),
                               z_ref.transpose(0, 2, 3, 4, 1),
                               atol=5e-4, rtol=1e-3)


def test_lightning_ckpt_loading(tmp_path, hf_dir):
    """state_dict nested under 'state_dict' with extra non-VAE keys —
    the warm-start contract (lvdm/models/autoencoder.py:68-86)."""
    _, ref = hf_dir
    from cvvae_tpu.utils.convert import load_torch_checkpoint_file
    sd = dict(ref.state_dict())
    sd["loss.logvar"] = torch.zeros(())          # non-VAE key -> skipped
    path = tmp_path / "last.ckpt"
    torch.save({"state_dict": sd, "global_step": 123}, path)
    tree, skipped = load_torch_checkpoint_file(str(path))
    assert "loss.logvar" in skipped
    assert "encoder" in tree and "decoder" in tree
    k = np.asarray(tree["encoder"]["conv_in"]["kernel"])
    ref_k = ref.encoder.conv_in.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    np.testing.assert_array_equal(k, ref_k)


@pytest.mark.slow
def test_verify_checkpoints_harness(hf_dir, tmp_path):
    """tools/verify_checkpoints.py end-to-end on a synthetic HF
    checkpoint dir + synthetic clip: converts, reconstructs, emits the
    PSNR report, and enforces the +-0.1 dB golden gate (both the pass
    and the fail exit paths)."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import verify_checkpoints

    path, _ = hf_dir
    import numpy as np
    from cvvae_tpu.data import video_io
    rng = np.random.default_rng(0)
    clip = str(tmp_path / "clip.mp4")
    video_io.write_video(clip, rng.integers(0, 255, (9, 64, 64, 3),
                                            dtype=np.uint8), fps=8)

    out = str(tmp_path / "report.json")
    rc = verify_checkpoints.main([
        "--vae_path", path, "--clips", clip, "--height", "64",
        "--width", "64", "--dtype", "fp32", "--out", out])
    assert rc == 0
    report = json.load(open(out))
    (key, r), = report.items()
    assert r["frames"] == 9 and np.isfinite(r["psnr_db"])

    # golden gate: exact value passes, a 1 dB-off value fails (exit 1)
    golden = str(tmp_path / "golden.json")
    json.dump({key: r["psnr_db"]}, open(golden, "w"))
    assert verify_checkpoints.main([
        "--vae_path", path, "--clips", clip, "--height", "64",
        "--width", "64", "--dtype", "fp32", "--golden", golden]) == 0
    json.dump({key: r["psnr_db"] + 1.0}, open(golden, "w"))
    assert verify_checkpoints.main([
        "--vae_path", path, "--clips", clip, "--height", "64",
        "--width", "64", "--dtype", "fp32", "--golden", golden]) == 1
