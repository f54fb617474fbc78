"""tools/prepare_vgg19.py against a synthetic state dict: the .npz it
writes must be exactly what losses/perceptual.py's SRTPU_VGG19_NPZ
loader consumes (VERDICT r2 item 7 — the only missing ingredient for
real perceptual parity is the download itself)."""

import importlib.util
import os
import sys

import jax.numpy as jnp
import numpy as np

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools",
                      "prepare_vgg19.py")
spec = importlib.util.spec_from_file_location("prepare_vgg19", _TOOLS)
prepare_vgg19 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(prepare_vgg19)


def _synthetic_vgg19_state_dict(rng):
    """torchvision-layout features.* state dict (numpy stand-ins)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512]
    sd, idx, cin = {}, 0, 3
    for c in cfg:
        if c == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = rng.standard_normal(
            (c, cin, 3, 3)).astype(np.float32) * 0.05
        sd[f"features.{idx}.bias"] = np.zeros(c, np.float32)
        cin = c
        idx += 2
    sd["classifier.0.weight"] = np.zeros((10, 10), np.float32)  # ignored
    return sd


def test_npz_roundtrip_into_perceptual_loader(tmp_path, rng, monkeypatch):
    sd = _synthetic_vgg19_state_dict(rng)
    out = str(tmp_path / "vgg19.npz")
    manifest = prepare_vgg19.state_dict_to_npz(sd, out)
    assert manifest["tensors"] == 32  # 16 convs x (weight, bias)
    assert len(manifest["content_sha256"]) == 64

    import superresolution_tpu.losses.perceptual as perceptual

    monkeypatch.setenv("SRTPU_VGG19_NPZ", out)
    perceptual._load_cached.cache_clear()
    try:
        model, params, pretrained = perceptual._load_cached("relu3_4",
                                                            False)
        assert pretrained
        # the flax kernel must be the torch OIHW tensor in HWIO
        w_t = sd["features.0.weight"]
        w_f = np.asarray(params["params"]["conv1_1"]["kernel"])
        np.testing.assert_allclose(w_f, np.transpose(w_t, (2, 3, 1, 0)))
        x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
        feats = model.apply(params, x)
        assert np.isfinite(np.asarray(feats)).all()
    finally:
        perceptual._load_cached.cache_clear()


def test_missing_features_raises(tmp_path):
    try:
        prepare_vgg19.state_dict_to_npz(
            {"classifier.0.weight": np.zeros(3, np.float32)},
            str(tmp_path / "x.npz"))
    except ValueError as e:
        assert "features" in str(e)
    else:
        raise AssertionError("expected ValueError")
