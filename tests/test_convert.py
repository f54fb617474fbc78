"""Weight conversion round-trip: plain params -> BasicSR state dict ->
scan-stacked fused params, with identical model outputs throughout."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.models import RRDBNet
from superresolution_tpu.models.convert import (
    export_rrdbnet_numpy,
    import_rrdbnet_numpy,
)

KW = dict(scale=4, in_channels=3, out_channels=3, features=16, growth=8,
          num_blocks=2, upsampler="nearest_conv")


def test_roundtrip_plain_to_fused_scan(rng):
    plain = RRDBNet(scan_blocks=False, fused_dense=False, **KW)
    x = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    p_plain = plain.init(jax.random.key(0), x)
    ref_out = plain.apply(p_plain, x)

    sd = export_rrdbnet_numpy(p_plain, num_blocks=2, features=16, growth=8)
    assert "body.0.rdb1.conv1.weight" in sd
    assert sd["conv_first.weight"].shape == (16, 3, 3, 3)  # OIHW

    # import into every configuration; outputs must match
    for scan in (False, True):
        for fused in (False, True):
            model = RRDBNet(scan_blocks=scan, fused_dense=fused, **KW)
            p = import_rrdbnet_numpy(sd, num_blocks=2, features=16,
                                     growth=8, scan_blocks=scan,
                                     fused_dense=fused)
            p = jax.tree.map(jnp.asarray, p)
            # structural check against a fresh init
            ref_tree = model.init(jax.random.key(1), x)
            ref_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                         jax.tree_util.tree_flatten_with_path(ref_tree)[0]}
            got_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                         jax.tree_util.tree_flatten_with_path(p)[0]}
            assert ref_paths == got_paths, (scan, fused)
            out = model.apply(p, x)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                       rtol=2e-4, atol=2e-5), (scan, fused)


def test_import_synthetic_basicsr_dict(rng):
    """A hand-built BasicSR-style dict (the on-disk ESRGAN convention)
    imports cleanly."""
    c, g, nb = 16, 8, 2
    sd = {}

    def add(name, cout, cin):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, 3, 3), dtype=np.float32) * 0.05
        sd[f"{name}.bias"] = rng.standard_normal(cout, dtype=np.float32) * 0.01

    add("conv_first", c, 3)
    for i in range(nb):
        for r in range(1, 4):
            cin = c
            for j in range(1, 5):
                add(f"body.{i}.rdb{r}.conv{j}", g, cin)
                cin += g
            add(f"body.{i}.rdb{r}.conv5", c, cin)
    add("conv_body", c, c)
    add("conv_up1", c, c)
    add("conv_up2", c, c)
    add("conv_hr", c, c)
    add("conv_last", 3, c)

    model = RRDBNet(**KW)
    p = jax.tree.map(jnp.asarray, import_rrdbnet_numpy(
        sd, num_blocks=nb, features=c, growth=g))
    x = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    out = model.apply(p, x)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
