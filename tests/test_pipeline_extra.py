"""Coverage: degradation pipeline modes, device prefetch, loader padding."""

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.data.dataset import SyntheticHRDataset
from superresolution_tpu.data.loader import Loader, prefetch_to_device
from superresolution_tpu.ops.degradation import degradation_pipeline


def test_degradation_modes(rng):
    hr = jnp.asarray(rng.random((32, 32, 1), dtype=np.float32))
    key = jax.random.key(0)
    for mode in ("bicubic", "blur_bicubic", "bsr_light"):
        lr = degradation_pipeline(key, hr, scale=4, mode=mode)
        assert lr.shape == (8, 8, 1), mode
        arr = np.asarray(lr)
        assert np.isfinite(arr).all() and arr.min() >= 0 and arr.max() <= 1

    # blur+bicubic must differ from plain bicubic (blur applied)
    a = np.asarray(degradation_pipeline(key, hr, 4, "bicubic"))
    b = np.asarray(degradation_pipeline(key, hr, 4, "blur_bicubic"))
    assert np.abs(a - b).max() > 1e-4


def test_degradation_is_jittable_and_vmappable(rng):
    hr = jnp.asarray(rng.random((4, 32, 32, 1), dtype=np.float32))
    keys = jax.random.split(jax.random.key(1), 4)
    f = jax.jit(jax.vmap(
        lambda k, x: degradation_pipeline(k, x, 4, "bsr_light")))
    lr = f(keys, hr)
    assert lr.shape == (4, 8, 8, 1)
    # per-sample keys -> different degradations of identical images
    same = jnp.broadcast_to(hr[0], hr.shape)
    lr2 = f(keys, same)
    assert float(jnp.abs(lr2[0] - lr2[1]).max()) > 1e-5


def test_prefetch_to_device_preserves_order_and_values():
    ds = SyntheticHRDataset(8, 16, 1)
    loader = Loader(ds, 2, shuffle=False, num_workers=2)
    direct = [b["hr"] for b in loader]
    fetched = [np.asarray(b["hr"])
               for b in prefetch_to_device(loader, size=3)]
    assert len(fetched) == len(direct) == 4
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a, b)


def test_loader_pad_to_batch():
    ds = SyntheticHRDataset(5, 8, 1)
    loader = Loader(ds, 4, shuffle=False, drop_last=False,
                    pad_to_batch=True, num_workers=1)
    batches = list(loader)
    assert len(batches) == 2
    last = batches[-1]
    assert last["hr"].shape == (4, 8, 8, 1)
    np.testing.assert_array_equal(last["_valid"],
                                  [True, False, False, False])
