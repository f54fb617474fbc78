"""Halo-8 exactness contract (VERDICT r2 item 9): the production
tile/halo geometry's seam error becomes an enforced floor so future
geometry changes cannot silently eat the <=0.05 dB parity budget.

Calibration notes (why the test is shaped this way):
- Interior-only comparison: tiled_apply's documented contract excludes
  `halo*scale` border pixels (one-shot halo padding cannot reproduce
  stacked SAME-conv border activations bit-for-bit), and pad_mode
  'constant' matches whole-image zero-pad semantics inside.
- Params scaled x0.5 after init: RAW MSRA-init 23-block trunks amplify
  to a +-400 output span whose effective receptive field spans the
  whole image — no finite halo passes, and no trained SR model behaves
  that way (BasicSR ships tile_pad=10). The x0.5 scaling restores a
  trained-like spatial decay while keeping full depth.
- Measured on this exact setup (CPU f32): halo 8 -> 84.4 dB,
  halo 4 -> 76.9 dB, so the 80 dB floor both locks the shipped halo-8
  geometry and rejects the halo-4 regression.
"""

import jax
import jax.numpy as jnp
import numpy as np

from superresolution_tpu.infer.tiled import tiled_apply
from superresolution_tpu.models import RRDBNet


def test_halo8_seam_error_above_80db(rng):
    m = RRDBNet(scale=4, in_channels=3, out_channels=3, features=32,
                num_blocks=23, growth=16, upsampler="pixelshuffle")
    p = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    p = jax.tree.map(lambda a: a * 0.5, p)

    @jax.jit
    def fn(t):
        return m.apply(p, t)

    img = rng.random((96, 96, 3), dtype=np.float32)
    whole = np.asarray(fn(jnp.asarray(img)[None])[0])
    tiled = np.asarray(tiled_apply(fn, img, 4, tile=48, halo=8, batch=4,
                                   pad_mode="constant"))
    assert tiled.shape == whole.shape
    d = (tiled - whole)[32:-32, 32:-32]  # interior (past halo*scale)
    mse = float(np.mean(d ** 2))
    span = float(whole.max() - whole.min())
    psnr = 10.0 * np.log10(span ** 2 / max(mse, 1e-20))
    assert psnr >= 80.0, f"seam PSNR {psnr:.1f} dB < 80 dB contract"
