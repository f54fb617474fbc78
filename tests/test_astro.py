"""Astronomy ETL: FITS round-trip, TAN WCS math, the aligned-LR-WCS
invariant (sub-arcsec), reprojection, and an end-to-end synthetic run of
steps 3+4 (extraction -> normalization -> trainable manifests)."""

import os

import numpy as np
import pytest

from superresolution_tpu.astro import (
    TanWCS,
    create_aligned_lr_wcs,
    read_fits,
    reproject_bilinear,
    write_fits,
)
from superresolution_tpu.astro.pipeline import (
    calculate_robust_stats,
    extract_patches,
    normalize_pairs,
    save_diagnostic_card,
)
from superresolution_tpu.astro.wcs import has_celestial

WCS0 = TanWCS(crval=(150.1163, 2.2058), crpix=(256.5, 256.5),
              cd=((-7.0e-5, 1.2e-6), (1.1e-6, 7.0e-5)))


def test_fits_roundtrip(tmp_path, rng):
    data = rng.random((32, 48)).astype(np.float32)
    path = str(tmp_path / "img.fits")
    write_fits(path, data, WCS0.to_header())
    back, header = read_fits(path)
    np.testing.assert_allclose(back, data, rtol=1e-6)
    assert header["NAXIS1"] == 48 and header["NAXIS2"] == 32
    w = TanWCS.from_header(header)
    assert w is not None
    np.testing.assert_allclose(w.crval, WCS0.crval, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(w.cd), np.asarray(WCS0.cd),
                               rtol=1e-10)
    assert has_celestial(header)


def test_fits_int16_bscale(tmp_path):
    # hand-build a BITPIX=16 file with BSCALE/BZERO to check scaling
    import struct
    cards = []
    for k, v in [("SIMPLE", "T"), ("BITPIX", "16"), ("NAXIS", "2"),
                 ("NAXIS1", "2"), ("NAXIS2", "1"),
                 ("BSCALE", "2.0"), ("BZERO", "100.0")]:
        cards.append(f"{k:<8}= {v:>20}".ljust(80))
    cards.append("END".ljust(80))
    htext = "".join(cards)
    htext += " " * ((-len(htext)) % 2880)
    body = struct.pack(">2h", 5, -3)
    body += b"\x00" * ((-len(body)) % 2880)
    path = str(tmp_path / "i16.fits")
    with open(path, "wb") as f:
        f.write(htext.encode())
        f.write(body)
    data, header = read_fits(path)
    np.testing.assert_allclose(data, [[110.0, 94.0]])


def test_wcs_pixel_world_roundtrip():
    xs = np.array([0.0, 100.3, 511.0, 255.5])
    ys = np.array([0.0, 400.7, 511.0, 255.5])
    ra, dec = WCS0.pixel_to_world(xs, ys)
    xb, yb = WCS0.world_to_pixel(ra, dec)
    np.testing.assert_allclose(xb, xs, atol=1e-8)
    np.testing.assert_allclose(yb, ys, atol=1e-8)


def test_wcs_crpix_maps_to_crval():
    ra, dec = WCS0.pixel_to_world(WCS0.crpix[0] - 1.0, WCS0.crpix[1] - 1.0)
    np.testing.assert_allclose([ra, dec], WCS0.crval, atol=1e-12)


def test_wcs_slice():
    sub = WCS0.slice(100, 50)
    ra1, dec1 = WCS0.pixel_to_world(60.0, 110.0)
    ra2, dec2 = sub.pixel_to_world(10.0, 10.0)
    np.testing.assert_allclose([ra1, dec1], [ra2, dec2], atol=1e-12)


def test_aligned_lr_wcs_invariant():
    """The LR footprint must cover exactly the HR footprint: corners of the
    HR patch and the LR patch must map to the same sky positions within a
    tiny fraction of an arcsec (reference gate: <1.0 arcsec = PERFECT)."""
    hr_wcs = WCS0.slice(37, 89)
    lr_wcs = create_aligned_lr_wcs(hr_wcs, 4)
    hr_size, lr_size = 512, 128
    # pixel-edge coords of the footprint corners (center convention: pixel
    # i spans [i-0.5, i+0.5])
    for cx, cy in [(-0.5, -0.5), (hr_size - 0.5, -0.5),
                   (-0.5, hr_size - 0.5), (hr_size - 0.5, hr_size - 0.5),
                   ((hr_size - 1) / 2, (hr_size - 1) / 2)]:
        ra_h, dec_h = hr_wcs.pixel_to_world(cx, cy)
        ra_l, dec_l = lr_wcs.pixel_to_world((cx + 0.5) / 4 - 0.5,
                                            (cy + 0.5) / 4 - 0.5)
        dra = abs(ra_h - ra_l) * np.cos(np.deg2rad(dec_h)) * 3600
        ddec = abs(dec_h - dec_l) * 3600
        assert np.hypot(dra, ddec) < 1e-6, (cx, cy, dra, ddec)


def test_reproject_identity(rng):
    img = rng.random((64, 64))
    out, foot = reproject_bilinear(img, WCS0, WCS0, (64, 64))
    np.testing.assert_allclose(out, img, atol=1e-9)
    assert foot.min() == 1.0


def test_reproject_shifted_grid(rng):
    img = np.zeros((64, 64))
    img[32, 32] = 1.0
    shifted = TanWCS(WCS0.crval, (WCS0.crpix[0] - 10, WCS0.crpix[1] - 5),
                     WCS0.cd)
    out, _ = reproject_bilinear(img, WCS0, shifted, (64, 64))
    # the point source must land 10 px left / 5 px up in the shifted frame
    yy, xx = np.unravel_index(np.nanargmax(out), out.shape)
    assert (yy, xx) == (27, 22)


def test_diagnostic_card_mismatch_metric(tmp_path, rng):
    hr_wcs = WCS0.slice(0, 0)
    lr_wcs = create_aligned_lr_wcs(hr_wcs, 4)
    hr = rng.random((512, 512))
    lr = rng.random((128, 128))
    mm = save_diagnostic_card(hr, lr, hr_wcs, lr_wcs,
                              str(tmp_path / "card.png"))
    assert mm < 1e-6  # aligned by construction
    assert os.path.exists(tmp_path / "card.png")


@pytest.mark.slow
def test_extract_and_normalize_end_to_end(tmp_path, rng):
    """Synthetic master frame + 1 observatory frame -> pairs -> TIFFs ->
    manifests -> PairedDataset loads them."""
    # master hubble frame with bright sources everywhere (passes coverage)
    master = (rng.random((700, 700)) * 0.5 + 0.5).astype(np.float64)
    h_wcs = TanWCS(crval=(150.0, 2.0), crpix=(350.5, 350.5),
                   cd=((-1.4e-5, 0.0), (0.0, 1.4e-5)))
    hpath = str(tmp_path / "hubble_master.fits")
    write_fits(hpath, master.astype(np.float32), h_wcs.to_header())
    # observatory frame: same sky area, 4x coarser pixels
    o_wcs = TanWCS(crval=(150.0, 2.0), crpix=(120.5, 120.5),
                   cd=((-5.6e-5, 0.0), (0.0, 5.6e-5)))
    obs, _ = reproject_bilinear(master, h_wcs, o_wcs, (240, 240))
    opath = str(tmp_path / "obs.fits")
    write_fits(opath, np.nan_to_num(obs).astype(np.float32),
               o_wcs.to_header())

    pairs = str(tmp_path / "pairs")
    n = extract_patches(hpath, [opath], pairs, hr_size=512, stride=180,
                        factor=4, diag_first=1, workers=2)
    assert n >= 1

    lo, hi = calculate_robust_stats(
        [os.path.join(pairs, d) for d in os.listdir(pairs)
         if d.startswith("pair_")])
    assert hi > lo

    tiffs = str(tmp_path / "tiffs")
    n2 = normalize_pairs(pairs, tiffs, debug_every=1)
    assert n2 == n

    from superresolution_tpu.data.dataset import PairedDataset
    from superresolution_tpu.data.manifest import prepare_splits

    paths = prepare_splits(tiffs, str(tmp_path / "splits"), mode="overfit")
    ds = PairedDataset(paths["train"])
    item = ds[0]
    assert item["hr"].shape == (512, 512, 1)
    assert item["lr"].shape == (128, 128, 1)
    assert item["hr"].max() > 0.1  # normalization produced real signal


def test_extract_patches_pair_per_passing_frame(tmp_path, rng):
    """N overlapping observatory frames must yield N pairs per HR window
    (reference Dataset_step3_extractpatches.py:245-293 saves a pair for
    EVERY frame passing the coverage gate, not just the first)."""
    master = (rng.random((200, 200)) * 0.5 + 0.5).astype(np.float64)
    h_wcs = TanWCS(crval=(150.0, 2.0), crpix=(100.5, 100.5),
                   cd=((-1.4e-5, 0.0), (0.0, 1.4e-5)))
    hpath = str(tmp_path / "hubble_master.fits")
    write_fits(hpath, master.astype(np.float32), h_wcs.to_header())
    opaths = []
    for k, shift in enumerate((0.0, 3.0)):  # two frames, slightly offset
        o_wcs = TanWCS(crval=(150.0, 2.0),
                       crpix=(40.5 + shift, 40.5 - shift),
                       cd=((-5.6e-5, 0.0), (0.0, 5.6e-5)))
        obs, _ = reproject_bilinear(master, h_wcs, o_wcs, (80, 80))
        obs = np.nan_to_num(obs) + 0.01 * rng.random((80, 80))  # per-frame noise
        opath = str(tmp_path / f"obs_{k}.fits")
        write_fits(opath, obs.astype(np.float32), o_wcs.to_header())
        opaths.append(opath)

    pairs = str(tmp_path / "pairs")
    n = extract_patches(hpath, opaths, pairs, hr_size=128, stride=200,
                        factor=4, diag_first=0, workers=1)
    assert n == 2  # one HR window, two passing frames -> two pairs
    hr0, _ = read_fits(os.path.join(pairs, "pair_000000", "hubble.fits"))
    hr1, _ = read_fits(os.path.join(pairs, "pair_000001", "hubble.fits"))
    np.testing.assert_array_equal(hr0, hr1)  # same HR window both times
    lr0, _ = read_fits(os.path.join(pairs, "pair_000000",
                                    "observatory.fits"))
    lr1, _ = read_fits(os.path.join(pairs, "pair_000001",
                                    "observatory.fits"))
    assert not np.array_equal(lr0, lr1)  # distinct observatory frames


def test_diagnostic_card_ra_wraparound(tmp_path, rng):
    """Patch centers straddling RA=0 (one just above 0, one just below
    360 — true separation ~0.1 arcsec) must report ~0 arcsec, not ~360
    deg scaled to arcsec."""
    hr_wcs = TanWCS(crval=(0.00001, 10.0), crpix=(257.0, 256.5),
                    cd=((-7.0e-5, 0.0), (0.0, 7.0e-5)))
    lr_wcs = TanWCS(crval=(359.99998, 10.0), crpix=(64.0, 64.5),
                    cd=((-2.8e-4, 0.0), (0.0, 2.8e-4)))
    hr = rng.random((512, 512))
    lr = rng.random((128, 128))
    ra_h, _ = hr_wcs.pixel_to_world((512 - 1) / 2.0, (512 - 1) / 2.0)
    ra_l, _ = lr_wcs.pixel_to_world((128 - 1) / 2.0, (128 - 1) / 2.0)
    assert ra_h < 1.0 and ra_l > 359.0  # genuinely straddling RA=0
    mm = save_diagnostic_card(hr, lr, hr_wcs, lr_wcs,
                              str(tmp_path / "card0.png"))
    assert mm < 1.0, mm


def test_from_header_partial_returns_none():
    """A CTYPE placeholder without numeric cards is 'no WCS', not a
    KeyError (camera software writes such headers before solving)."""
    assert TanWCS.from_header({"CTYPE1": "RA---TAN"}) is None
    assert TanWCS.from_header(
        {"CTYPE1": "RA---TAN", "CRVAL1": 1.0, "CRVAL2": 2.0,
         "CRPIX1": 1.0, "CRPIX2": 1.0}) is None  # no CD/CDELT
    assert not has_celestial({"CTYPE1": "RA---TAN"})


def test_fits_end_prefix_keyword_does_not_truncate(tmp_path, rng):
    """Keywords with an END prefix (ENDTIME/ENDDATE) must not terminate
    header parsing — WCS cards written after them must survive."""
    data = rng.random((8, 8)).astype(np.float32)
    header = {"ENDTIME": "2026-08-17T00:00:00"}
    header.update(WCS0.to_header())
    path = str(tmp_path / "endtime.fits")
    write_fits(path, data, header)
    back, h = read_fits(path)
    np.testing.assert_allclose(back, data, rtol=1e-6)
    w = TanWCS.from_header(h)
    assert w is not None
    np.testing.assert_allclose(w.crval, WCS0.crval, rtol=1e-10)


def test_fits_long_string_value_keeps_quote(tmp_path, rng):
    """String values longer than a card must truncate INSIDE the quotes;
    later cards must parse."""
    data = rng.random((8, 8)).astype(np.float32)
    header = {"LONGVAL": "x" * 100}
    header.update(WCS0.to_header())
    path = str(tmp_path / "long.fits")
    write_fits(path, data, header)
    back, h = read_fits(path)
    assert str(h["LONGVAL"]).startswith("xxx")
    assert TanWCS.from_header(h) is not None
