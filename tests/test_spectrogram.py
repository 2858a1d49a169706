"""Spectrogram pipeline semantics (reference src/visual/spectrogram.rs)."""

import numpy as np
import pytest

from kofft_tpu.visual import (Colormap, color_from_magnitude_u8, db_scale,
                              log_scale_bins, magnitude_to_db,
                              map_bin_to_pixel, map_color_u8, map_color_u16,
                              render_rgb8, stft_magnitudes)


def test_db_conversion():
    """Pin the reference's own db test (spectrogram.rs tests)."""
    floor = -120.0
    assert magnitude_to_db(1.0, 1.0, floor) == pytest.approx(0.0, abs=1e-6)
    mag_floor = 10 ** (floor / 20.0)
    assert magnitude_to_db(mag_floor, 1.0, floor) == pytest.approx(
        floor, abs=1e-3)
    mag_mid = 10 ** ((floor / 2) / 20.0)
    assert magnitude_to_db(mag_mid, 1.0, floor) == pytest.approx(
        floor / 2, abs=1e-3)
    # zero magnitude and zero max clamp to the floor
    assert magnitude_to_db(0.0, 1.0, floor) == floor
    assert np.all(magnitude_to_db(np.ones(4), 0.0, floor) == floor)


def test_db_scale_range():
    assert db_scale(1.0, 1.0, 60.0) == pytest.approx(1.0)
    assert db_scale(1e-6, 1.0, 60.0) == pytest.approx(0.0)
    assert db_scale(10 ** (-30 / 20), 1.0, 60.0) == pytest.approx(0.5,
                                                                  abs=1e-5)


def test_stft_magnitudes_shape_and_peak(rng):
    sr = 8000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mags, max_mag = stft_magnitudes(x, 512, 128)
    assert mags.shape == (int(np.ceil(sr / 128)), 256)
    assert max_mag > 0
    peak_bin = mags[10].argmax()
    assert abs(peak_bin - round(440 * 512 / sr)) <= 1


def test_colormap_parse():
    assert Colormap.parse("viridis") == Colormap.VIRIDIS
    assert Colormap.parse("GRAY") == Colormap.GRAY
    assert Colormap.parse("bogus") == Colormap.FIRE  # fallback


@pytest.mark.parametrize("cmap", list(Colormap))
def test_colormap_endpoints(cmap):
    lo = map_color_u8(0.0, cmap)
    hi = map_color_u8(1.0, cmap)
    assert lo.shape == (3,) and hi.shape == (3,)
    # every palette ends bright-ish and starts dark-ish
    assert int(hi.astype(int).sum()) > int(lo.astype(int).sum())


def test_fire_stops_exact():
    np.testing.assert_array_equal(map_color_u8(0.0, Colormap.FIRE),
                                  [0, 0, 0])
    np.testing.assert_array_equal(map_color_u8(0.25, Colormap.FIRE),
                                  [128, 0, 128])
    np.testing.assert_array_equal(map_color_u8(1.0, Colormap.FIRE),
                                  [255, 255, 255])


def test_gray_and_u16():
    np.testing.assert_array_equal(map_color_u8(0.5, Colormap.GRAY),
                                  [128, 128, 128])
    np.testing.assert_array_equal(map_color_u16(1.0, Colormap.GRAY),
                                  [65535, 65535, 65535])


def test_map_color_vectorized():
    t = np.linspace(0, 1, 100)
    img = map_color_u8(t, Colormap.VIRIDIS)
    assert img.shape == (100, 3)
    for i in (0, 50, 99):
        np.testing.assert_array_equal(img[i],
                                      map_color_u8(float(t[i]),
                                                   Colormap.VIRIDIS))


def test_log_scale_bins():
    assert map_bin_to_pixel(0, 0) == 0
    vals = np.arange(16, dtype=np.float32)
    out = log_scale_bins(vals, 15)
    assert out.shape == (16,)
    # pixel 0 aggregates bin 0 only
    assert out[0] == 0.0
    assert out[-1] >= out[0]


def test_render_rgb8(rng):
    mags = np.abs(rng.standard_normal((10, 8))).astype(np.float32)
    img = render_rgb8(mags, float(mags.max()), -80.0, Colormap.FIRE)
    assert img.shape == (8, 10, 3) and img.dtype == np.uint8
    # per-pixel parity with the scalar reference pipeline
    x, y = 3, 5
    expect = color_from_magnitude_u8(mags[x, y], float(mags.max()), -80.0,
                                     Colormap.FIRE)
    np.testing.assert_array_equal(img[8 - 1 - y, x], expect)
