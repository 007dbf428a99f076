"""Golden colorspace tests (nn_utils.lua:188-249 routes through the torch
``image`` package's rgb2yuv / rgb2hsl / hsl2rgb / yuv2rgb).

HSL goldens come from an independent implementation (Python stdlib
``colorsys``, whose HLS ordering is reshuffled to the torch image package's
(h, s, l)); YUV goldens are the published BT.601 full-range primaries the
torch image package implements. Both include the edge cases the round-trip
tests could not see: hue wrap at the red boundary, exact grays (undefined
hue), saturation at both l<0.5 and l>0.5, and channel-max ties.
"""

import colorsys

import numpy as np
import pytest

from catgen.data import color as colorlib


def _hsl_golden(rgb):
    """colorsys HLS -> torch image (h, s, l) ordering, per pixel."""
    out = np.zeros_like(rgb)
    flat = rgb.reshape(-1, 3)
    o = out.reshape(-1, 3)
    for i, (r, g, b) in enumerate(flat):
        h, l, s = colorsys.rgb_to_hls(float(r), float(g), float(b))
        o[i] = (h, s, l)
    return out


def _cases():
    rng = np.random.RandomState(7)
    cases = rng.rand(64, 3).astype(np.float32)
    edges = np.array([
        [1.0, 0.0, 0.0],       # pure red: h = 0
        [1.0, 0.01, 0.0],      # just above the wrap: small positive h
        [1.0, 0.0, 0.01],      # just below the wrap: h near 1
        [0.0, 1.0, 0.0],       # green: h = 1/3
        [0.0, 0.0, 1.0],       # blue: h = 2/3
        [0.5, 0.5, 0.5],       # gray: s = 0 (hue undefined -> 0)
        [0.0, 0.0, 0.0],       # black
        [1.0, 1.0, 1.0],       # white
        [0.9, 0.9, 0.1],       # l > 0.5 saturation branch
        [0.2, 0.1, 0.1],       # l < 0.5 saturation branch
        [1.0, 1.0, 0.0],       # two-channel max tie (r==g==max)
        [0.0, 1.0, 1.0],       # g==b==max tie
    ], np.float32)
    return np.concatenate([edges, cases]).reshape(1, -1, 1, 3)


def test_rgb_to_hsl_matches_colorsys():
    rgb = _cases()
    ours = np.asarray(colorlib.rgb_to_hsl(rgb))
    gold = _hsl_golden(rgb)
    # hue is circular: compare modulo 1 where saturation > 0
    dh = np.abs(ours[..., 0] - gold[..., 0])
    dh = np.minimum(dh, 1.0 - dh)
    sat = gold[..., 1] > 1e-6
    assert dh[sat].max() < 1e-5
    np.testing.assert_allclose(ours[..., 1], gold[..., 1], atol=1e-5)
    np.testing.assert_allclose(ours[..., 2], gold[..., 2], atol=1e-5)


def test_hsl_to_rgb_matches_colorsys():
    rng = np.random.RandomState(11)
    hsl = rng.rand(40, 3).astype(np.float32)
    # hue-wrap edges + extremes
    hsl = np.concatenate([hsl, np.array([
        [0.0, 1.0, 0.5], [0.999999, 1.0, 0.5], [1.0 / 3, 1.0, 0.5],
        [0.5, 0.0, 0.25], [0.17, 0.5, 0.9], [0.83, 0.7, 0.2],
    ], np.float32)]).reshape(1, -1, 1, 3)
    ours = np.asarray(colorlib.hsl_to_rgb(hsl))
    flat = hsl.reshape(-1, 3)
    gold = np.array([colorsys.hls_to_rgb(float(h), float(l), float(s))
                     for h, s, l in flat], np.float32).reshape(ours.shape)
    np.testing.assert_allclose(ours, gold, atol=1e-5)


def test_hsl_hue_wraps_outside_unit_interval():
    """hsl2rgb must treat h and h±1 identically (the hue axis is circular;
    hue arithmetic like the +1/3 / -1/3 channel offsets relies on it)."""
    base = np.array([[[[0.25, 0.8, 0.4]]]], np.float32)
    shifted = base.copy()
    shifted[..., 0] += 1.0
    np.testing.assert_allclose(np.asarray(colorlib.hsl_to_rgb(base)),
                               np.asarray(colorlib.hsl_to_rgb(shifted)),
                               atol=1e-5)


YUV_GOLDENS = [
    # (rgb, yuv) from the BT.601 full-range matrix the torch image package
    # uses (Y = .299R+.587G+.114B, U = .436(B-Y)/.886, V = .615(R-Y)/.701)
    ([1.0, 0.0, 0.0], [0.299, -0.14713, 0.615]),
    ([0.0, 1.0, 0.0], [0.587, -0.28886, -0.51499]),
    ([0.0, 0.0, 1.0], [0.114, 0.436, -0.10001]),
    ([1.0, 1.0, 1.0], [1.0, 0.00001, 0.0]),
    ([0.0, 0.0, 0.0], [0.0, 0.0, 0.0]),
    ([0.5, 0.25, 0.75], [0.38175, 0.18122, 0.103745]),
]


@pytest.mark.parametrize("rgb,expected", YUV_GOLDENS)
def test_rgb_to_yuv_goldens(rgb, expected):
    x = np.array(rgb, np.float32).reshape(1, 1, 1, 3)
    got = np.asarray(colorlib.rgb_to_yuv(x)).ravel()
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_yuv_roundtrip_on_goldens():
    x = np.array([c for c, _ in YUV_GOLDENS], np.float32).reshape(1, -1, 1, 3)
    back = np.asarray(colorlib.yuv_to_rgb(colorlib.rgb_to_yuv(x)))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_luma_weights_golden():
    """The reference's custom 0.21/0.72/0.07 mix (nn_utils.lua:269-271) —
    NOT BT.601."""
    x = np.array([0.5, 0.25, 1.0], np.float32).reshape(1, 1, 1, 3)
    got = float(np.asarray(colorlib.rgb_to_y(x)).ravel()[0])
    assert abs(got - (0.21 * 0.5 + 0.72 * 0.25 + 0.07 * 1.0)) < 1e-6
