"""Halton radical inverse vs the reference's scalar algorithm
(core/sampler.cpp:31-40)."""

import numpy as np
import pytest

from qaray_tpu.core.halton import halton, halton_np

pytestmark = pytest.mark.quick


def _halton_scalar(index, base):
    r = 0.0
    f = 1.0 / base
    i = index
    while i > 0:
        r += f * (i % base)
        f /= base
        i //= base
    return r


def test_halton_matches_scalar():
    for base in (2, 3, 5, 11, 13):
        idx = np.arange(100)
        expect = np.array([_halton_scalar(i, base) for i in idx], np.float32)
        np.testing.assert_allclose(halton_np(idx, base), expect, atol=1e-6)
        np.testing.assert_allclose(np.asarray(halton(idx, base)), expect, atol=1e-5)


def test_halton_range():
    vals = np.asarray(halton(np.arange(1000), 11))
    assert vals.min() >= 0.0 and vals.max() < 1.0
