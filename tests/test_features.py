"""Features accumulator tests, mirroring reference test/track/features_test.cpp
(capacity doubling, get/clear, label/feature semantics)."""

import numpy as np
import pytest

from rm_radar_tpu.track.features import Features


def test_push_and_capacity_doubling():
    f = Features(np.array([1.0, 0.0, 0.0]))
    assert f.size == 1 and f.capacity == 1
    f.push_back(np.array([0.0, 1.0, 0.0]))
    assert f.size == 2 and f.capacity == 2
    f.push_back(np.array([0.0, 0.0, 1.0]))
    assert f.size == 3 and f.capacity == 4
    for _ in range(2):
        f.push_back(np.array([1.0, 1.0, 1.0]))
    assert f.size == 5 and f.capacity == 8


def test_get_and_bounds():
    f = Features(np.array([1.0, 2.0]))
    f.push_back(np.array([3.0, 4.0]))
    np.testing.assert_array_equal(f.get(0), [1.0, 2.0])
    np.testing.assert_array_equal(f.get(1), [3.0, 4.0])
    with pytest.raises(IndexError):
        f.get(2)
    with pytest.raises(ValueError):
        f.push_back(np.array([1.0, 2.0, 3.0]))


def test_clear():
    f = Features(np.array([1.0, 2.0]))
    f.push_back(np.array([3.0, 4.0]))
    cap = f.capacity
    f.clear()
    assert f.size == 0
    assert f.capacity == cap
    np.testing.assert_array_equal(f.feature(), [0.0, 0.0])


def test_label_and_feature():
    # label = argmax of row sums; feature = row sums / total
    # (reference features.h:176-197).
    f = Features(np.array([0.5, 0.2, 0.0]))
    f.push_back(np.array([0.1, 0.6, 0.0]))
    f.push_back(np.array([0.0, 0.3, 0.1]))
    sums = np.array([0.6, 1.1, 0.1])
    assert f.label() == 1
    np.testing.assert_allclose(f.feature(), sums / sums.sum(), rtol=1e-6)
