import numpy as np
import pytest

from inference_tpu.mcmc import Bounds


def test_bounds_reflect():
    bounds = Bounds(lower=np.zeros(2), upper=np.ones(2))
    # points inside are unchanged
    inside = np.array([0.3, 0.7])
    assert np.allclose(np.asarray(bounds.reflect(inside)), inside)
    # points outside reflect back in
    outside = np.array([-0.3, 1.2])
    reflected = np.asarray(bounds.reflect(outside))
    assert np.allclose(reflected, [0.3, 0.8])
    # multiple widths of reflection
    far = np.array([2.5, -3.3])
    reflected = np.asarray(bounds.reflect(far))
    assert ((reflected >= 0) & (reflected <= 1)).all()


def test_bounds_reflect_momenta():
    bounds = Bounds(lower=np.zeros(2), upper=np.ones(2))
    outside = np.array([-0.3, 0.5])
    pos, refl = bounds.reflect_momenta(outside)
    pos, refl = np.asarray(pos), np.asarray(refl)
    assert np.allclose(pos, [0.3, 0.5])
    assert refl[0] == -1 and refl[1] == 1


def test_bounds_inside():
    bounds = Bounds(lower=np.zeros(2), upper=np.ones(2))
    assert bounds.inside(np.array([0.5, 0.5]))
    assert not bounds.inside(np.array([1.5, 0.5]))


def test_bounds_validation():
    with pytest.raises(ValueError):
        Bounds(lower=np.zeros(3), upper=np.ones(2))
    with pytest.raises(ValueError):
        Bounds(lower=np.ones(2), upper=np.zeros(2))
    with pytest.raises(ValueError):
        Bounds(lower=np.zeros((2, 2)), upper=np.ones((2, 2)))


def test_bounds_validate_start_point():
    bounds = Bounds(lower=np.zeros(2), upper=np.ones(2))
    bounds.validate_start_point(np.array([0.5, 0.5]))
    with pytest.raises(ValueError):
        bounds.validate_start_point(np.array([1.5, 0.5]))
    with pytest.raises(ValueError):
        bounds.validate_start_point(np.array([0.5, 0.5, 0.5]))
