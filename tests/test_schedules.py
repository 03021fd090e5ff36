"""Golden tests for noise schedules against the reference formulas."""

import numpy as np

from bio_diffusion_tpu.ops import schedules as S


def test_polynomial_schedule_endpoints():
    T = 1000
    a2 = S.polynomial_schedule(T, s=1e-5, power=2.0)
    assert a2.shape == (T + 1,)
    # near-1 at t=0, near-s at t=T (precision floor)
    assert a2[0] > 0.999
    assert abs(a2[-1] - 1e-5) < 1e-4
    # monotone decreasing
    assert np.all(np.diff(a2) < 0)


def test_cosine_schedule_properties():
    T = 100
    a2 = S.cosine_beta_schedule(T)
    assert np.all(a2 > 0) and np.all(a2 <= 1)
    assert np.all(np.diff(a2) < 0)


def test_clip_noise_schedule():
    a2 = np.array([1.0, 0.5, 1e-9])
    clipped = S.clip_noise_schedule(a2, clip_value=0.001)
    steps = np.concatenate([[clipped[0]], clipped[1:] / clipped[:-1]])
    assert np.all(steps >= 0.001 - 1e-12)


def test_gamma_table_polynomial_2_golden():
    """Golden values computed by hand from the reference formulas."""
    T = 10
    s = 1e-5
    table = S.predefined_gamma_table("polynomial_2", T, s)
    assert table.shape == (T + 1,)
    # manual recompute
    steps = T + 1
    x = np.linspace(0, steps, steps)
    a2 = (1 - (x / steps) ** 2.0) ** 2
    a2 = S.clip_noise_schedule(a2, 0.001)
    a2 = (1 - 2 * s) * a2 + s
    expected = -(np.log(a2) - np.log(1 - a2))
    assert np.allclose(table, expected)
    # gamma is increasing (SNR decreasing)
    assert np.all(np.diff(table) > 0)


def test_sigma_alpha_identity():
    """alpha^2 + sigma^2 == 1 by construction of gamma."""
    table = S.predefined_gamma_table("polynomial_2", 50, 1e-5)
    alpha2 = 1.0 / (1.0 + np.exp(table))  # sigmoid(-gamma)
    sigma2 = 1.0 / (1.0 + np.exp(-table))
    assert np.allclose(alpha2 + sigma2, 1.0)
