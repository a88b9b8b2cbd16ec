"""Collision-kernel unit tests against the float64 oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.env.physics import collide_sphere_with_moving_plane
from tests.oracle import oracle_collide


def _random_cases(n, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        vn=rng.uniform(-0.5, 0.5, n),
        vt=rng.uniform(-0.5, 0.5, n),
        u=rng.choice([-0.03, 0.0, 0.03], n),
        omega=rng.uniform(-10, 10, n),
        e=rng.uniform(0.5, 1.0, n),
        mu=rng.uniform(0.0, 1.0, n),
        m=rng.uniform(0.5, 2.0, n),
        R=rng.uniform(0.01, 0.1, n),
    )


def test_matches_oracle_elementwise():
    cases = _random_cases(512)
    got = jax.jit(collide_sphere_with_moving_plane)(
        *[jnp.asarray(cases[k], jnp.float32) for k in
          ("vn", "vt", "u", "omega", "e", "mu", "m", "R")]
    )
    want = np.array([
        oracle_collide(*[cases[k][i] for k in
                         ("vn", "vt", "u", "omega", "e", "mu", "m", "R")])
        for i in range(512)
    ])
    for j in range(3):
        np.testing.assert_allclose(
            np.asarray(got[j]), want[:, j], rtol=2e-4, atol=2e-4
        )


def test_sticking_regime_zeroes_contact_slip():
    # With huge friction the contact point must come to rest relative to the
    # plane: vt' + (-R)*omega'... contact-point tangential velocity
    # vt' - R*omega' (plane at bottom of ball per the Jt* convention) == u.
    vn, vt, u, omega = -0.2, 0.1, 0.03, 3.0
    _, vt_p, om_p = collide_sphere_with_moving_plane(
        vn, vt, u, omega, 1.0, 100.0, 1.0, 0.03
    )
    # Jt* = (2m/7)(u + R*omega - vt); post-impact contact velocity relative
    # to plane should vanish: (vt' - u) - R*omega' == 0
    slip = (float(vt_p) - u) - 0.03 * float(om_p)
    assert abs(slip) < 1e-5


def test_sliding_regime_caps_impulse():
    vn, vt, u, omega = -0.2, 0.5, 0.0, -8.0
    m, R, e, mu = 1.0, 0.03, 0.9, 0.05
    _, vt_p, _ = collide_sphere_with_moving_plane(vn, vt, u, omega, e, mu, m, R)
    jt = (float(vt_p) - vt) * m
    cap = mu * m * (1 + e) * abs(vn)
    assert abs(jt) <= cap * (1 + 1e-5)


def test_restitution_flips_normal():
    vn_p, _, _ = collide_sphere_with_moving_plane(
        -0.4, 0.0, 0.0, 0.0, 0.8, 0.2, 1.0, 0.03
    )
    np.testing.assert_allclose(float(vn_p), 0.32, rtol=1e-6)
