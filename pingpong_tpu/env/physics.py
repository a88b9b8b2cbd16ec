"""Rigid-body collision kernel: sphere vs. moving plane.

Branchless jnp re-expression of the reference physics
(``/root/reference/envs/physics.py:3-23``): restitution bounce on the
normal component, tangential friction impulse (sticking vs. Coulomb
sliding), and the induced angular-velocity change. Written so it can be
``vmap``-ed over an env batch and fused by XLA into the surrounding env
step — there is no data-dependent Python control flow.

Physics model (for a sphere of mass ``m`` and radius ``R`` hitting a plane
moving tangentially at speed ``u``, with normal incoming velocity ``vn``,
tangential velocity ``vt`` and spin ``omega``):

* normal:      ``vn' = -e * vn`` with restitution ``e``; the normal impulse
  is ``Jn = m (1 + e) |vn|``.
* tangential:  the impulse that brings the contact point to rest relative
  to the plane (sticking) is ``Jt* = (2 m / 7) (u + R omega - vt)`` for a
  solid sphere (moment of inertia ``I = 2/5 m R^2``). Coulomb friction
  caps it at ``mu * Jn``; beyond the cap, a sliding impulse of magnitude
  ``mu * Jn`` opposes the contact-point slip
  ``vrel = (vt - u) - R omega``.
* spin:        ``omega' = omega - R Jt / I``.
"""

from __future__ import annotations

import jax.numpy as jnp


def collide_sphere_with_moving_plane(vn, vt, u, omega, e, mu, m, R):
    """Resolve a sphere/moving-plane impact. All args broadcastable jnp arrays.

    Returns ``(vn_post, vt_post, omega_post)``.
    """
    vn = jnp.asarray(vn)
    vn_post = -e * vn
    Jn = m * (1.0 + e) * jnp.abs(vn)
    I = 0.4 * m * R * R  # solid sphere: 2/5 m R^2
    Jt_star = (2.0 * m / 7.0) * (u + R * omega - vt)
    max_friction_impulse = mu * Jn

    vrel = (vt - u) - R * omega
    # Reference uses math.copysign(1, vrel): +1 at vrel == +0.0.
    sign_vrel = jnp.where(vrel >= 0.0, 1.0, -1.0)
    Jt = jnp.where(
        jnp.abs(Jt_star) <= max_friction_impulse,
        Jt_star,
        -max_friction_impulse * sign_vrel,
    )

    vt_post = vt + Jt / m
    omega_post = omega - (R * Jt) / I
    return vn_post, vt_post, omega_post
