"""Independent float64 NumPy oracle of the Pong dynamics.

Written directly from the physical model (restitution bounce + Coulomb
friction impulse on a solid sphere + Magnus drift + mirrored wall
reflection + progressive speed-up), as specified by SURVEY.md §2.1. Used as
the golden model in env tests: the jitted f32 env must track this f64
oracle step-for-step to tight tolerance, and must produce identical
discrete events (hits, misses, scores) on non-degenerate trajectories.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


def oracle_collide(vn, vt, u, omega, e, mu, m, R):
    """Sphere/moving-plane impact, float64."""
    vn_out = -e * vn
    normal_impulse = m * (1.0 + e) * abs(vn)
    inertia = 0.4 * m * R * R
    stick = (2.0 * m / 7.0) * (u + R * omega - vt)
    cap = mu * normal_impulse
    if abs(stick) <= cap:
        tang_impulse = stick
    else:
        slip = (vt - u) - R * omega
        tang_impulse = -cap * math.copysign(1.0, slip)
    return (
        vn_out,
        vt + tang_impulse / m,
        omega - R * tang_impulse / inertia,
    )


@dataclass
class OracleEnv:
    """Scalar two-player Pong, float64, mirroring the reference step order."""

    paddle_width: float = 0.2
    paddle_speed: float = 0.02
    max_score: int = 3
    enable_spin: bool = True
    magnus_factor: float = 0.01
    restitution: float = 0.9
    friction: float = 0.2
    ball_mass: float = 1.0
    ball_radius: float = 0.03
    speed_scale_every: int = 3
    speed_increment: float = 0.2

    def set_state(self, x, y, vx, vy, spin, top_x=0.5, bot_x=0.5):
        self.x, self.y, self.vx, self.vy, self.spin = x, y, vx, vy, spin
        self.top_x, self.bot_x = top_x, bot_x
        self.score_a = self.score_b = 0
        self.bounces = 0
        self.done = False

    def _pvel(self, action):
        return (action - 1) * self.paddle_speed

    def step(self, a_top, a_bot):
        self.top_x = min(1.0, max(0.0, self.top_x + self._pvel(a_top)))
        self.bot_x = min(1.0, max(0.0, self.bot_x + self._pvel(a_bot)))

        if self.enable_spin:
            self.vx += self.magnus_factor * self.spin * self.vy
        self.x += self.vx
        self.y += self.vy

        if self.x < 0.0:
            self.x, self.vx = -self.x, -self.vx
        elif self.x > 1.0:
            self.x, self.vx = 2.0 - self.x, -self.vx

        r_a = r_b = 0.0
        half = self.paddle_width / 2.0
        if self.y < 0.0:
            if self.top_x - half <= self.x <= self.top_x + half:
                vn, vt, om = oracle_collide(
                    self.vy, self.vx, self._pvel(a_top), self.spin,
                    self.restitution, self.friction, self.ball_mass, self.ball_radius,
                )
                self.vy, self.vx, self.spin = vn, vt, om
                self.y = 0.0
                self._bounce()
            else:
                r_a, r_b = -1.0, 1.0
                self.score_b += 1
                self.done = self.done or self.score_b >= self.max_score
        elif self.y > 1.0:
            if self.bot_x - half <= self.x <= self.bot_x + half:
                vn, vt, om = oracle_collide(
                    -self.vy, self.vx, self._pvel(a_bot), self.spin,
                    self.restitution, self.friction, self.ball_mass, self.ball_radius,
                )
                self.vy, self.vx, self.spin = -vn, vt, om
                self.y = 1.0
                self._bounce()
            else:
                r_a, r_b = 1.0, -1.0
                self.score_a += 1
                self.done = self.done or self.score_a >= self.max_score
        return (r_a, r_b), self.done

    def _bounce(self):
        self.bounces += 1
        if self.bounces % self.speed_scale_every == 0:
            k = 1.0 + self.speed_increment
            self.vx *= k
            self.vy *= k
