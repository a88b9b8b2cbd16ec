"""Viewer rendering backends.

Keeps the reference viewer package's key design idea — an abstract
renderer with swappable backends
(``/root/reference/tests/pingpong_viewer/rendering/renderer.py:9-68``) —
with two implementations:

* :class:`FrameRenderer` — headless RGB frames (PIL drawing) with the
  reference monolith's visual vocabulary (``test_viewer.py:186-492``):
  grid background, paddles, ball with a fading trail, rotating spin cross,
  score/speed/spin info line;
* :class:`PygameRenderer` (in ``pygame_ui.py``) — interactive window with
  pause and speed control.
"""

from __future__ import annotations

import abc
import math
from pathlib import Path
from typing import Optional

import numpy as np

from pingpong_tpu.viewer.record import Trajectory

# visual constants (analog of pingpong_viewer/config/constants.py)
BG = (12, 14, 24)
GRID = (30, 34, 52)
BALL = (255, 255, 255)
TRAIL = (90, 140, 255)
PADDLE_A = (80, 220, 120)
PADDLE_B = (255, 170, 60)
SPIN_CROSS = (255, 80, 80)
TEXT = (210, 210, 220)
PADDLE_PX_H = 10
BALL_PX_R = 8
TRAIL_LEN = 18
GRID_STEP = 50


class Renderer(abc.ABC):
    """Swappable rendering backend (ref renderer.py:9-68)."""

    @abc.abstractmethod
    def render_frame(self, traj: Trajectory, t: int, paddle_width: float,
                     size: int) -> Optional[np.ndarray]:
        ...


class CollisionEffects:
    """Expanding-ring flash on paddle impacts — the lightweight analog of
    the reference's effect system (pingpong_viewer/rendering/effects.py:
    CollisionEffect/EffectManager). An impact is detected when the ball is
    snapped exactly onto a paddle line (env/pong.py sets y to 0.0 / 1.0 on
    a hit)."""

    LIFETIME = 8

    def __init__(self):
        self.active = []  # (x_px, y_px, age)

    def update(self, traj: Trajectory, t: int, size: int):
        y = float(traj.ball_y[t])
        if y == 0.0 or y == 1.0:
            self.active.append(
                [int(float(traj.ball_x[t]) * size), int(y * size), 0]
            )
        self.active = [
            [x, y2, age + 1] for x, y2, age in self.active
            if age + 1 <= self.LIFETIME
        ]

    def draw(self, d):
        for x, y, age in self.active:
            r = 10 + age * 3
            fade = max(0, 255 - age * 30)
            d.ellipse([x - r, y - r, x + r, y + r],
                      outline=(fade, fade, 80), width=2)


class FrameRenderer(Renderer):
    """Headless RGB frame rendering via PIL."""

    def __init__(self):
        from PIL import Image, ImageDraw  # noqa: F401  (import check)

        self.spin_angle = 0.0
        self.effects = CollisionEffects()

    def render_frame(self, traj, t, paddle_width, size=400):
        from PIL import Image, ImageDraw

        img = Image.new("RGB", (size, size), BG)
        d = ImageDraw.Draw(img)
        for g in range(0, size, GRID_STEP):
            d.line([(g, 0), (g, size)], fill=GRID)
            d.line([(0, g), (size, g)], fill=GRID)

        # trail
        t0 = max(0, t - TRAIL_LEN)
        for i, tt in enumerate(range(t0, t)):
            frac = (i + 1) / max(t - t0, 1)
            x = int(traj.ball_x[tt] * size)
            y = int(traj.ball_y[tt] * size)
            r = max(1, int(BALL_PX_R * frac * 0.7))
            col = tuple(int(c * frac * 0.6) for c in TRAIL)
            d.ellipse([x - r, y - r, x + r, y + r], fill=col)

        bx = int(traj.ball_x[t] * size)
        by = int(traj.ball_y[t] * size)
        d.ellipse(
            [bx - BALL_PX_R, by - BALL_PX_R, bx + BALL_PX_R, by + BALL_PX_R],
            fill=BALL,
        )

        # rotating spin cross (ref my_pong_env_2p.py:281-294 / viewer)
        self.spin_angle += float(traj.spin[t])
        rc = BALL_PX_R - 2
        for off in (0.0, 90.0):
            a = math.radians(self.spin_angle + off)
            d.line(
                [
                    (bx + rc * math.cos(a), by + rc * math.sin(a)),
                    (bx - rc * math.cos(a), by - rc * math.sin(a)),
                ],
                fill=SPIN_CROSS,
                width=2,
            )

        self.effects.update(traj, t, size)
        self.effects.draw(d)

        pw = int(paddle_width * size)
        tx = int(traj.top_paddle_x[t] * size)
        d.rectangle([tx - pw // 2, 0, tx + pw // 2, PADDLE_PX_H], fill=PADDLE_A)
        bx2 = int(traj.bottom_paddle_x[t] * size)
        d.rectangle(
            [bx2 - pw // 2, size - PADDLE_PX_H, bx2 + pw // 2, size],
            fill=PADDLE_B,
        )

        speed = math.hypot(float(traj.ball_vx[t]), float(traj.ball_vy[t]))
        d.text(
            (6, size // 2 - 8),
            f"A {int(traj.score_a[t])} : {int(traj.score_b[t])} B   "
            f"v={speed:.3f}  spin={float(traj.spin[t]):+.2f}  t={t}",
            fill=TEXT,
        )
        return np.asarray(img)


def render_gif(
    traj: Trajectory, out_path, paddle_width: float, size: int = 400,
    fps: int = 60, every: int = 1,
) -> str:
    """Render a trajectory to an animated GIF."""
    from PIL import Image

    r = FrameRenderer()
    frames = [
        Image.fromarray(r.render_frame(traj, t, paddle_width, size))
        for t in range(0, traj.length, every)
    ]
    out_path = str(out_path)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    frames[0].save(
        out_path,
        save_all=True,
        append_images=frames[1:],
        duration=max(1000 // fps, 10) * every,
        loop=0,
    )
    return out_path
