"""In-env debug renderer — live view of any (batched) EnvState.

Parity with the reference env's built-in debug ``render()``
(``/root/reference/envs/my_pong_env_2p.py:265-306``): the reference can
open a pygame window during ANY env use and draw the current state at 60
FPS. The TPU env is a pure-functional pytree, so the equivalent is a
host-side adapter: call :meth:`DebugRenderer.render` with an
:class:`~pingpong_tpu.env.pong.EnvState` (scalar or batched — pick one
env with ``index``) anywhere in a host loop and it draws that state —
into a pygame window when a display is available, headlessly to an RGB
array otherwise (always returned, so tests and notebooks can consume
frames without a display). Drawing itself reuses the viewer's
:class:`~pingpong_tpu.viewer.render.FrameRenderer` (grid, trail, spin
cross, score line), which is a superset of the reference's debug view.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pingpong_tpu.viewer.record import Trajectory
from pingpong_tpu.viewer.render import FrameRenderer

TRAIL = 18   # frames of ball trail kept for the debug view


class DebugRenderer:
    def __init__(self, paddle_width: float, size: int = 400,
                 fps: int = 60, window: bool = True):
        self.paddle_width = float(paddle_width)
        self.size = int(size)
        self.fps = int(fps)
        self._renderer = FrameRenderer()
        self._hist: list = []
        self._screen = None
        self._clock = None
        self._want_window = window

    def _field(self, state, name: str, index: int) -> float:
        v = np.asarray(getattr(state, name))
        return float(v.reshape(-1)[index]) if v.ndim else float(v)

    def render(self, state, index: int = 0) -> np.ndarray:
        """Draw env ``index`` of ``state``; returns the RGB frame
        (H, W, 3). Opens/updates a pygame window when available."""
        row = tuple(
            self._field(state, n, index)
            for n in ("ball_x", "ball_y", "ball_vx", "ball_vy", "spin",
                      "top_paddle_x", "bottom_paddle_x",
                      "score_a", "score_b")
        )
        self._hist.append(row)
        if len(self._hist) > TRAIL + 1:
            self._hist.pop(0)
        h = np.asarray(self._hist, dtype=np.float32)
        t = len(self._hist) - 1
        traj = Trajectory(
            ball_x=h[:, 0], ball_y=h[:, 1], ball_vx=h[:, 2],
            ball_vy=h[:, 3], spin=h[:, 4], top_paddle_x=h[:, 5],
            bottom_paddle_x=h[:, 6], score_a=h[:, 7], score_b=h[:, 8],
            action_a=np.zeros(t + 1, np.int32),
            action_b=np.zeros(t + 1, np.int32),
            done=np.zeros(t + 1, bool),
            length=t + 1,
        )
        frame = self._renderer.render_frame(
            traj, t, self.paddle_width, size=self.size
        )
        if self._want_window:
            self._blit(frame)
        return frame

    def _blit(self, frame: np.ndarray) -> None:
        try:
            import pygame
        except Exception:
            self._want_window = False
            return
        try:
            if self._screen is None:
                pygame.init()
                self._screen = pygame.display.set_mode(
                    (self.size, self.size)
                )
                pygame.display.set_caption("pingpong_tpu debug")
                self._clock = pygame.time.Clock()
            pygame.event.pump()
            surf = pygame.surfarray.make_surface(frame.swapaxes(0, 1))
            self._screen.blit(surf, (0, 0))
            pygame.display.flip()
            self._clock.tick(self.fps)   # ref caps at 60 FPS (:269)
        except Exception:
            # headless box: stay in array-only mode
            self._want_window = False

    def close(self) -> None:
        if self._screen is not None:
            try:
                import pygame

                pygame.quit()
            except Exception:
                pass
            self._screen = None
