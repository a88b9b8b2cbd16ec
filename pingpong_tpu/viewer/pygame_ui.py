"""Interactive pygame playback of recorded trajectories.

Interactive-feature parity with the reference viewer
(``/root/reference/tests/test_viewer.py:496-678`` /
``test_viewer_v2.py:189-278``): SPACE pauses, +/- (and the arrow keys)
scale playback speed 0.1x-5.0x, Q/ESC quits, winner banner at episode end.
Rendering reuses :class:`FrameRenderer` frames, so visuals are identical
to the headless GIF path. Import is deferred so headless machines never
touch pygame.
"""

from __future__ import annotations

from typing import List

from pingpong_tpu.viewer.record import Trajectory
from pingpong_tpu.viewer.render import FrameRenderer


def play_interactive(
    trajectories: List[Trajectory],
    paddle_width: float,
    size: int = 400,
    fps: int = 60,
) -> None:
    import numpy as np
    import pygame

    pygame.init()
    screen = pygame.display.set_mode((size, size))
    pygame.display.set_caption("pingpong_tpu viewer")
    clock = pygame.time.Clock()
    renderer = FrameRenderer()
    speed = 1.0
    paused = False

    try:
        for traj in trajectories:
            t = 0
            while t < traj.length:
                for event in pygame.event.get():
                    if event.type == pygame.QUIT:
                        return
                    if event.type == pygame.KEYDOWN:
                        if event.key in (pygame.K_q, pygame.K_ESCAPE):
                            return
                        if event.key == pygame.K_SPACE:
                            paused = not paused
                        if event.key in (pygame.K_PLUS, pygame.K_EQUALS,
                                         pygame.K_UP):
                            speed = min(5.0, speed + 0.1)
                        if event.key in (pygame.K_MINUS, pygame.K_DOWN):
                            speed = max(0.1, speed - 0.1)
                if not paused:
                    frame = renderer.render_frame(traj, t, paddle_width, size)
                    surf = pygame.surfarray.make_surface(
                        np.transpose(frame, (1, 0, 2))
                    )
                    screen.blit(surf, (0, 0))
                    pygame.display.flip()
                    t += 1
                clock.tick(max(1, int(fps * speed)))
            # winner banner + short hold (ref shows banner then waits 2s)
            a, b = int(traj.score_a[-1]), int(traj.score_b[-1])
            winner = "A wins" if a > b else ("B wins" if b > a else "draw")
            pygame.display.set_caption(f"pingpong_tpu viewer — {winner} {a}:{b}")
            pygame.time.wait(1500)
    finally:
        pygame.quit()
