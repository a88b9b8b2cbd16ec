"""ctypes bindings + on-demand build for the native C++ Pong engine.

The shared library is compiled from ``csrc/pong_engine.cpp`` with g++ on
first use (cached under ``build/``). No pybind11 — the C ABI is consumed
through ctypes with numpy structure-of-arrays buffers.

Uses:
* differential testing: an independent compiled implementation of the env
  semantics, fast enough to sweep millions of steps against the JAX env
  (``tests/test_native_engine.py``);
* host-side env engine for the viewer/tooling without an accelerator.
"""

from __future__ import annotations

import ctypes
import subprocess
from dataclasses import dataclass
from pathlib import Path
from typing import Tuple

import numpy as np

from pingpong_tpu.config.schema import EnvConfig

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "csrc" / "pong_engine.cpp"
_BUILD_DIR = _REPO_ROOT / "build"
_LIB = _BUILD_DIR / "libpong_engine.so"


class _PongParams(ctypes.Structure):
    _fields_ = [
        ("paddle_width", ctypes.c_float),
        ("paddle_speed", ctypes.c_float),
        ("max_score", ctypes.c_int32),
        ("enable_spin", ctypes.c_float),
        ("magnus_factor", ctypes.c_float),
        ("restitution", ctypes.c_float),
        ("friction", ctypes.c_float),
        ("ball_mass", ctypes.c_float),
        ("ball_radius", ctypes.c_float),
    ]


class _PongStateSoA(ctypes.Structure):
    _fields_ = [
        ("ball_x", ctypes.POINTER(ctypes.c_float)),
        ("ball_y", ctypes.POINTER(ctypes.c_float)),
        ("ball_vx", ctypes.POINTER(ctypes.c_float)),
        ("ball_vy", ctypes.POINTER(ctypes.c_float)),
        ("spin", ctypes.POINTER(ctypes.c_float)),
        ("top_x", ctypes.POINTER(ctypes.c_float)),
        ("bottom_x", ctypes.POINTER(ctypes.c_float)),
        ("score_a", ctypes.POINTER(ctypes.c_int32)),
        ("score_b", ctypes.POINTER(ctypes.c_int32)),
        ("bounce", ctypes.POINTER(ctypes.c_int32)),
        ("t", ctypes.POINTER(ctypes.c_int32)),
    ]


class _PongScaleCfg(ctypes.Structure):
    _fields_ = [
        ("speed_scale_every", ctypes.c_int32),
        ("speed_increment", ctypes.c_float),
    ]


def build_engine(force: bool = False) -> Path:
    """Compile the shared library if needed; returns its path."""
    if _LIB.exists() and not force:
        if _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return _LIB
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        # strict IEEE mul/add pairing: FMA contraction would drift from
        # XLA's unfused float32 ops and fail the differential harness
        "-ffp-contract=off",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def engine_available() -> bool:
    try:
        build_engine()
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


@dataclass
class SoAState:
    """numpy structure-of-arrays env state (mutated in place)."""

    ball_x: np.ndarray
    ball_y: np.ndarray
    ball_vx: np.ndarray
    ball_vy: np.ndarray
    spin: np.ndarray
    top_x: np.ndarray
    bottom_x: np.ndarray
    score_a: np.ndarray
    score_b: np.ndarray
    bounce: np.ndarray
    t: np.ndarray

    @classmethod
    def zeros(cls, n: int) -> "SoAState":
        f = lambda: np.zeros(n, np.float32)
        i = lambda: np.zeros(n, np.int32)
        return cls(f(), f(), f(), f(), f(), f(), f(), i(), i(), i(), i())


class NativeEngine:
    def __init__(self, cfg: EnvConfig):
        self.lib = ctypes.CDLL(str(build_engine()))
        self.lib.pong_engine_abi_version.restype = ctypes.c_int32
        assert self.lib.pong_engine_abi_version() == 1
        self.lib.pong_rollout_bot.restype = ctypes.c_int64
        self.params = _PongParams(
            paddle_width=cfg.paddle_width,
            paddle_speed=cfg.paddle_speed,
            max_score=cfg.max_score,
            enable_spin=1.0 if cfg.enable_spin else 0.0,
            magnus_factor=cfg.magnus_factor,
            restitution=cfg.restitution,
            friction=cfg.friction,
            ball_mass=cfg.ball_mass,
            ball_radius=cfg.world_ball_radius,
        )
        self.scale = _PongScaleCfg(
            speed_scale_every=cfg.speed_scale_every,
            speed_increment=cfg.speed_increment,
        )

    def _soa(self, s: SoAState) -> _PongStateSoA:
        fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        return _PongStateSoA(
            fp(s.ball_x), fp(s.ball_y), fp(s.ball_vx), fp(s.ball_vy),
            fp(s.spin), fp(s.top_x), fp(s.bottom_x),
            ip(s.score_a), ip(s.score_b), ip(s.bounce), ip(s.t),
        )

    def step(
        self, state: SoAState, actions_a: np.ndarray, actions_b: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """In-place batched step; returns (reward_b, done)."""
        n = len(state.ball_x)
        reward = np.zeros(n, np.float32)
        done = np.zeros(n, np.uint8)
        soa = self._soa(state)
        self.lib.pong_step_batch(
            ctypes.byref(self.params), ctypes.byref(self.scale),
            ctypes.byref(soa),
            actions_a.astype(np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)),
            actions_b.astype(np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(n),
            reward.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            done.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return reward, done.astype(bool)

    def rollout_bot(
        self, state: SoAState, steps: int, tolerance: float = 0.02
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Bot-vs-bot rollout until done or ``steps``; returns
        (reward_acc, done_flags)."""
        n = len(state.ball_x)
        reward = np.zeros(n, np.float32)
        done = np.zeros(n, np.uint8)
        soa = self._soa(state)
        self.lib.pong_rollout_bot(
            ctypes.byref(self.params), ctypes.byref(self.scale),
            ctypes.byref(soa), ctypes.c_int64(n), ctypes.c_int32(steps),
            ctypes.c_float(tolerance),
            reward.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            done.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return reward, done.astype(bool)
