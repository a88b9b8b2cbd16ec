from pingpong_tpu.native.engine import (
    NativeEngine,
    build_engine,
    engine_available,
)

__all__ = ["NativeEngine", "build_engine", "engine_available"]
