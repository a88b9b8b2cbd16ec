"""pingpong_tpu — a TPU-native self-play reinforcement-learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``MaxChen228/pingpong-selfplay-ai`` (reference mounted read-only at
``/root/reference``): a two-player spin-physics Pong environment, NoisyNet
dueling DQN and DRQN (LSTM) agents, prioritized / sequence replay, iterative
self-play with win-rate-gated generation promotion, batched tournament
evaluation (arena + round-robin), and a trajectory viewer.

Everything on the hot path is pure-functional and jit-compiled: the
environment steps as a ``vmap``-able state transition, rollouts are
``lax.scan`` loops, replay buffers are device-resident fixed-shape arrays,
and the whole actor-learner iteration is a single XLA program. Multi-chip
scaling uses ``jax.sharding.Mesh`` with a ``data`` axis over which env
batches and replay shards are partitioned.

The package name maps to the build target ``pingpong-selfplay-ai_tpu``
(dashes are not valid in Python identifiers).
"""

__version__ = "0.1.0"
