"""On-device DQN actor-learner: rollout + PER + Double-DQN in one XLA program.

TPU-native replacement for the reference's per-env-step host loop
(``/root/reference/scripts/train_iterative.py:210-297``). One call to
``train_iteration`` runs, entirely under ``jit``:

1. a ``lax.scan`` over ``rollout_length`` lockstep steps of ``num_envs``
   vectorized envs — frozen opponent A / pool member acting on player A's
   mirrored obs, the NoisyNet + epsilon-greedy learner B acting on player
   B's obs (fresh factorized noise every step, the analog of the
   reference's per-step ``reset_noise()``, train_iterative.py:124-130),
   masked auto-reset, per-episode epsilon decay and win/ episode
   accounting (train_iterative.py:247-261);
2. a batched PER push of the whole rollout chunk;
3. ``updates_per_iteration`` Double-DQN SGD steps — PER sample with
   annealed beta, IS-weighted MSE, Adam on the noisy dueling heads only
   (features frozen as in train_iterative.py:96-104), TD-priority
   write-back, periodic hard target sync (train_iterative.py:132-168).

Fidelity knob: the reference performs exactly 1 SGD step per (single-env)
env step; here the replay ratio is
``updates_per_iteration / (rollout_length * num_envs)`` and is configurable
(SURVEY.md §7 "hard parts" #4).

Opponent selection: each env is bound to one opponent for a whole episode
— frozen A with prob ``1 - opponent_pool_ratio`` else a uniformly drawn
pool member (train_iterative.py:235-236) — and re-bound on auto-reset. The
pool is a stacked parameter pytree of static capacity ``1 + pool_max``
(slot 0 = A); all members' Q-values are computed batched and the per-env
action is gathered by pool index, which keeps everything MXU-batched
instead of gathering per-env parameters.

Frozen opponents and the target network act in eval mode (mu weights).
(The reference leaves modelA in train mode so it plays with whatever noise
buffers its checkpoint carried — a stale-noise quirk we deliberately do
not copy; mu-greedy is the NoisyNet-standard frozen policy.)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from pingpong_tpu.config.schema import DQNConfig, EnvConfig
from pingpong_tpu.env.pong import (
    EnvParams,
    EnvState,
    env_params_from_config,
    observe_a,
    observe_b,
    reset,
    step_autoreset_batch,
)
from pingpong_tpu.models.qnet import (
    QNetParams,
    qnet_apply,
    qnet_init,
    qnet_sample_noise,
)
from pingpong_tpu.models.policy import qnet_act_train
from pingpong_tpu.replay.per import (
    PERBuffer,
    Transition,
    beta_schedule,
    per_init,
    per_push,
    per_sample,
    per_update_priorities,
)

Array = jax.Array


class DQNTrainState(NamedTuple):
    key: Array
    params_b: QNetParams
    target_b: QNetParams
    opt_state: optax.OptState
    buffer: PERBuffer
    env_state: EnvState          # batched (num_envs,)
    opp_idx: Array               # (num_envs,) i32; 0 = frozen A, k>0 = pool[k-1]
    ep_return: Array             # (num_envs,) f32 running episode return of B
    ended: Array                 # (num_envs,) bool — episode finished during
                                 # the previous rollout chunk (pallas path:
                                 # re-bind the opponent at the chunk boundary)
    epsilon: Array               # f32 scalar
    train_steps: Array           # i32
    frame_idx: Array             # i32, beta-anneal clock (ref frame_idx)
    episodes: Array              # i32 completed episodes (ref global_episode_count)


class DQNMetrics(NamedTuple):
    episodes: Array
    games_vs_a: Array
    wins_vs_a: Array
    games_vs_pool: Array
    wins_vs_pool: Array
    episode_return_sum: Array
    mean_loss: Array
    updates_run: Array
    epsilon: Array
    train_steps: Array
    buffer_size: Array
    env_steps: Array


def trainable_mask(params: QNetParams, heads_only: bool) -> QNetParams:
    """Per-leaf bool mask: reference trains only fc_V/fc_A
    (train_iterative.py:96-104)."""

    def fill(tree, value):
        return jax.tree_util.tree_map(lambda _: value, tree)

    return QNetParams(
        feat1=fill(params.feat1, not heads_only),
        feat2=fill(params.feat2, not heads_only),
        fc_v=fill(params.fc_v, True),
        fc_a=fill(params.fc_a, True),
    )


@jax.tree_util.register_pytree_node_class
class PreparedOpponents:
    """Opponent stack pre-packed for the fused rollout kernel.

    The stack is fixed across a whole generation block (the reference
    loads the pool once, train_iterative.py:199-207), but packing it
    (mirror fold + transposes + pads over 1+pool slots) was re-traced
    into every train_iteration — pure dispatch tax on the serial chain.
    ``DQNLearner.prepare_opponents`` builds this once per block;
    ``train_iteration`` accepts it anywhere a raw stack is accepted.

    ``shared_trunk`` is STATIC pytree aux data (jit specializes on it):
    True when every slot carries bit-identical feature-trunk weights —
    the invariant of heads-only lineages (train_iterative.py:96-104) —
    verified on the host at prepare time. The rollout kernel then runs
    the trunk once per lane group and loops members over the advantage
    head only."""

    def __init__(self, raw: QNetParams, packed, shared_trunk: bool = False):
        self.raw = raw
        self.packed = packed
        self.shared_trunk = bool(shared_trunk)

    def tree_flatten(self):
        return (self.raw, self.packed), self.shared_trunk

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


def bucketed_covers_pool(num_envs: int, ratio: float, n_members: int) -> bool:
    """True when the pool-bucket span has at least one env lane per
    member. Below this floor a FIXED bucket map would never train
    against some members (``bucket_opp_idx``'s even split gives them
    zero envs), so the binding switches to the rotating variant — see
    ``bucket_opp_idx(phase=...)``. Kept as a public predicate for tests
    and capacity planning (span >= members is also the regime where the
    kernel-tile member span stays <= 2)."""
    boundary = int(round((1.0 - ratio) * num_envs))
    return (num_envs - boundary) >= max(n_members, 1)


def bucket_opp_idx(num_envs: int, ratio: float, pool_size: Array,
                   phase: Optional[Array] = None) -> Array:
    """Deterministic contiguous bucket assignment for
    ``opponent_binding="bucketed"``: the first ``round((1-ratio)*B)`` envs
    bind to frozen A (slot 0), the rest split evenly (within one env) over
    the ``pool_size`` members. Matches the reference's PER-ENV/PER-STEP
    opponent marginal (train_iterative.py:235-236) exactly — stratified
    instead of iid; see config.schema.DQNConfig.opponent_binding for the
    episode-mixture caveat — and is nondecreasing in env index, so kernel
    tiles span <= 2 members with no argsort.

    The nondecreasing/<=2-member property holds in the COVERED regime
    (span >= pool members). When the span has FEWER lanes than members
    (small ``num_envs*ratio``, large pool — ``bucketed_covers_pool``
    False) a fixed map would starve the members without a lane, so
    ``phase`` (the callers pass ``state.episodes``) engages a ROTATING
    variant in exactly that regime: the member offset shifts by an
    integer-HASHED phase at each re-bind. The hash matters: a raw
    ``phase % pool_size`` can alias — lockstep time-limit episodes make
    the per-chunk episode increment a constant c, and the reachable
    offsets are then the multiples of gcd(c, pool_size) — whereas the
    mixed residues are pseudo-uniform, so every member is reached over
    successive chunks with probability 1 and the TIME-AVERAGED
    per-episode marginal stays uniform over the pool. In this starved
    corner the map wraps modulo pool_size (no longer nondecreasing), so
    a kernel tile's member range can span the pool — a bounded cost in
    a regime with fewer pool lanes than members, paid for coverage. The
    covered regime is bit-untouched (the round-5 dynamics A/B in
    demo_fidelity/ measured the fixed map)."""
    idx = jnp.arange(num_envs, dtype=jnp.int32)
    boundary = int(round((1.0 - ratio) * num_envs))
    span = max(num_envs - boundary, 1)
    m = ((idx - boundary) * pool_size) // span
    if phase is not None:
        ps = jnp.maximum(pool_size, 1)
        # integer mix (xorshift-multiply) so consecutive phases hit
        # pseudo-uniform residues mod pool_size — see docstring
        h = jnp.uint32(phase)
        h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
        h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
        h = (h ^ (h >> 16)).astype(jnp.int32) & jnp.int32(0x7FFFFFFF)
        m = jnp.where(span < pool_size, (m + h % ps) % ps, m)
    return jnp.where((idx < boundary) | (pool_size == 0), 0, m + 1)


def stack_opponents(
    params_a: QNetParams,
    pool: Sequence[QNetParams],
    pool_max: int,
) -> Tuple[QNetParams, int]:
    """Stack [A, pool..., padding(A)] along a new leading axis of static
    size 1 + pool_max. Returns (stacked, pool_size)."""
    if len(pool) > pool_max:
        raise ValueError(f"pool of {len(pool)} exceeds pool_max={pool_max}")
    members = [params_a] + list(pool) + [params_a] * (pool_max - len(pool))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *members)
    return stacked, len(pool)


class DQNLearner:
    """Factory binding (EnvConfig, DQNConfig) into jitted train/init fns.

    When ``mesh`` is given, the batched leaves of the train state (env
    batch, per-env opponent bindings, episode returns) and the replay
    buffer shard along the mesh's ``data`` axis; parameters, optimizer and
    counters replicate. The same jitted ``train_iteration`` then runs SPMD
    — XLA inserts the gradient/metric ``psum``s over ICI.
    """

    def __init__(self, env_cfg: EnvConfig, cfg: DQNConfig, mesh=None,
                 data_axis: str = "data"):
        if cfg.rollout_length * cfg.num_envs > cfg.memory_size:
            raise ValueError(
                "one rollout chunk may not exceed replay capacity: "
                f"{cfg.rollout_length}*{cfg.num_envs} > {cfg.memory_size}"
            )
        self.env_cfg = env_cfg
        self.cfg = cfg
        self.mesh = mesh
        self.data_axis = data_axis
        self.env_params: EnvParams = env_params_from_config(env_cfg)
        self._tx: Optional[optax.GradientTransformation] = None
        # fused PER+SGD update block: TPU-only (the interpreter would
        # dominate CPU test runs); exact-semantics fallback is the XLA
        # scan below. The choice also fixes the replay DATA layout
        # (chunk blocks vs packed rows), so it is made once, here.
        from pingpong_tpu.ops.dqn_update import supports_pallas_dqn_update

        self._pallas_update_ok = (
            cfg.use_pallas_update
            and supports_pallas_dqn_update(cfg)
            and jax.default_backend() == "tpu"
        )
        # Multi-chip learner design — two modes (cfg.learner_sharding,
        # cost model in docs/PODRUN.md):
        #
        # REPLICATED (default up to 16 chips): the replay buffer
        # replicates (shard_state), the rollout chunk is all-gathered
        # into it once per iteration (GSPMD inserts the collective at
        # the per_push write), and every chip runs the IDENTICAL fused
        # update block — bit-equal to the single-chip program, zero
        # collectives on the tiny latency-bound update chain (~30KB of
        # parameters, ~22us per update on v5e). Per-chip update cost and
        # replay HBM do not shrink with n; the all-gather grows linearly.
        #
        # SHARDED (default above 16 chips; round-4 VERDICT item 1): the
        # ring, priority planes, and update compute shard over 'data' —
        # no all-gather, per-chip update FLOPs and replay HBM ~1/n, one
        # psum+pmax round per update (constant in n). Runs the exact XLA
        # update math per shard (_push_update_sharded); the fused Mosaic
        # block cannot host the per-update cross-chip collective.
        #
        # Actors (env batch, rollout kernel) shard over 'data' in both.
        mode = cfg.learner_sharding
        if mode not in ("auto", "replicated", "sharded"):
            raise ValueError(f"unknown learner_sharding={mode!r}")
        ndata = 1 if mesh is None else mesh.shape[data_axis]
        self._learner_sharded = False
        if mode == "sharded" and ndata <= 1:
            import warnings

            warnings.warn(
                "learner_sharding='sharded' requested but the mesh has "
                "one data shard — running the single-device learner",
                stacklevel=2,
            )
        elif ndata > 1 and (mode == "sharded"
                            or (mode == "auto" and ndata > 16)):
            div_ok = (
                cfg.num_envs % ndata == 0
                and cfg.batch_size % ndata == 0
                and cfg.memory_size % (128 * ndata) == 0
            )
            if div_ok:
                self._learner_sharded = True
                # sharded mode uses the XLA update math per shard: row
                # replay layout, no fused block
                self._pallas_update_ok = False
            else:
                # warn for BOTH the explicit request and the auto
                # crossover: silently keeping the replicated learner at
                # large n reintroduces the linearly-growing all-gather
                # the mode exists to avoid (docs/PODRUN.md)
                import warnings

                warnings.warn(
                    f"learner_sharding={mode!r} wants the sharded "
                    f"learner on {ndata} shards but needs num_envs and "
                    "batch_size divisible by the data-axis size and "
                    "memory_size divisible by 128*n; falling back to "
                    "'replicated' (per-chip all-gather grows with n)",
                    stacklevel=2,
                )
        self._pallas_interpret = False   # tests flip for CPU interpret runs
        self.train_iteration = jax.jit(self._train_iteration, donate_argnums=(0,))
        from pingpong_tpu.ops.actor_rollout import pack_qnet

        self._pack_opp = jax.jit(lambda stack: pack_qnet(stack, mirror=True))

    def prepare_opponents(self, opp_stack: QNetParams) -> "PreparedOpponents":
        """Pack an opponent stack once per generation block, and detect
        the heads-only-lineage shared-trunk invariant on the host (exact
        array equality of every slot's feature weights vs slot 0)."""
        import numpy as np

        n_slots = jax.tree_util.tree_leaves(opp_stack)[0].shape[0]
        shared = False
        if n_slots > 1:
            shared = all(
                bool(np.all(np.asarray(leaf) == np.asarray(leaf[0:1])))
                for leaf in (opp_stack.feat1.w, opp_stack.feat1.b,
                             opp_stack.feat2.w, opp_stack.feat2.b)
            )
        return PreparedOpponents(
            raw=opp_stack, packed=self._pack_opp(opp_stack),
            shared_trunk=shared,
        )

    def shard_state(self, state: "DQNTrainState") -> "DQNTrainState":
        """Place a train state onto the mesh: batch/replay on ``data``,
        everything else replicated."""
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P

        batched = NamedSharding(self.mesh, P(self.data_axis))
        repl = NamedSharding(self.mesh, P())
        ndev = self.mesh.shape[self.data_axis]
        # fused-update path: the learner (replay buffer included) is
        # REPLICATED across chips — see the design note in __init__
        buf_sh = repl if self._pallas_update_ok else batched

        def put_if_divisible(x):
            # small summary arrays (e.g. a single-chunk PER summary) cannot
            # split over the axis; replicate them instead
            sh = buf_sh if x.shape and x.shape[0] % ndev == 0 else repl
            return jax.device_put(x, sh)

        def put_batched(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, batched), tree
            )

        def put_repl(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), tree
            )

        return DQNTrainState(
            key=jax.device_put(state.key, repl),
            params_b=put_repl(state.params_b),
            target_b=put_repl(state.target_b),
            opt_state=put_repl(state.opt_state),
            buffer=PERBuffer(
                data=jax.device_put(state.buffer.data, buf_sh),
                prios=jax.device_put(state.buffer.prios, buf_sh),
                p_alpha=jax.device_put(state.buffer.p_alpha, buf_sh),
                chunk_sums=put_if_divisible(state.buffer.chunk_sums),
                pos=jax.device_put(state.buffer.pos, repl),
                size=jax.device_put(state.buffer.size, repl),
            ),
            env_state=put_batched(state.env_state),
            opp_idx=jax.device_put(state.opp_idx, batched),
            ep_return=jax.device_put(state.ep_return, batched),
            ended=jax.device_put(state.ended, batched),
            epsilon=jax.device_put(state.epsilon, repl),
            train_steps=jax.device_put(state.train_steps, repl),
            frame_idx=jax.device_put(state.frame_idx, repl),
            episodes=jax.device_put(state.episodes, repl),
        )

    # -- optimizer ---------------------------------------------------------
    # The learner optimizes over the RAVELED parameter vector: the QNet is
    # ~12 tiny leaves, and per-leaf Adam chains are ~50 serial kernels on
    # the update loop's critical path (TPU executes kernels in order, so
    # op count is wall-clock). One flat Adam is 1-2 fused kernels; the
    # feature-freeze policy (train_iterative.py:96-104) becomes a 0/1 mask
    # multiplied into the flat gradient — with zero gradients Adam's
    # moments stay 0 and the update is exactly 0, identical to the
    # multi_transform+set_to_zero formulation.
    def _flat_util(self, params: QNetParams):
        if getattr(self, "_unravel", None) is None:
            from jax.flatten_util import ravel_pytree

            flat, unravel = ravel_pytree(params)
            self._unravel = unravel
            mask = trainable_mask(params, self.cfg.train_heads_only)
            self._grad_mask = ravel_pytree(
                jax.tree_util.tree_map(
                    lambda p, m: jnp.full(jnp.shape(p),
                                          1.0 if m else 0.0, jnp.float32),
                    params, mask,
                )
            )[0]
        from jax.flatten_util import ravel_pytree

        return ravel_pytree(params)[0], self._unravel

    def tx(self, params: QNetParams) -> optax.GradientTransformation:
        if self._tx is None:
            self._tx = optax.adam(self.cfg.lr)
        return self._tx

    # -- state init --------------------------------------------------------
    def init_state(
        self,
        key: Array,
        params_b: Optional[QNetParams] = None,
        epsilon: float = 1.0,
        episodes: int = 0,
    ) -> DQNTrainState:
        k_model, k_env, k_loop = jax.random.split(key, 3)
        if params_b is None:
            params_b = qnet_init(k_model)
        else:
            # the state is donated on every train_iteration; never absorb
            # caller-owned buffers or they die with the first donation
            params_b = jax.tree_util.tree_map(jnp.copy, params_b)
        env_keys = jax.random.split(k_env, self.cfg.num_envs)
        env_state = jax.vmap(reset, in_axes=(None, 0))(self.env_params, env_keys)
        # target must be a distinct buffer: the train state is donated to the
        # jitted iteration and XLA rejects donating one buffer twice.
        target_b = jax.tree_util.tree_map(jnp.copy, params_b)
        flat, _ = self._flat_util(params_b)
        return DQNTrainState(
            key=k_loop,
            params_b=params_b,
            target_b=target_b,
            opt_state=self.tx(params_b).init(flat),
            buffer=per_init(self.cfg.memory_size,
                            block=self._pallas_update_ok),
            env_state=env_state,
            opp_idx=jnp.zeros((self.cfg.num_envs,), jnp.int32),
            ep_return=jnp.zeros((self.cfg.num_envs,), jnp.float32),
            ended=jnp.zeros((self.cfg.num_envs,), jnp.bool_),
            epsilon=jnp.float32(epsilon),
            train_steps=jnp.int32(0),
            frame_idx=jnp.int32(0),
            episodes=jnp.int32(episodes),
        )

    def reset_learner(self, state: DQNTrainState, params_b: QNetParams) -> DQNTrainState:
        """The reference's ``reset_B()`` (train_iterative.py:213-224): fresh
        learner weights, fresh optimizer/target/buffer, epsilon back to 1."""
        params_b = jax.tree_util.tree_map(jnp.copy, params_b)
        flat, _ = self._flat_util(params_b)
        return state._replace(
            params_b=params_b,
            target_b=jax.tree_util.tree_map(jnp.copy, params_b),
            opt_state=self.tx(params_b).init(flat),
            buffer=per_init(self.cfg.memory_size,
                            block=self._pallas_update_ok),
            epsilon=jnp.float32(1.0),
            train_steps=jnp.int32(0),
            frame_idx=jnp.int32(0),
        )

    # -- rollout (Pallas fused fast path) ----------------------------------
    def _rollout_pallas(self, state: DQNTrainState, opp_stack: QNetParams,
                        pool_size: Array, push: bool = True):
        """Whole rollout chunk as one Pallas kernel (config
        ``use_pallas_rollout``). Fidelity notes vs the reference/XLA path:

        * epsilon decays once per chunk by ``decay^episodes`` instead of
          per in-chunk step;
        * opponents re-bind at CHUNK boundaries, not instantly on reset —
          an env whose episode ends mid-chunk starts its next episode vs
          the same member for the rest of the chunk (<= rollout_length
          steps). The per-episode marginal opponent distribution is
          unchanged; re-binding follows ``cfg.opponent_binding`` —
          "bucketed" (default, sort-free fixed lane buckets, exact
          stratified marginal) or "sorted" (iid draws + per-chunk
          argsort). Either way each kernel tile spans a ~1-2 member
          range, so opponent compute stops scaling with pool size
          (VERDICT round-1 item; bucketed kills the argsort/gather tax,
          VERDICT round-3 item 3)."""
        from pingpong_tpu.ops.actor_rollout import (
            pack_qnet,
            pallas_actor_rollout,
        )

        packed_ow = None
        shared_trunk = False
        if isinstance(opp_stack, PreparedOpponents):
            packed_ow = opp_stack.packed
            shared_trunk = opp_stack.shared_trunk
            opp_stack = opp_stack.raw
        cfg = self.cfg
        key, k_seed, k_gate, k_pick = jax.random.split(state.key, 4)
        seed = jax.random.randint(k_seed, (), 0, jnp.int32(2**31 - 1))

        # chunk-boundary opponent re-bind for envs that finished >= 1
        # episode last chunk (ref binds per episode, train_iterative:235).
        # A single-slot stack (empty pool) binds every env to slot 0 —
        # skip all binding work statically (n_slots is a static shape).
        n_slots = jax.tree_util.tree_leaves(opp_stack)[0].shape[0]
        if n_slots == 1:
            opp_idx = state.opp_idx
            env_state = state.env_state
            ep_return = state.ep_return
        elif cfg.opponent_binding == "bucketed":
            # sort-free: envs re-bind into fixed contiguous buckets (see
            # bucket_opp_idx) — no argsort, no env-state gathers, and
            # every kernel tile spans <= 2 members whenever the bucket
            # span covers the pool; the starved corner (span < live
            # members) rotates the member offset per chunk via phase so
            # every member is reached (round-5: replaces the round-4
            # fall-back-to-sorted, whose static check could only see the
            # PADDED pool_max and fired spuriously)
            target = bucket_opp_idx(
                cfg.num_envs, cfg.selfplay.opponent_pool_ratio, pool_size,
                phase=state.episodes,
            )
            opp_idx = jnp.where(state.ended, target, state.opp_idx)
            env_state = state.env_state
            ep_return = state.ep_return
        else:
            # "sorted": iid per-episode draws, envs argsorted by bound
            # member so kernel tiles span short ranges (the reference's
            # exact joint distribution).
            use_pool = (
                jax.random.uniform(k_gate, (cfg.num_envs,))
                < cfg.selfplay.opponent_pool_ratio
            ) & (pool_size > 0)
            pick = jax.random.randint(
                k_pick, (cfg.num_envs,), 0, jnp.maximum(pool_size, 1)
            ).astype(jnp.int32)
            opp_idx = jnp.where(
                state.ended, jnp.where(use_pool, pick + 1, 0), state.opp_idx
            )
            perm = jnp.argsort(opp_idx)
            opp_idx = opp_idx[perm]
            env_state = jax.tree_util.tree_map(
                lambda x: x[perm], state.env_state
            )
            ep_return = state.ep_return[perm]

        # Multi-chip: a Mosaic kernel is an opaque custom-call GSPMD
        # cannot partition (on a real pod it would all-gather and run the
        # FULL batch on every chip), so the kernel is shard_mapped over
        # the data axis — each shard rolls out its local env block, with
        # tile0 = global index of its first tile so the in-kernel PRNG
        # streams are IDENTICAL to the single-device program whenever the
        # tiling matches. Stats ride a psum; everything else stays
        # sharded. Falls back to the plain call (correct, unscalable)
        # when the env batch does not split evenly.
        ndata = 1 if self.mesh is None else self.mesh.shape[self.data_axis]
        local_envs = cfg.num_envs // ndata if cfg.num_envs % ndata == 0 else 0
        tile = min(cfg.pallas_tile_rows, local_envs or cfg.num_envs)
        lw = pack_qnet(state.params_b)
        ow = (packed_ow if packed_ow is not None
              else pack_qnet(opp_stack, mirror=True))

        def call_kernel(env_state, opp_idx, ep_return, lw, ow, seed,
                        epsilon, pool_size, tile0):
            return pallas_actor_rollout(
                self.env_params, env_state, opp_idx, ep_return, lw, ow,
                seed=seed, epsilon=epsilon, pool_size=pool_size,
                steps=cfg.rollout_length,
                pool_ratio=cfg.selfplay.opponent_pool_ratio,
                max_episode_steps=self.env_cfg.max_episode_steps,
                tile_rows=tile, tile0=tile0,
                member_groups=cfg.pallas_member_groups,
                member_shared_trunk=shared_trunk,
            )

        if ndata > 1 and local_envs and local_envs % tile == 0:
            from jax.sharding import PartitionSpec as P

            ax = self.data_axis
            n_local_tiles = local_envs // tile

            def sharded(env_state, opp_idx, ep_return, lw, ow, seed,
                        epsilon, pool_size):
                tile0 = jax.lax.axis_index(ax) * n_local_tiles
                (env2, opp2, ret2, tr, stats, rsum, ended) = call_kernel(
                    env_state, opp_idx, ep_return, lw, ow, seed, epsilon,
                    pool_size, tile0,
                )
                return (env2, opp2, ret2, tr,
                        jax.lax.psum(stats, ax), jax.lax.psum(rsum, ax),
                        ended)

            d, r = P(ax), P()
            tr_spec = {
                "obs": P(None, ax, None), "action": P(None, ax),
                "reward": P(None, ax), "next_obs": P(None, ax, None),
                "done": P(None, ax),
            }
            (new_env, new_opp_idx, new_ep_ret, tr, stat_counts,
             ret_sum, ended) = jax.shard_map(
                sharded, mesh=self.mesh,
                in_specs=(d, d, d, r, r, r, r, r),
                out_specs=(d, d, d, tr_spec, r, r, d),
                # pallas_call's out_shapes carry no vma info
                check_vma=False,
            )(env_state, opp_idx, ep_return, lw, ow, seed,
              state.epsilon, pool_size)
        else:
            (new_env, new_opp_idx, new_ep_ret, tr, stat_counts,
             ret_sum, ended) = call_kernel(
                env_state, opp_idx, ep_return, lw, ow, seed,
                state.epsilon, pool_size, 0,
            )
        traj = Transition(
            obs=tr["obs"], action=tr["action"], reward=tr["reward"],
            next_obs=tr["next_obs"], done=tr["done"],
        )                                   # (T, B, ...) — B stays sharded
        n_done = stat_counts[0] + stat_counts[2]
        epsilon = jnp.maximum(
            jnp.float32(cfg.min_epsilon),
            state.epsilon * cfg.epsilon_decay ** n_done.astype(jnp.float32),
        )
        state = state._replace(
            key=key,
            env_state=new_env,
            opp_idx=new_opp_idx,
            ep_return=new_ep_ret,
            ended=ended,
            epsilon=epsilon,
            episodes=state.episodes + n_done,
        )
        if not push:
            # sharded-learner mode: the chunk is pushed per-shard inside
            # _push_update_sharded — returning it UNflattened keeps the
            # env axis sharded (a (T*B, .) flatten would interleave
            # shards and force a relayout collective)
            return state, stat_counts, ret_sum, traj
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), traj
        )
        state = state._replace(
            buffer=per_push(state.buffer, flat, cfg.per_alpha)
        )
        return state, stat_counts, ret_sum

    # -- rollout -----------------------------------------------------------
    def _rollout(self, state: DQNTrainState, opp_stack: QNetParams,
                 pool_size: Array, push: bool = True):
        if self.cfg.use_pallas_rollout:
            return self._rollout_pallas(state, opp_stack, pool_size, push)
        if isinstance(opp_stack, PreparedOpponents):
            opp_stack = opp_stack.raw
        cfg = self.cfg
        env_params = self.env_params
        params_b = state.params_b  # closed over: scan must not carry the
        # replay buffer / optimizer / params — a fat carry makes XLA thread
        # (and potentially copy) tens of MB through every scan iteration

        def step_fn(carry, _):
            key, env_state, opp_idx, ep_return, epsilon, episodes = carry
            key, k_act, k_step, k_pool_gate, k_pool_pick = jax.random.split(key, 5)

            obs_a = observe_a(env_state)
            obs_b = observe_b(env_state)

            # frozen opponents: batched Q for every pool slot, gather by idx
            q_all = jax.vmap(lambda p: qnet_apply(p, obs_a))(opp_stack)
            act_all = jnp.argmax(q_all, axis=-1).astype(jnp.int32)  # (K+1, B)
            act_a = jnp.take_along_axis(act_all, opp_idx[None, :], axis=0)[0]

            act_b = qnet_act_train(k_act, params_b, obs_b, epsilon)

            next_env, out = step_autoreset_batch(
                env_params, env_state, k_step, act_a, act_b,
                self.env_cfg.max_episode_steps,
            )

            trans = Transition(
                obs=obs_b,
                action=act_b,
                reward=out.reward_b,
                next_obs=out.obs_b,
                done=out.done,
            )

            # episode accounting (ref train_iterative.py:247-261)
            ep_ret = ep_return + out.reward_b
            done = out.done
            win = (ep_ret > 0.0) & done
            vs_pool = opp_idx > 0
            stats = jnp.stack([
                jnp.sum((done & ~vs_pool).astype(jnp.int32)),
                jnp.sum((win & ~vs_pool).astype(jnp.int32)),
                jnp.sum((done & vs_pool).astype(jnp.int32)),
                jnp.sum((win & vs_pool).astype(jnp.int32)),
            ])
            ret_sum = jnp.sum(jnp.where(done, ep_ret, 0.0))

            n_done = jnp.sum(done.astype(jnp.int32))
            epsilon = jnp.maximum(
                jnp.float32(cfg.min_epsilon),
                epsilon * cfg.epsilon_decay ** n_done.astype(jnp.float32),
            )

            # re-bind opponent for envs that just reset (ref :235-236)
            use_pool = (
                jax.random.uniform(k_pool_gate, (cfg.num_envs,))
                < cfg.selfplay.opponent_pool_ratio
            ) & (pool_size > 0)
            pick = jax.random.randint(
                k_pool_pick, (cfg.num_envs,), 0, jnp.maximum(pool_size, 1)
            ).astype(jnp.int32)
            new_opp = jnp.where(use_pool, pick + 1, 0)
            opp_idx = jnp.where(done, new_opp, opp_idx)

            new_carry = (
                key, next_env, opp_idx,
                jnp.where(done, 0.0, ep_ret), epsilon, episodes + n_done,
            )
            return new_carry, (trans, stats, ret_sum)

        carry0 = (
            state.key, state.env_state, state.opp_idx,
            state.ep_return, state.epsilon, state.episodes,
        )
        carry, (traj, stats, ret_sums) = jax.lax.scan(
            step_fn, carry0, None, length=cfg.rollout_length
        )
        key, env_state, opp_idx, ep_return, epsilon, episodes = carry
        state = state._replace(
            key=key,
            env_state=env_state,
            opp_idx=opp_idx,
            ep_return=ep_return,
            epsilon=epsilon,
            episodes=episodes,
        )
        if not push:
            return state, jnp.sum(stats, axis=0), jnp.sum(ret_sums), traj
        # (T, B, ...) -> (T*B, ...): time-major flatten keeps temporal order
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), traj
        )
        state = state._replace(
            buffer=per_push(state.buffer, flat, self.cfg.per_alpha),
        )
        return state, jnp.sum(stats, axis=0), jnp.sum(ret_sums)

    # -- learner update (fused Pallas fast path) -----------------------------
    def _update_pallas(self, state: DQNTrainState):
        """Fused update block: PER sampling + all K SGD steps in one Pallas
        program (see ops/dqn_update.py). Key discipline and sampling
        distribution are IDENTICAL to the XLA path below (pre-drawn U[0,1)
        batches; priorities feed back between updates in-kernel); the
        optimizer state stays in the optax layout (count, mu, nu on the
        raveled vector), converted to packed tensors around the call —
        checkpoints and restore tiers are format-identical across paths.
        Raw priorities are replayed outside the kernel from the emitted
        (indices, new_p) stream with a last-writer-wins dedup scatter."""
        from jax.flatten_util import ravel_pytree

        from pingpong_tpu.ops.dqn_update import (
            pack_dqn_noise,
            pack_dqn_params,
            pallas_dqn_update_block,
            unpack_dqn_params,
        )

        cfg = self.cfg
        bs = cfg.batch_size
        K = cfg.updates_per_iteration
        buf = state.buffer
        cap = buf.prios.shape[0]
        nc = cap // 128
        flat_b0, unravel = self._flat_util(state.params_b)
        flat_t0, _ = self._flat_util(state.target_b)

        key, k_noise, k_u = jax.random.split(state.key, 3)
        noise_all = jax.vmap(
            lambda k: qnet_sample_noise(k, state.params_b)
        )(jax.random.split(k_noise, K))
        u_all = jax.random.uniform(k_u, (K, bs, 1), jnp.float32)

        # optax.adam state leaves == [count, mu, nu]
        opt_leaves, opt_def = jax.tree_util.tree_flatten(state.opt_state)
        count, mu_flat, nu_flat = opt_leaves

        pa2 = buf.p_alpha.reshape(nc, 128)
        cs2 = buf.chunk_sums.reshape(nc // 128, 128)
        ready = buf.size >= bs

        def kernel_block(*args):
            return pallas_dqn_update_block(
                *args,
                K=K, bs=bs, lr=cfg.lr, gamma=cfg.gamma,
                interval=cfg.target_update_interval,
                tau=cfg.target_tau, alpha=cfg.per_alpha,
                per_eps=cfg.per_eps, beta_start=cfg.per_beta_start,
                beta_frames=cfg.per_beta_frames,
                heads_only=cfg.train_heads_only,
                interpret=self._pallas_interpret,
            )

        if self.mesh is not None and self.mesh.shape[self.data_axis] > 1:
            # replicated-learner SPMD: every chip runs the identical fused
            # block on identical (replicated) inputs — a Mosaic custom
            # call is opaque to GSPMD, so the replication contract is made
            # explicit with fully-replicated shard_map specs (any operand
            # still sharded at this point is all-gathered at the boundary)
            from jax.sharding import PartitionSpec as P

            kernel_block = jax.shard_map(
                kernel_block, mesh=self.mesh, in_specs=P(), out_specs=P(),
                check_vma=False,
            )

        def run(_):
            (pa3, cs3, o2, t2, m2, v2, newp, idx, losses, ts2) = (
                kernel_block(
                    state.train_steps, count, state.frame_idx, buf.size,
                    u_all,
                    pack_dqn_noise(noise_all),
                    pa2, cs2,
                    pack_dqn_params(state.params_b),
                    pack_dqn_params(state.target_b),
                    pack_dqn_params(unravel(mu_flat)),
                    pack_dqn_params(unravel(nu_flat)),
                    buf.data,
                )
            )
            # replay the K priority streams into the raw-priority array:
            # chronological order, last writer wins (stable argsort groups
            # equal slots with ascending update order; keep each group's
            # last entry, dump the rest into a scratch slot)
            idx_flat = idx.reshape(-1)
            newp_flat = newp.reshape(-1)
            srt = jnp.argsort(idx_flat, stable=True)
            si = idx_flat[srt]
            sv = newp_flat[srt]
            last = jnp.concatenate(
                [si[:-1] != si[1:], jnp.ones((1,), bool)]
            )
            prios_ext = jnp.concatenate(
                [buf.prios, jnp.zeros((1,), jnp.float32)]
            )
            prios = prios_ext.at[jnp.where(last, si, cap)].set(
                jnp.where(last, sv, 0.0)
            )[:cap]
            tmpl = state.params_b
            return (
                pa3.reshape(-1), cs3.reshape(-1), prios,
                ravel_pytree(unpack_dqn_params(o2, tmpl))[0],
                ravel_pytree(unpack_dqn_params(t2, tmpl))[0],
                ravel_pytree(unpack_dqn_params(m2, tmpl))[0],
                ravel_pytree(unpack_dqn_params(v2, tmpl))[0],
                losses, ts2, count + K, state.frame_idx + K,
            )

        def skip(_):
            return (buf.p_alpha, buf.chunk_sums, buf.prios,
                    flat_b0, flat_t0, mu_flat, nu_flat,
                    jnp.zeros((K,), jnp.float32), state.train_steps,
                    count, state.frame_idx)

        (p_alpha, chunk_sums, prios, flat_b, flat_t, mu2, nu2, losses,
         train_steps, count2, frame2) = jax.lax.cond(ready, run, skip, None)
        state = state._replace(
            key=key,
            params_b=unravel(flat_b),
            target_b=unravel(flat_t),
            opt_state=jax.tree_util.tree_unflatten(
                opt_def, [count2, mu2, nu2]
            ),
            buffer=buf._replace(
                prios=prios, p_alpha=p_alpha, chunk_sums=chunk_sums
            ),
            train_steps=train_steps,
            frame_idx=frame2,
        )
        n_ran = jnp.where(ready, K, 0).astype(jnp.int32)
        mean_loss = jnp.sum(losses) / jnp.maximum(
            n_ran.astype(jnp.float32), 1.0
        )
        return state, mean_loss, n_ran

    # -- shared Double-DQN math (one definition for every learner path) ----
    def _double_dqn_td(self, flat_b, flat_t, unravel, x2, actions,
                       rewards, dones, noise2, bs):
        """TD residual of the Double-DQN target (train_iterative.py:
        132-156): dual-net batched forward over the packed (obs||next)
        lanes, online argmax, target bootstrap, stop-grad target. ONE
        definition shared by the replicated ``_update`` and the sharded
        ``_push_update_sharded`` loss functions — only the IS weighting
        and the reduction differ at the call sites, the TD math must
        not (the fused Pallas kernel carries the third copy, pinned to
        this one by the kernel-vs-autodiff parity suite)."""
        both = jax.vmap(unravel)(jnp.stack([flat_b, flat_t]))
        q2 = jax.vmap(qnet_apply)(both, x2, noise2)
        q = q2[0, 0::2]
        q_a = jnp.take_along_axis(q, actions[:, None], axis=-1)[:, 0]
        # Double DQN: online-net argmax (int — no grad path)
        na = jnp.argmax(q2[0, 1::2], axis=-1)
        nq = jnp.take_along_axis(q2[1, :bs], na[:, None], axis=-1)[:, 0]
        y = rewards + self.cfg.gamma * nq * (
            1.0 - dones.astype(jnp.float32)
        )
        return q_a - jax.lax.stop_gradient(y)

    def _sync_target(self, flat_b, flat_t, train_steps):
        """Hard sync every interval (ref :157-159) or soft Polyak
        (framework knob) — shared by both learner paths."""
        if self.cfg.target_tau > 0.0:
            return flat_t + self.cfg.target_tau * (flat_b - flat_t)
        sync = (train_steps % self.cfg.target_update_interval) == 0
        return jnp.where(sync, flat_b, flat_t)

    # -- sharded learner: per-shard push + K updates -----------------------
    def _push_update_sharded(self, state: DQNTrainState, traj: Transition):
        """Sharded-PER learner (``learner_sharding="sharded"``; the
        docs/PODRUN.md design, round-4 VERDICT item 1). Per shard of the
        ``data`` axis, under one ``shard_map``:

        * the shard's OWN rollout chunk is pushed into its LOCAL ring —
          no experience all-gather, replay HBM ~1/n per chip;
        * each update samples ``batch_size/n`` rows from the local PER
          distribution via the existing inverse-CDF (``per_sample``),
          run shard-locally. The proposal is STRATIFIED:
          ``P_tilde(i) = (1/n) p_i^a / mass_shard``; its exact
          importance weight ``(N_glob P_tilde(i))^-beta`` equals the
          local raw PER weight (the n's cancel — see per_sample), so
          the estimator is the standard PER partial-correction
          estimator under a stratified proposal: identical expectation
          to the replicated sampler at beta=1 for ANY loss, identical
          sampling distribution whenever shard masses are equal, and
          stratification is a variance reduction, not a bias
          (tests/test_sharded_learner.py quantifies all three);
        * the per-update serial chain carries ONE collective round: the
          raw-weighted partial gradients and loss psum, the local weight
          maxima pmax (the batch-max normalizer is linear in the
          gradient, so normalization follows the psum);
        * priority write-back is shard-local; Adam runs replicated on
          the psum'd gradient (bit-identical across shards).

        Semantics source: train_iterative.py:49-76,132-168."""
        from jax.sharding import PartitionSpec as P

        cfg = self.cfg
        ax = self.data_axis
        n = self.mesh.shape[ax]
        bs_local = cfg.batch_size // n
        bs = cfg.batch_size
        K = cfg.updates_per_iteration
        flat_b0, unravel = self._flat_util(state.params_b)
        flat_t0, _ = self._flat_util(state.target_b)
        grad_mask = self._grad_mask
        tx = self.tx(None)

        key, k_noise, k_u = jax.random.split(state.key, 3)
        # per-update noise is GLOBAL (the whole batch of update k flows
        # through one noise draw, as in the replicated path); the sample
        # uniforms are per-shard (k_u folded with the shard index inside)
        noise_all = jax.vmap(
            lambda k: qnet_sample_noise(k, state.params_b)
        )(jax.random.split(k_noise, K))
        noise2_all = jax.tree_util.tree_map(
            lambda x: jnp.stack([x, jnp.zeros_like(x)], axis=1), noise_all
        )

        buf = state.buffer
        opt_leaves, opt_def = jax.tree_util.tree_flatten(state.opt_state)

        def shard_fn(flat_b0, flat_t0, opt_leaves, data, prios, p_alpha,
                     chunk_sums, pos, size, traj, noise2_all, k_u,
                     grad_mask, train_steps0, frame0):
            me = jax.lax.axis_index(ax)
            u_all = jax.random.uniform(
                jax.random.fold_in(k_u, me), (K, bs_local), jnp.float32
            )
            buffer = PERBuffer(data=data, prios=prios, p_alpha=p_alpha,
                               chunk_sums=chunk_sums, pos=pos, size=size)
            flat_tr = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), traj
            )
            buffer = per_push(buffer, flat_tr, cfg.per_alpha)
            opt_state = jax.tree_util.tree_unflatten(opt_def, opt_leaves)

            def do_update(carry, xs):
                flat_b, flat_t, opt_state, buffer, train_steps, frame = carry
                noise2, u01 = xs
                frame = frame + 1
                beta = beta_schedule(
                    frame, cfg.per_beta_start, cfg.per_beta_frames
                )
                sample = per_sample(
                    buffer, None, bs_local, beta, u01=u01, normalize=False
                )
                tr = sample.batch
                d = buffer.obs_dim
                pairs = sample.data[:, : 2 * d].reshape(2 * bs_local, d)
                nexts = sample.data[:, d: 2 * d]
                x2 = jnp.stack([pairs, jnp.concatenate([nexts, nexts])])
                w_raw = sample.weights          # exact stratified-IS raw

                def loss_fn(flat):
                    td = self._double_dqn_td(
                        flat, flat_t, unravel, x2, tr.action, tr.reward,
                        tr.done, noise2, bs_local,
                    )
                    # UNnormalized local partial sum; the global
                    # (1/(bs*wmax)) scale follows the collectives
                    return jnp.sum(w_raw * td * td), jnp.abs(td)

                (raw_sum, td_abs), g_raw = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(flat_b)
                # ONE collective round on the serial chain
                g_sum, loss_sum = jax.lax.psum((g_raw, raw_sum), ax)
                wmax = jax.lax.pmax(jnp.max(w_raw), ax)
                scale = 1.0 / (bs * jnp.maximum(wmax, 1e-30))
                updates, opt_state = tx.update(
                    g_sum * scale * grad_mask, opt_state, flat_b
                )
                flat_b = optax.apply_updates(flat_b, updates)
                buffer = per_update_priorities(
                    buffer, sample.indices, td_abs, cfg.per_alpha,
                    cfg.per_eps,
                )
                train_steps = train_steps + 1
                flat_t = self._sync_target(flat_b, flat_t, train_steps)
                return (flat_b, flat_t, opt_state, buffer, train_steps,
                        frame), loss_sum * scale

            carry0 = (flat_b0, flat_t0, opt_state, buffer, train_steps0,
                      frame0)
            # readiness is constant across the block (size set by the
            # push above, identical on every shard): one cond outside
            ready = buffer.size >= bs_local

            def run_all(carry):
                return jax.lax.scan(
                    do_update, carry, (noise2_all, u_all), length=K
                )

            def skip_all(carry):
                return carry, jnp.zeros((K,), jnp.float32)

            carry, losses = jax.lax.cond(ready, run_all, skip_all, carry0)
            flat_b, flat_t, opt_state, buffer, train_steps, frame = carry
            n_ran = jnp.where(ready, K, 0).astype(jnp.int32)
            return (flat_b, flat_t,
                    jax.tree_util.tree_leaves(opt_state),
                    buffer.data, buffer.prios, buffer.p_alpha,
                    buffer.chunk_sums, buffer.pos, buffer.size,
                    train_steps, frame, losses, n_ran)

        d3 = P(None, ax, None)
        d2 = P(None, ax)
        traj_spec = Transition(obs=d3, action=d2, reward=d2,
                               next_obs=d3, done=d2)
        (flat_b, flat_t, opt_leaves2, bdata, bprios, bpa, bcs, bpos,
         bsize, train_steps, frame, losses, n_ran) = jax.shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(), P(), P(), P(ax), P(ax), P(ax), P(ax), P(), P(),
                      traj_spec, P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P(ax), P(ax), P(ax), P(ax), P(), P(),
                       P(), P(), P(), P()),
            check_vma=False,
        )(flat_b0, flat_t0, opt_leaves, buf.data, buf.prios, buf.p_alpha,
          buf.chunk_sums, buf.pos, buf.size, traj, noise2_all, k_u,
          grad_mask, state.train_steps, state.frame_idx)

        state = state._replace(
            key=key,
            params_b=unravel(flat_b),
            target_b=unravel(flat_t),
            opt_state=jax.tree_util.tree_unflatten(opt_def, opt_leaves2),
            buffer=PERBuffer(data=bdata, prios=bprios, p_alpha=bpa,
                             chunk_sums=bcs, pos=bpos, size=bsize),
            train_steps=train_steps,
            frame_idx=frame,
        )
        mean_loss = jnp.sum(losses) / jnp.maximum(
            n_ran.astype(jnp.float32), 1.0
        )
        return state, mean_loss, n_ran

    # -- learner update ----------------------------------------------------
    def _update(self, state: DQNTrainState):
        """K Double-DQN updates. The scan carries the RAVELED online/target
        parameter vectors (see the optimizer note above): per-leaf pytree
        ops are ~50 serial kernels per update on a latency-bound chain."""
        if self._pallas_update_ok:
            return self._update_pallas(state)
        cfg = self.cfg
        flat_b0, unravel = self._flat_util(state.params_b)
        flat_t0, _ = self._flat_util(state.target_b)
        grad_mask = self._grad_mask
        bs = cfg.batch_size
        K = cfg.updates_per_iteration

        # Everything that does not depend on the evolving carry is drawn
        # ONCE, batched over the K updates, and fed through scan's xs —
        # PRNG kernels and noise construction would otherwise sit on the
        # serialized chain (~1.5 us of launch latency per kernel).
        key, k_noise, k_u = jax.random.split(state.key, 3)
        noise_all = jax.vmap(
            lambda k: qnet_sample_noise(k, state.params_b)
        )(jax.random.split(k_noise, K))
        # slot 1 = zero noise for the target net's mu-only forward
        noise2_all = jax.tree_util.tree_map(
            lambda x: jnp.stack([x, jnp.zeros_like(x)], axis=1), noise_all
        )
        u_all = jax.random.uniform(k_u, (K, bs), jnp.float32)

        def do_update(carry, xs):
            flat_b, flat_t, opt_state, buffer, train_steps, frame = carry
            noise2, u01 = xs
            frame = frame + 1
            beta = beta_schedule(frame, cfg.per_beta_start, cfg.per_beta_frames)
            sample = per_sample(buffer, None, bs, beta, u01=u01)
            tr = sample.batch
            d = buffer.obs_dim
            # dual-net forward: online (rows 0) + target (rows 1) stacked
            # into ONE batched apply — halves the serialized matmul count.
            # Packed sample rows make the (s, s') concat a plain reshape
            # (interleaved (obs_i, next_i) row pairs); the target lane
            # wastes half its rows on a duplicate, which is cheaper than a
            # second kernel chain.
            pairs = sample.data[:, : 2 * d].reshape(2 * bs, d)
            nexts = sample.data[:, d: 2 * d]
            x2 = jnp.stack([pairs, jnp.concatenate([nexts, nexts])])

            def loss_fn(flat):
                td = self._double_dqn_td(
                    flat, flat_t, unravel, x2, tr.action, tr.reward,
                    tr.done, noise2, bs,
                )
                loss = jnp.mean(sample.weights * td * td)
                return loss, jnp.abs(td)

            (loss, td_abs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                flat_b
            )
            tx = self.tx(None)
            updates, opt_state = tx.update(grads * grad_mask, opt_state, flat_b)
            flat_b = optax.apply_updates(flat_b, updates)
            buffer = per_update_priorities(
                buffer, sample.indices, td_abs, cfg.per_alpha, cfg.per_eps
            )
            train_steps = train_steps + 1
            flat_t = self._sync_target(flat_b, flat_t, train_steps)
            return (flat_b, flat_t, opt_state, buffer, train_steps,
                    frame), loss

        def skip(carry, xs):
            return carry, jnp.float32(0.0)

        def scan_fn(carry, xs):
            ready = carry[3].size >= cfg.batch_size
            carry, loss = jax.lax.cond(ready, do_update, skip, carry, xs)
            return carry, (loss, ready)

        carry0 = (flat_b0, flat_t0, state.opt_state, state.buffer,
                  state.train_steps, state.frame_idx)
        carry, (losses, ran) = jax.lax.scan(
            scan_fn, carry0, (noise2_all, u_all), length=K
        )
        flat_b, flat_t, opt_state, buffer, train_steps, frame = carry
        state = state._replace(
            key=key,
            params_b=unravel(flat_b),
            target_b=unravel(flat_t),
            opt_state=opt_state,
            buffer=buffer,
            train_steps=train_steps,
            frame_idx=frame,
        )
        n_ran = jnp.sum(ran.astype(jnp.int32))
        mean_loss = jnp.sum(losses) / jnp.maximum(n_ran.astype(jnp.float32), 1.0)
        return state, mean_loss, n_ran

    # -- one full iteration ------------------------------------------------
    def _train_iteration(
        self, state: DQNTrainState, opp_stack: QNetParams, pool_size: Array
    ) -> Tuple[DQNTrainState, DQNMetrics]:
        ep_before = state.episodes
        if self._learner_sharded:
            state, stats, ret_sum, traj = self._rollout(
                state, opp_stack, pool_size, push=False
            )
            state, mean_loss, n_ran = self._push_update_sharded(state, traj)
        else:
            state, stats, ret_sum = self._rollout(state, opp_stack, pool_size)
            state, mean_loss, n_ran = self._update(state)
        metrics = DQNMetrics(
            episodes=state.episodes - ep_before,
            games_vs_a=stats[0],
            wins_vs_a=stats[1],
            games_vs_pool=stats[2],
            wins_vs_pool=stats[3],
            episode_return_sum=ret_sum,
            mean_loss=mean_loss,
            updates_run=n_ran,
            epsilon=state.epsilon,
            train_steps=state.train_steps,
            # sharded mode: buffer.size counts the LOCAL ring; report the
            # global fill (shards stay symmetric, pushes are lockstep)
            buffer_size=state.buffer.size * (
                self.mesh.shape[self.data_axis] if self._learner_sharded
                else 1
            ),
            env_steps=jnp.int32(self.cfg.rollout_length * self.cfg.num_envs),
        )
        return state, metrics
