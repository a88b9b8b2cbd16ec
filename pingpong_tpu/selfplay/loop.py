"""Iterative self-play with win-rate-gated generation promotion (QNet).

Host-side control flow mirroring
``/root/reference/scripts/train_iterative.py:210-297`` exactly:

* learner B trains against frozen A (or a pool member, per-episode with
  prob ``opponent_pool_ratio``) for ``episodes_per_generation`` episodes;
* B is evaluated greedily vs A over ``eval_episodes`` games and vs the
  pool (uniform per-game opponent; empty pool counts as win rate 1.0,
  ref :183-196);
* both win rates >= thresholds → promotion: A <- B, checkpoint
  ``model{id}-{gen}``; otherwise retry, and after
  ``max_retries_for_generation`` tries checkpoint ``..._fault``, reset B
  to the original weights with a fresh buffer/optimizer/epsilon, and count
  the generation done anyway (ref :267-295);
* the pool is loaded once at startup from every checkpoint in the ckpt
  dir — fault checkpoints included, as the reference does (ref :199-207);
* full-train-state autosave (PER buffer, env states, optimizer, counters,
  host key) every ``save_latest_checkpoint_interval_steps`` train steps
  via Orbax, restored as tier 0 on startup — the reference QNet trainer
  has NO crash resume at all (a mid-generation crash loses everything
  since the last promotion); this adopts the RNN trainer's autosave idea
  (train_rnn_iterative.py:630-667) and exceeds it by keeping the buffer.

The device side is fully batched: training episodes come from
``DQNLearner.train_iteration`` (num_envs lockstep envs), evaluation from
one jitted while-loop over all eval games at once
(:mod:`pingpong_tpu.evaluation.match`).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp

from pingpong_tpu.checkpoint.serialize import qnet_to_dict
from pingpong_tpu.checkpoint.store import save_checkpoint
from pingpong_tpu.config.schema import DQNConfig, EnvConfig
from pingpong_tpu.evaluation.match import (
    QNET,
    PolicySpec,
    make_match_fn,
)
from pingpong_tpu.models.qnet import QNetParams, qnet_init
from pingpong_tpu.selfplay.pool import load_params_any, load_pool
from pingpong_tpu.train.dqn import DQNLearner, stack_opponents
from pingpong_tpu.utils.metrics import MetricsLogger, Stopwatch, WinRateWindow


@dataclasses.dataclass
class GenerationRecord:
    generation: int
    promoted: bool
    tries: int
    win_vs_a: float
    win_vs_pool: float
    episodes: int
    checkpoint: str


class QNetSelfPlay:
    """Driver object; ``run()`` executes the full generation loop."""

    def __init__(
        self,
        env_cfg: EnvConfig,
        cfg: DQNConfig,
        workdir: str = ".",
        seed: int = 0,
        logger: Optional[MetricsLogger] = None,
        mesh_cfg=None,
    ):
        self.env_cfg = env_cfg
        self.cfg = cfg
        self.workdir = Path(workdir)
        self.ckpt_dir = self.workdir / cfg.ckpt_dir
        self.logger = logger or MetricsLogger()
        # multi-chip: span every visible device with a data-axis mesh and
        # shard the env batch / replay over it (SPMD via jit + shardings)
        mesh = None
        if mesh_cfg is not None and len(jax.devices()) > 1:
            from pingpong_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(mesh_cfg)
            self.logger.log({"event": "mesh", "devices": len(jax.devices()),
                             "shape": dict(mesh.shape)})
        self.learner = DQNLearner(env_cfg, cfg, mesh=mesh)
        self.key = jax.random.PRNGKey(seed)

        # ---- initial weights: warm start or random (ref :86-108)
        self.init_params: QNetParams
        epsilon0 = 1.0
        episodes0 = 0
        if cfg.init_model_path:
            payload_params = load_params_any(self.workdir / cfg.init_model_path)
            self.init_params = payload_params
            from pingpong_tpu.checkpoint.store import load_checkpoint

            payload = load_checkpoint(self.workdir / cfg.init_model_path)
            epsilon0 = float(payload.get("epsilon", cfg.min_epsilon))
            episodes0 = int(payload.get("episode", 0))
        else:
            self.key, k = jax.random.split(self.key)
            self.init_params = qnet_init(k)

        self.params_a = self.init_params
        self._refresh_a_play()
        self.key, k_state = jax.random.split(self.key)
        self.state = self.learner.shard_state(
            self.learner.init_state(
                k_state, self.init_params, epsilon=epsilon0, episodes=episodes0
            )
        )

        # ---- opponent pool, loaded once (ref :199-207; faults included)
        self.pool: List[QNetParams] = load_pool(
            self.ckpt_dir, kind="qnet", limit=cfg.pool_max
        )

        # ---- eval runner (greedy QNet vs QNet)
        from pingpong_tpu.env.pong import env_params_from_config

        self.env_params = env_params_from_config(env_cfg)
        self.match_fn = make_match_fn(
            self.env_params, PolicySpec(QNET, None), PolicySpec(QNET, None)
        )

        from pingpong_tpu.checkpoint.orbax_io import AsyncAutosaver

        self._autosaver = AsyncAutosaver()
        self.win_a_window = WinRateWindow(cfg.selfplay.win_rate_interval)
        self.win_pool_window = WinRateWindow(cfg.selfplay.win_rate_interval)
        self.records: List[GenerationRecord] = []
        self.reward_history: List[float] = []

        # ---- tier-0 restore: full-state autosave (buffer included)
        self.done_generations = 0
        self.current_generation = 0
        self._since_autosave = 0
        self._resumed_mid_generation = False
        latest = self.ckpt_dir / cfg.latest_checkpoint_filename
        from pingpong_tpu.checkpoint.orbax_io import is_train_state_checkpoint

        if is_train_state_checkpoint(latest):
            try:
                self._restore_full_state(latest)
                self.logger.log({"event": "restore", "tier": 0,
                                 "path": str(latest)})
            except Exception as e:
                self.logger.log({"event": "restore_failed", "tier": 0,
                                 "error": str(e)})

    # -- full-state autosave / restore --------------------------------------
    def autosave(self, wait: bool = False) -> str:
        """Full-state autosave. Default (``cfg.async_autosave``): a sub-ms
        on-device snapshot, serialized + written on a worker thread off
        the train loop (SURVEY §5 async-Orbax). ``wait=True`` blocks until
        the file is durably on disk (final save, tests)."""
        from pingpong_tpu.checkpoint.orbax_io import autosave_full_state
        from pingpong_tpu.parallel.mesh import is_coordinator

        if not is_coordinator():   # host-0 owns all checkpoint writes
            return str(self.ckpt_dir / self.cfg.latest_checkpoint_filename)
        target = self.ckpt_dir / self.cfg.latest_checkpoint_filename
        meta = {
            "generation": self.current_generation,
            "done_generations": self.done_generations,
            "model_kind": "qnet",
            # persist the frozen-A stale-noise draw so resume re-folds
            # the identical noise (parity with the reference's noise
            # buffers surviving until the next checkpoint load)
            "a_fold_key": (
                [int(x) for x in jax.device_get(self._a_fold_key)]
                if self._a_fold_key is not None else None
            ),
        }
        if self.cfg.async_autosave:
            path = self._autosaver.save(
                target, (self.state, self.params_a, self.key), meta
            )
            if wait:
                self._autosaver.wait()
        else:
            path = autosave_full_state(
                target, self.state, self.params_a, self.key, meta
            )
        self.logger.log({"event": "autosave",
                         "train_steps": int(self.state.train_steps)})
        return str(path)

    def flush_autosave(self) -> None:
        """Join any in-flight async autosave write."""
        self._autosaver.wait()

    def _restore_full_state(self, path) -> None:
        from pingpong_tpu.checkpoint.orbax_io import restore_full_state

        k0 = jax.random.PRNGKey(0)
        template = self.learner.shard_state(
            self.learner.init_state(k0, qnet_init(k0))
        )
        self.state, self.params_a, self.key, meta = restore_full_state(
            path, template, template.params_b, self.key,
        )
        self.current_generation = int(meta.get("generation", 0))
        self.done_generations = int(meta.get("done_generations", 0))
        saved_fold = meta.get("a_fold_key")
        self._refresh_a_play(
            fold_key=jnp.asarray(saved_fold, dtype=jnp.uint32)
            if saved_fold is not None else None
        )
        # continue the interrupted generation with the restored B (do not
        # start a fresh one at run() entry)
        self._resumed_mid_generation = (
            self.current_generation > self.done_generations
        )

    # -- helpers -----------------------------------------------------------
    def _refresh_a_play(self, fold_key=None) -> None:
        """The A that actually PLAYS. With ``frozen_a_stale_noise`` the
        reference quirk applies: one noise draw per A-lifetime folded into
        the heads (train_iterative.py:86-104 leaves modelA in train mode
        with its checkpoint's noise buffers); refreshed only when A
        changes, exactly as the reference's buffers persist until the
        next checkpoint load. The draw's key is remembered (and persisted
        in the autosave meta) so a resumed run re-folds the SAME noise —
        an interrupted generation continues against a bit-identical A.
        Default: mu-greedy (clean A)."""
        if self.cfg.selfplay.frozen_a_stale_noise:
            from pingpong_tpu.models.qnet import (
                qnet_fold_noise,
                qnet_sample_noise,
            )

            if fold_key is None:
                self.key, fold_key = jax.random.split(self.key)
            self._a_fold_key = fold_key
            self.params_a_play = qnet_fold_noise(
                self.params_a, qnet_sample_noise(fold_key, self.params_a)
            )
        else:
            self._a_fold_key = None
            self.params_a_play = self.params_a

    def _opp_stack(self):
        # exactly-sized stack: all slots' Q-values compute every step, so
        # right-sizing beats padding to pool_max (the pool is fixed for the
        # whole QNet run, ref :199-207 — compiled once)
        return stack_opponents(self.params_a_play, self.pool, len(self.pool))

    def _eval_vs(self, params_a_list: List[QNetParams], n_games: int) -> float:
        """B (current learner) vs a uniform-per-game set of opponents."""
        if not params_a_list:
            return 1.0
        if self.cfg.selfplay.swap_sides_eval and self.cfg.use_pallas_eval:
            # side-balanced gate on the FUSED eval stream: each seating is
            # a separate kernel packing (seat 2 puts the frozen opponent
            # in the learner slot and B mirror-folded on top; B's wins
            # there = episodes - opponent wins - draws). Pool quota splits
            # evenly across members, as the single-seat fused path does.
            from pingpong_tpu.evaluation.fast_eval import (
                pallas_win_rate_balanced,
            )

            per = max(2, n_games // len(params_a_list))
            wins_sum = 0.0
            w_b_sum = 0.0
            w_a_sum = 0.0
            total = 0
            for opp in params_a_list:
                self.key, k = jax.random.split(self.key)
                wr, as_b, as_a, eps = pallas_win_rate_balanced(
                    self.env_params, opp, self.state.params_b, k,
                    min_episodes=per,
                    n_envs=min(self.cfg.num_envs, 8192),
                    tile_rows=min(self.cfg.pallas_tile_rows,
                                  self.cfg.num_envs, 8192),
                )
                wins_sum += wr * eps
                w_b_sum += as_b * eps
                w_a_sum += as_a * eps
                total += eps
            self.logger.log({
                "event": "eval_seats",
                "win_as_b": w_b_sum / max(total, 1),
                "win_as_a": w_a_sum / max(total, 1),
            })
            return wins_sum / max(total, 1)
        if self.cfg.selfplay.swap_sides_eval:
            # side-balanced gate via the batched while-loop match runner
            # (use_pallas_eval=false)
            from pingpong_tpu.evaluation.match import eval_win_rate_balanced

            stack_opp = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *params_a_list
            )
            stack_b = jax.tree_util.tree_map(
                lambda x: x[None], self.state.params_b
            )
            self.key, k_idx, k_games = jax.random.split(self.key, 3)
            idx_opp = jax.random.randint(
                k_idx, (n_games,), 0, len(params_a_list)
            ).astype(jnp.int32)
            idx_b = jnp.zeros((n_games,), jnp.int32)
            total, as_b, as_a = eval_win_rate_balanced(
                self.match_fn, stack_opp, stack_b, idx_opp, idx_b,
                k_games, n_games,
            )
            self.logger.log({"event": "eval_seats", "win_as_b": as_b,
                             "win_as_a": as_a})
            return total
        if self.cfg.use_pallas_eval:
            # fused-kernel episode streaming (>= n_games episodes); pool
            # eval splits the quota evenly across members
            from pingpong_tpu.evaluation.fast_eval import pallas_win_rate

            per = max(1, n_games // len(params_a_list))
            wins = 0.0
            total = 0
            for opp in params_a_list:
                self.key, k = jax.random.split(self.key)
                wr, eps = pallas_win_rate(
                    self.env_params, opp, self.state.params_b, k,
                    min_episodes=per,
                    n_envs=min(self.cfg.num_envs, 8192),
                    tile_rows=min(self.cfg.pallas_tile_rows,
                                  self.cfg.num_envs, 8192),
                )
                wins += wr * eps
                total += eps
            return wins / max(total, 1)
        stack_a = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *params_a_list
        )
        stack_b = jax.tree_util.tree_map(
            lambda x: x[None], self.state.params_b
        )
        self.key, k_idx, k_games = jax.random.split(self.key, 3)
        idx_a = jax.random.randint(
            k_idx, (n_games,), 0, len(params_a_list)
        ).astype(jnp.int32)
        idx_b = jnp.zeros((n_games,), jnp.int32)
        keys = jax.random.split(k_games, n_games)
        result = self.match_fn(stack_a, stack_b, idx_a, idx_b, keys)
        return float(jnp.mean(result.win_b.astype(jnp.float32)))

    def _save(self, name: str, generation: int) -> str:
        from pingpong_tpu.checkpoint.serialize import opt_state_to_leaves
        from pingpong_tpu.parallel.mesh import is_coordinator

        if not is_coordinator():   # host-0 owns all checkpoint writes
            return str(self.ckpt_dir / name)
        payload = {
            "params_b": qnet_to_dict(jax.device_get(self.state.params_b)),
            "params_a": qnet_to_dict(jax.device_get(self.params_a)),
            "opt_state": opt_state_to_leaves(self.state.opt_state),
            "epsilon": float(self.state.epsilon),
            "episode": int(self.state.episodes),
            "generation": generation,
            "train_steps": int(self.state.train_steps),
            "model_kind": "qnet",
        }
        path = save_checkpoint(self.ckpt_dir / name, payload)
        if self.cfg.keep_checkpoints > 0 or self.cfg.keep_fault_checkpoints > 0:
            from pingpong_tpu.checkpoint.retention import apply_retention

            deleted = apply_retention(
                self.ckpt_dir,
                keep_promoted=self.cfg.keep_checkpoints,
                keep_faults=self.cfg.keep_fault_checkpoints,
                protect=[Path(self.cfg.init_model_path).name]
                if self.cfg.init_model_path else None,
            )
            if deleted:
                self.logger.log({"event": "retention", "deleted": deleted})
        return str(path)

    # -- main loop ---------------------------------------------------------
    def _train_block(self, episodes_target: int) -> None:
        """Run jitted iterations until ``episodes_target`` more episodes
        complete (the reference's inner episode loop, :233-261)."""
        sp = self.cfg.selfplay
        start_eps = int(self.state.episodes)
        goal = start_eps + episodes_target
        watch = Stopwatch()
        opp, pool_size = self._opp_stack()
        # pack ONCE per block: the stack is fixed for the whole block and
        # re-packing it inside every jitted iteration is dispatch tax
        opp = self.learner.prepare_opponents(opp)
        pool_size = jnp.int32(pool_size)
        env_steps = 0
        last_log_eps = start_eps
        while int(self.state.episodes) < goal:
            steps_before = int(self.state.train_steps)
            self.state, m = self.learner.train_iteration(self.state, opp, pool_size)
            env_steps += int(m.env_steps)
            self._since_autosave += int(self.state.train_steps) - steps_before
            if (
                self.cfg.save_latest_checkpoint_interval_steps > 0
                and self._since_autosave
                >= self.cfg.save_latest_checkpoint_interval_steps
            ):
                self._since_autosave = 0
                self.autosave()
            self.win_a_window.add(int(m.games_vs_a), int(m.wins_vs_a))
            self.win_pool_window.add(int(m.games_vs_pool), int(m.wins_vs_pool))
            if int(m.episodes) > 0:
                self.reward_history.append(
                    float(m.episode_return_sum) / int(m.episodes)
                )
            eps_now = int(self.state.episodes)
            if eps_now - last_log_eps >= sp.win_rate_interval:
                dt = watch.lap()
                steps_per_s = env_steps / max(dt, 1e-9)
                env_steps = 0
                last_log_eps = eps_now
                self.logger.log(
                    {
                        "event": "interval",
                        "episode": eps_now,
                        "win_vs_A": self.win_a_window.rate(),
                        "win_vs_pool": self.win_pool_window.rate(),
                        "epsilon": float(m.epsilon),
                        "loss": float(m.mean_loss),
                        "env_steps_per_s": steps_per_s,
                        "buffer": int(m.buffer_size),
                    }
                )

    def run(self) -> List[GenerationRecord]:
        sp = self.cfg.selfplay
        while self.done_generations < sp.max_generations:
            if self._resumed_mid_generation:
                # continue the restored in-flight generation's label; B's
                # state (buffer/optimizer/epsilon) came from the autosave
                self._resumed_mid_generation = False
            else:
                self.current_generation += 1
            current_generation = self.current_generation
            tries = 0
            while True:
                tries += 1
                self.logger.log(
                    {"event": "try", "generation": current_generation, "try": tries}
                )
                self._train_block(sp.episodes_per_generation)

                w_a = self._eval_vs([self.params_a_play], sp.eval_episodes)
                w_pool = self._eval_vs(self.pool, sp.eval_episodes)
                self.logger.log(
                    {
                        "event": "eval",
                        "generation": current_generation,
                        "win_vs_A": w_a,
                        "win_vs_pool": w_pool,
                        "epsilon": float(self.state.epsilon),
                    }
                )

                if w_a >= sp.curr_win_threshold and w_pool >= sp.pool_win_threshold:
                    # promote: A <- B (ref :267-281)
                    self.params_a = jax.tree_util.tree_map(
                        jnp.copy, self.state.params_b
                    )
                    self._refresh_a_play()
                    name = f"model{self.cfg.model_id}-{current_generation}"
                    path = self._save(name, current_generation)
                    self.records.append(
                        GenerationRecord(
                            current_generation, True, tries, w_a, w_pool,
                            int(self.state.episodes), path,
                        )
                    )
                    self.logger.log(
                        {"event": "promoted", "generation": current_generation,
                         "checkpoint": path}
                    )
                    self.done_generations += 1
                    break
                if tries >= sp.max_retries_for_generation:
                    name = f"model{self.cfg.model_id}-{current_generation}_fault"
                    path = self._save(name, current_generation)
                    self.records.append(
                        GenerationRecord(
                            current_generation, False, tries, w_a, w_pool,
                            int(self.state.episodes), path,
                        )
                    )
                    self.logger.log(
                        {"event": "fault", "generation": current_generation,
                         "checkpoint": path}
                    )
                    # reset B to original weights, fresh everything (ref :213-224)
                    self.state = self.learner.reset_learner(
                        self.state, self.init_params
                    )
                    self.done_generations += 1
                    break
        if self.cfg.save_latest_checkpoint_interval_steps > 0:
            # final full state; wait=True joins the write — durability
            # contract stated here once (no separate flush needed)
            self.autosave(wait=True)
        else:
            self.flush_autosave()   # join any in-flight periodic save
        return self.records
