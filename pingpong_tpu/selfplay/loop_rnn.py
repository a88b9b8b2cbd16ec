"""Iterative self-play with generation promotion for the DRQN (LSTM) agent.

Host-side control flow mirroring
``/root/reference/scripts/train_rnn_iterative.py:707-898``:

* each new generation starts B from A's weights with a fresh optimizer /
  target and per-generation epsilon reset (ref :714-722);
* promotion gate: eval win rate vs A AND vs the whole pool clears the
  thresholds; the pool eval splits ``eval_episodes`` evenly across pool
  members and aggregates (ref :815-822);
* on promotion the new generation is APPENDED to the runtime pool (unlike
  the QNet trainer; ref :855-859); on exhausted retries a ``_fault``
  checkpoint is written, B is reset (buffer kept), and the generation
  counts as done (ref :876-898);
* fault checkpoints are excluded when the pool is loaded from disk
  (ref :610);
* **3-tier restore** (ref :221-339): (1) the full-state autosave
  ``latest_rnn_training_state`` resumes models, optimizer, epsilon and all
  loop counters; (2) else ``init_model_path_rnn`` warm-starts the weights
  (key chain params_a -> params_b); (3) else random init with B <- A;
* full training state autosaves every
  ``save_latest_checkpoint_interval_steps`` train steps (ref :518-521),
  via Orbax — INCLUDING the sequence replay ring buffer, env states,
  hidden states and the host PRNG key, so a killed run continues
  bit-compatibly (the reference's autosave stores only weights/optimizer/
  counters and loses its replay memory, :630-667; its ``.error_backup``
  fallback is superseded by atomic rename).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp

from pingpong_tpu.checkpoint.serialize import params_from_dict, qnet_rnn_to_dict
from pingpong_tpu.checkpoint.store import is_checkpoint, load_checkpoint, save_checkpoint
from pingpong_tpu.config.schema import DRQNConfig, EnvConfig
from pingpong_tpu.env.pong import env_params_from_config
from pingpong_tpu.evaluation.match import RNN, PolicySpec, make_match_fn
from pingpong_tpu.models.qnet_rnn import QNetRNNParams
from pingpong_tpu.selfplay.loop import GenerationRecord
from pingpong_tpu.selfplay.pool import load_pool
from pingpong_tpu.train.drqn import DRQNLearner, stack_rnn_opponents
from pingpong_tpu.utils.metrics import MetricsLogger, Stopwatch, WinRateWindow


class DRQNSelfPlay:
    def __init__(
        self,
        env_cfg: EnvConfig,
        cfg: DRQNConfig,
        workdir: str = ".",
        seed: int = 0,
        logger: Optional[MetricsLogger] = None,
        mesh_cfg=None,
    ):
        self.env_cfg = env_cfg
        self.cfg = cfg
        self.workdir = Path(workdir)
        self.ckpt_dir = self.workdir / cfg.ckpt_dir_rnn
        self.logger = logger or MetricsLogger()
        mesh = None
        if mesh_cfg is not None and len(jax.devices()) > 1:
            from pingpong_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(mesh_cfg)
            self.logger.log({"event": "mesh", "devices": len(jax.devices()),
                             "shape": dict(mesh.shape)})
        self.learner = DRQNLearner(env_cfg, cfg, mesh=mesh)
        self.key = jax.random.PRNGKey(seed)
        self.env_params = env_params_from_config(env_cfg)
        self.match_fn = make_match_fn(
            self.env_params, PolicySpec(RNN, None), PolicySpec(RNN, None)
        )
        self.win_a_window = WinRateWindow(cfg.selfplay.win_rate_interval)
        self.win_pool_window = WinRateWindow(cfg.selfplay.win_rate_interval)
        self.records: List[GenerationRecord] = []
        self.reward_history: List[float] = []

        # runtime pool from disk, faults excluded (ref :610)
        self.pool: List[QNetRNNParams] = load_pool(
            self.ckpt_dir, kind="qnet_rnn", skip_fault=True, limit=cfg.pool_max
        )

        from pingpong_tpu.checkpoint.orbax_io import AsyncAutosaver

        self._autosaver = AsyncAutosaver()

        # ---- 3-tier restore -------------------------------------------------
        self.done_generations = 0
        self.current_generation = 0
        self._since_autosave = 0
        self._resumed_mid_generation = False
        latest = self.ckpt_dir / cfg.latest_checkpoint_filename
        restored = False
        from pingpong_tpu.checkpoint.orbax_io import is_train_state_checkpoint

        if is_train_state_checkpoint(latest):
            try:
                self._restore_full_state(latest)
                restored = True
                self.logger.log({"event": "restore", "tier": 1, "path": str(latest)})
            except Exception as e:
                self.logger.log({"event": "restore_failed", "tier": 1, "error": str(e)})
        if not restored and cfg.init_model_path_rnn:
            init_path = self.workdir / cfg.init_model_path_rnn
            if is_checkpoint(init_path):
                payload = load_checkpoint(init_path)
                params = None
                for k in ("params_a", "params_b", "params"):
                    if payload.get(k) is not None:
                        params = params_from_dict(payload[k])
                        break
                if params is not None:
                    self.params_a = params
                    self.key, k_state = jax.random.split(self.key)
                    self.state = self.learner.init_state(k_state, params)
                    self.init_params = params
                    restored = True
                    self.logger.log(
                        {"event": "restore", "tier": 2, "path": str(init_path)}
                    )
        if not restored:
            self.key, k_model, k_state = jax.random.split(self.key, 3)
            params = self.learner.init_params(k_model)
            self.params_a = params
            self.init_params = params
            self.state = self.learner.init_state(k_state, params)
            self.logger.log({"event": "restore", "tier": 3})

    # -- full-state autosave / restore (ref :630-667, :237-290) -------------
    def autosave(self, wait: bool = False) -> str:
        """Orbax full-state autosave: the ENTIRE train state — sequence
        ring buffer, env states, hidden states, optimizer, counters — plus
        frozen A and the host key (exceeds ref :630-667, which loses the
        replay memory on restart). Default (``cfg.async_autosave``): the
        serialize + write run on a worker thread off the train loop;
        ``wait=True`` blocks until the file is durably on disk."""
        from pingpong_tpu.checkpoint.orbax_io import autosave_full_state
        from pingpong_tpu.parallel.mesh import is_coordinator

        if not is_coordinator():   # host-0 owns all checkpoint writes
            return str(self.ckpt_dir / self.cfg.latest_checkpoint_filename)
        target = self.ckpt_dir / self.cfg.latest_checkpoint_filename
        meta = {
            "generation": self.current_generation,
            "done_generations": self.done_generations,
            "model_kind": "qnet_rnn",
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
        self.logger.log({"event": "autosave", "train_steps": int(self.state.train_steps)})
        return str(path)

    def flush_autosave(self) -> None:
        """Join any in-flight async autosave write."""
        self._autosaver.wait()

    def _restore_full_state(self, path) -> None:
        from pingpong_tpu.checkpoint.orbax_io import (
            load_metadata,
            restore_full_state,
        )

        meta = load_metadata(path) or {}
        k0 = jax.random.PRNGKey(0)
        template = self.learner.init_state(k0, self.learner.init_params(k0))
        self.state, self.params_a, self.key, meta = restore_full_state(
            path, template, template.params_b, self.key,
        )
        self.init_params = self.params_a
        self.current_generation = int(meta.get("generation", 0))
        self.done_generations = int(meta.get("done_generations", 0))
        # The autosave was taken mid-generation: run() must continue the
        # restored generation with the restored B instead of starting the
        # next one (which would clobber B via new_generation).
        self._resumed_mid_generation = self.current_generation > self.done_generations

    # -- eval ---------------------------------------------------------------
    def _eval_vs(self, opponents: List[QNetRNNParams], n_games: int) -> float:
        """B vs opponents. Pool eval splits games evenly across members and
        aggregates (ref :815-822); single opponent gets all games."""
        if not opponents:
            return 1.0
        if self.cfg.use_pallas_eval and self.learner._pallas_ok:
            # fused recurrent eval streaming (kernel-architecture nets
            # only; others keep the while-loop match runner). Pool quota
            # splits evenly across members, as the reference does
            # (:815-822); the side-balanced mode streams each seating.
            from pingpong_tpu.evaluation.fast_eval import (
                rnn_win_rate,
                rnn_win_rate_balanced,
            )

            kw = dict(
                n_envs=min(self.cfg.num_envs, 4096),
                tile_rows=min(self.cfg.pallas_tile_rows,
                              self.cfg.num_envs, 4096),
                max_episode_steps=self.cfg.max_episode_steps,
            )
            per = max(2, n_games // len(opponents))
            if self.cfg.selfplay.swap_sides_eval:
                wins_sum = w_b_sum = w_a_sum = 0.0
                total = 0
                for opp in opponents:
                    self.key, k = jax.random.split(self.key)
                    wr, as_b, as_a, eps = rnn_win_rate_balanced(
                        self.env_params, opp, self.state.params_b, k,
                        min_episodes=per, **kw,
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
            wins_sum = 0.0
            total = 0
            for opp in opponents:
                self.key, k = jax.random.split(self.key)
                wr, eps = rnn_win_rate(
                    self.env_params, opp, self.state.params_b, k,
                    min_episodes=per, **kw,
                )
                wins_sum += wr * eps
                total += eps
            return wins_sum / max(total, 1)
        stack_a = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *opponents)
        stack_b = jax.tree_util.tree_map(lambda x: x[None], self.state.params_b)
        per = max(1, n_games // len(opponents))
        total = per * len(opponents)
        idx_a = jnp.repeat(jnp.arange(len(opponents), dtype=jnp.int32), per)
        idx_b = jnp.zeros((total,), jnp.int32)
        self.key, k_games = jax.random.split(self.key)
        if self.cfg.selfplay.swap_sides_eval:
            from pingpong_tpu.evaluation.match import eval_win_rate_balanced

            # interleaved member order so each half-seating still covers
            # every pool member evenly
            idx_tiled = jnp.tile(
                jnp.arange(len(opponents), dtype=jnp.int32), per
            )
            rate, as_b, as_a = eval_win_rate_balanced(
                self.match_fn, stack_a, stack_b, idx_tiled, idx_b,
                k_games, total,
            )
            self.logger.log({"event": "eval_seats", "win_as_b": as_b,
                             "win_as_a": as_a})
            return rate
        keys = jax.random.split(k_games, total)
        result = self.match_fn(stack_a, stack_b, idx_a, idx_b, keys)
        return float(jnp.mean(result.win_b.astype(jnp.float32)))

    def _save(self, name: str, generation: int) -> str:
        from pingpong_tpu.parallel.mesh import is_coordinator

        if not is_coordinator():   # host-0 owns all checkpoint writes
            return str(self.ckpt_dir / name)
        payload = {
            "params_b": qnet_rnn_to_dict(jax.device_get(self.state.params_b)),
            "params_a": qnet_rnn_to_dict(jax.device_get(self.params_a)),
            "epsilon": float(self.state.epsilon),
            "episode": int(self.state.episodes),
            "generation": generation,
            "train_steps": int(self.state.train_steps),
            "model_kind": "qnet_rnn",
        }
        path = save_checkpoint(self.ckpt_dir / name, payload)
        if self.cfg.keep_checkpoints > 0 or self.cfg.keep_fault_checkpoints > 0:
            from pathlib import Path as _P

            from pingpong_tpu.checkpoint.retention import apply_retention

            deleted = apply_retention(
                self.ckpt_dir,
                keep_promoted=self.cfg.keep_checkpoints,
                keep_faults=self.cfg.keep_fault_checkpoints,
                protect=[_P(self.cfg.init_model_path_rnn).name]
                if self.cfg.init_model_path_rnn else None,
            )
            if deleted:
                self.logger.log({"event": "retention", "deleted": deleted})
        return str(path)

    # -- training block ------------------------------------------------------
    def _train_block(self, episodes_target: int) -> None:
        sp = self.cfg.selfplay
        goal = int(self.state.episodes) + episodes_target
        watch = Stopwatch()
        # exactly-sized stack: opponent compute scales with slot count;
        # pool growth costs one recompile per generation
        self.state = self.learner.shard_state(self.state)
        opp, pool_size = stack_rnn_opponents(self.params_a, self.pool)
        # pack ONCE per block (see train/drqn.py::PreparedRNNOpponents)
        opp = self.learner.prepare_opponents(opp)
        pool_size = jnp.int32(pool_size)
        env_steps = 0
        last_log_eps = int(self.state.episodes)
        while int(self.state.episodes) < goal:
            steps_before = int(self.state.train_steps)
            self.state, m = self.learner.train_iteration(self.state, opp, pool_size)
            env_steps += int(m.env_steps)
            self.win_a_window.add(int(m.games_vs_a), int(m.wins_vs_a))
            self.win_pool_window.add(int(m.games_vs_pool), int(m.wins_vs_pool))
            if int(m.episodes) > 0:
                self.reward_history.append(
                    float(m.episode_return_sum) / int(m.episodes)
                )
            # autosave cadence (ref :518-521)
            self._since_autosave += int(self.state.train_steps) - steps_before
            if (
                self.cfg.save_latest_checkpoint_interval_steps > 0
                and self._since_autosave
                >= self.cfg.save_latest_checkpoint_interval_steps
            ):
                self._since_autosave = 0
                self.autosave()
            eps_now = int(self.state.episodes)
            if eps_now - last_log_eps >= sp.win_rate_interval:
                dt = watch.lap()
                self.logger.log(
                    {
                        "event": "interval",
                        "episode": eps_now,
                        "win_vs_A": self.win_a_window.rate(),
                        "win_vs_pool": self.win_pool_window.rate(),
                        "epsilon": float(m.epsilon),
                        "loss": float(m.mean_loss),
                        "env_steps_per_s": env_steps / max(dt, 1e-9),
                        "buffer_episodes": int(m.buffer_episodes),
                    }
                )
                env_steps = 0
                last_log_eps = eps_now

    # -- main loop -----------------------------------------------------------
    def run(self) -> List[GenerationRecord]:
        sp = self.cfg.selfplay
        while self.done_generations < sp.max_generations:
            if self._resumed_mid_generation:
                # Tier-1 restore landed mid-generation: keep the restored
                # generation label and in-flight B/optimizer/epsilon —
                # do NOT reset via new_generation.
                self._resumed_mid_generation = False
            else:
                self.current_generation += 1
                if self.current_generation > 1:
                    # B <- A with fresh optimizer/target/epsilon (ref :714-722)
                    self.state = self.learner.new_generation(self.state, self.params_a)
            tries = 0
            while True:
                tries += 1
                self.logger.log(
                    {"event": "try", "generation": self.current_generation,
                     "try": tries}
                )
                self._train_block(sp.episodes_per_generation)
                w_a = self._eval_vs([self.params_a], sp.eval_episodes)
                w_pool = self._eval_vs(self.pool, sp.eval_episodes)
                self.logger.log(
                    {"event": "eval", "generation": self.current_generation,
                     "win_vs_A": w_a, "win_vs_pool": w_pool}
                )
                if w_a >= sp.curr_win_threshold and w_pool >= sp.pool_win_threshold:
                    self.params_a = jax.tree_util.tree_map(
                        jnp.copy, self.state.params_b
                    )
                    name = f"{self.cfg.model_id_prefix}{self.current_generation}"
                    path = self._save(name, self.current_generation)
                    # runtime pool append (ref :855-859)
                    if len(self.pool) < self.cfg.pool_max:
                        self.pool.append(self.params_a)
                    self.records.append(GenerationRecord(
                        self.current_generation, True, tries, w_a, w_pool,
                        int(self.state.episodes), path,
                    ))
                    self.logger.log({"event": "promoted",
                                     "generation": self.current_generation,
                                     "checkpoint": path})
                    self.done_generations += 1
                    break
                if tries >= sp.max_retries_for_generation:
                    name = (
                        f"{self.cfg.model_id_prefix}"
                        f"{self.current_generation}_fault"
                    )
                    path = self._save(name, self.current_generation)
                    self.records.append(GenerationRecord(
                        self.current_generation, False, tries, w_a, w_pool,
                        int(self.state.episodes), path,
                    ))
                    self.logger.log({"event": "fault",
                                     "generation": self.current_generation,
                                     "checkpoint": path})
                    # fresh B (from A), buffer kept (ref :670-704)
                    self.state = self.learner.reset_learner(
                        self.state, self.params_a
                    )
                    self.done_generations += 1
                    break
        if self.cfg.save_latest_checkpoint_interval_steps > 0:
            # final full state; wait=True joins the write (durability
            # contract stated once — no separate flush needed)
            self.autosave(wait=True)
        else:
            self.flush_autosave()   # autosaves disabled: nothing in flight
        return self.records
