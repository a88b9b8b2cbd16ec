"""Tournament model registry: discovery, loading, batched policy dispatch.

Plays the role of the reference's per-tool candidate lists + universal
loader (``/root/reference/tests/arena.py:52-123, 160-197``;
``test_round_robin.py:117-187``): models are discovered from checkpoint
directories (or listed explicitly), tagged by family (QNet / QNetRNN /
hardcoded bot), and grouped into stacked parameter pytrees per family so a
whole tournament runs as a handful of jitted batched match programs.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from pingpong_tpu.checkpoint.store import list_checkpoints
from pingpong_tpu.evaluation.match import BOT, QNET, RNN, PolicySpec, make_match_fn
from pingpong_tpu.selfplay.pool import load_params_any

BOT_ID = "HardcodedBot"


@dataclasses.dataclass
class ModelEntry:
    id: str
    kind: int              # QNET / RNN / BOT
    path: Optional[str]
    params: Optional[object] = None

    @property
    def type_name(self) -> str:
        return {QNET: "QNet", RNN: "QNetRNN", BOT: "HardcodedBallFollower"}[self.kind]


def discover_models(
    ckpt_dirs, include_bot: bool = True, skip_fault: bool = False
) -> List[ModelEntry]:
    """Scan checkpoint directories; every loadable checkpoint becomes a
    candidate (id = directory name)."""
    entries: List[ModelEntry] = []
    seen = set()
    if isinstance(ckpt_dirs, (str, Path)):
        ckpt_dirs = [ckpt_dirs]
    for d in ckpt_dirs:
        for path in list_checkpoints(d):
            if skip_fault and "fault" in path.name:
                continue
            if "latest" in path.name:   # in-training autosaves are not candidates
                continue
            if path.name in seen:
                continue
            try:
                params = load_params_any(path)
            except (KeyError, ValueError):
                continue
            kind = RNN if type(params).__name__ == "QNetRNNParams" else QNET
            entries.append(ModelEntry(path.name, kind, str(path), params))
            seen.add(path.name)
    if include_bot:
        entries.append(ModelEntry(BOT_ID, BOT, None))
    return entries


def load_entry(entry: ModelEntry) -> ModelEntry:
    if entry.params is None and entry.kind != BOT:
        entry.params = load_params_any(entry.path)
    return entry


class MatchRunner:
    """Caches one compiled match program per (kind_a, kind_b) pair."""

    def __init__(self, env_params, max_steps: int = 20_000,
                 bot_tolerance: float = 0.02):
        self.env_params = env_params
        self.max_steps = max_steps
        self.bot_tolerance = bot_tolerance
        self._fns: Dict[Tuple[int, int], object] = {}

    def _fn(self, kind_a: int, kind_b: int):
        key = (kind_a, kind_b)
        if key not in self._fns:
            self._fns[key] = make_match_fn(
                self.env_params,
                PolicySpec(kind_a, None),
                PolicySpec(kind_b, None),
                max_steps=self.max_steps,
                bot_tolerance=self.bot_tolerance,
            )
        return self._fns[key]

    def play(self, a: ModelEntry, b: ModelEntry, n_games: int, key):
        """Play ``n_games`` of a vs b, batched. Returns MatchResult."""
        load_entry(a)
        load_entry(b)
        fn = self._fn(a.kind, b.kind)
        stack = lambda p: (
            None if p is None else jax.tree_util.tree_map(lambda x: x[None], p)
        )
        idx = jnp.zeros((n_games,), jnp.int32)
        keys = jax.random.split(key, n_games)
        return fn(stack(a.params), stack(b.params), idx, idx, keys)

    def play_pairs_batched(self, jobs, key):
        """ALL pairings in a handful of device programs.

        ``jobs``: list of ``(a: ModelEntry, b: ModelEntry, n_games)``.
        Games are grouped by (kind_a, kind_b) policy-family pair — each
        group stacks every distinct entry's params once and launches ONE
        batched match program with per-game (i, j) stack indices, instead
        of one dispatch per pairing (the reference plays every episode of
        every pairing in a host loop, /root/reference/tests/arena.py:
        246-320). Per-game PRNG keys are derived exactly as the sequential
        path derives them (one split per job in job order), so results are
        BIT-IDENTICAL to ``play`` called per job.

        Returns ``[(a, b, MatchResult), ...]`` in job order.
        """
        import numpy as np

        # per-job keys, identical to the sequential derivation
        job_keys = []
        for _ in jobs:
            key, k_match = jax.random.split(key)
            job_keys.append(k_match)

        groups: Dict[Tuple[int, int], list] = {}
        for j, (a, b, n) in enumerate(jobs):
            load_entry(a)
            load_entry(b)
            groups.setdefault((a.kind, b.kind), []).append(j)

        results = [None] * len(jobs)
        for (kind_a, kind_b), job_ids in groups.items():
            # one stack per side; slot per distinct entry id
            def build_side(pick, kind):
                slot_of, stacks = {}, []
                for j in job_ids:
                    e = pick(jobs[j])
                    if e.id not in slot_of:
                        slot_of[e.id] = len(stacks)
                        stacks.append(e.params)
                stacked = (
                    None if kind == BOT else jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *stacks)
                )
                return slot_of, stacked

            slot_a, stack_a = build_side(lambda job: job[0], kind_a)
            slot_b, stack_b = build_side(lambda job: job[1], kind_b)

            idx_a, idx_b, keys, offsets = [], [], [], {}
            total = 0
            for j in job_ids:
                a, b, n = jobs[j]
                offsets[j] = (total, total + n)
                total += n
                idx_a.append(np.full(n, slot_a[a.id], np.int32))
                idx_b.append(np.full(n, slot_b[b.id], np.int32))
                keys.append(jax.random.split(job_keys[j], n))
            fn = self._fn(kind_a, kind_b)
            res = fn(
                stack_a, stack_b,
                jnp.asarray(np.concatenate(idx_a)),
                jnp.asarray(np.concatenate(idx_b)),
                jnp.concatenate(keys),
            )
            for j in job_ids:
                lo, hi = offsets[j]
                results[j] = jax.tree_util.tree_map(lambda x: x[lo:hi], res)
        return [(a, b, r) for (a, b, _), r in zip(jobs, results)]
