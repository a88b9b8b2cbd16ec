"""Measure the reference implementation's training-loop rate on this CPU.

BASELINE.md's wall-clock target ("gen-5 promotion in <= 1/20 of the CPU
reference wall-clock") needs a measured reference rate — the reference
publishes none. This harness drives the REFERENCE'S OWN modules
(``/root/reference/envs/my_pong_env_2p.py``, ``models/qnet.py``) through
the exact per-step work of its training hot loop
(``scripts/train_iterative.py:239-244``): two batch-1 model forwards
(opponent argmax + learner's noisy eps-greedy), one env.step, one replay
push, and one batch-256 Double-DQN SGD step per env step. The PER class
lives inside the module-exec script and cannot be imported without
starting a training run, so the buffer/update here are a torch
re-statement of :49-76/:132-168 — same tensor shapes and op sequence.

Runs only when /root/reference is mounted; read-only use. Prints a JSON
line with env-steps/s and an extrapolated wall-clock for one generation
try (2400 episodes, config.yaml:20) and for the gen-5 promotion budget.
"""

from __future__ import annotations

import json
import sys
import time

REF = "/root/reference"


def main() -> int:
    sys.path.insert(0, REF)
    try:
        import torch
        import yaml

        try:
            import gym  # noqa: F401
        except ImportError:
            # image ships gymnasium only; API surface used by the env
            # (spaces.Box/MultiDiscrete) is identical
            import gymnasium

            sys.modules["gym"] = gymnasium
        from envs.my_pong_env_2p import PongEnv2P
        from models.qnet import QNet
    except Exception as e:  # pragma: no cover - needs the mount
        print(f"error: reference not usable: {e}", file=sys.stderr)
        return 2

    torch.set_num_threads(8)  # the reference pins 8 (train_iterative.py:6-10)
    with open(f"{REF}/config.yaml") as f:
        cfg = yaml.safe_load(f)
    env = PongEnv2P(**cfg["env"])
    device = torch.device("cpu")
    model_a = QNet().to(device).eval()
    model_b = QNet().to(device)
    target_b = QNet().to(device).eval()
    opt = torch.optim.Adam(
        list(model_b.fc_V.parameters()) + list(model_b.fc_A.parameters()),
        lr=cfg["training"].get("lr", 2.5e-4),
    )
    bs = int(cfg["training"].get("batch_size", 256))
    gamma = float(cfg["training"].get("gamma", 0.99))

    # flat-array replay as in train_iterative.py:49-76 (same shapes)
    cap = 100_000
    obs_buf = torch.zeros((cap, 7))
    act_buf = torch.zeros((cap,), dtype=torch.long)
    rew_buf = torch.zeros((cap,))
    nxt_buf = torch.zeros((cap, 7))
    done_buf = torch.zeros((cap,))
    prios = torch.ones((cap,))
    filled = 0
    pos = 0

    def train_step():
        # Double-DQN + IS-weighted MSE, op order of :132-168
        import numpy as np

        p = (prios[:filled] ** 0.6).numpy()
        p = p / p.sum()
        idx = np.random.choice(filled, bs, p=p)
        idx_t = torch.as_tensor(idx)
        s = obs_buf[idx_t]
        a = act_buf[idx_t]
        r = rew_buf[idx_t]
        s2 = nxt_buf[idx_t]
        d = done_buf[idx_t]
        w = (filled * torch.as_tensor(p[idx])) ** (-0.4)
        w = (w / w.max()).float()
        model_b.reset_noise()
        target_b.reset_noise()
        q = model_b(s).gather(1, a[:, None])[:, 0]
        with torch.no_grad():
            na = model_b(s2).argmax(1)
            nq = target_b(s2).gather(1, na[:, None])[:, 0]
            y = r + gamma * nq * (1.0 - d)
        loss = (w * (q - y) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        prios[idx_t] = (q - y).abs().detach() + 1e-6

    (obs_a, obs_b), = (env.reset(),)
    n_steps = 0
    # warm the buffer so train_step runs from the first timed step,
    # exactly as in a mid-generation steady state
    import numpy as np

    while filled < bs:
        a_act = int(np.random.randint(3))
        b_act = int(np.random.randint(3))
        (obs_a2, obs_b2), (ra, rb), done, _ = env.step(a_act, b_act)
        obs_buf[pos] = torch.as_tensor(obs_b)
        act_buf[pos] = b_act
        rew_buf[pos] = rb
        nxt_buf[pos] = torch.as_tensor(obs_b2)
        done_buf[pos] = float(done)
        pos = (pos + 1) % cap
        filled = min(filled + 1, cap)
        obs_a, obs_b = (env.reset() if done else (obs_a2, obs_b2))

    t0 = time.perf_counter()
    budget_s = 20.0
    while time.perf_counter() - t0 < budget_s:
        with torch.no_grad():
            a_act = int(model_a(torch.as_tensor(obs_a)[None]).argmax())
            model_b.reset_noise()
            b_act = int(model_b(torch.as_tensor(obs_b)[None]).argmax())
        (obs_a2, obs_b2), (ra, rb), done, _ = env.step(a_act, b_act)
        obs_buf[pos] = torch.as_tensor(obs_b)
        act_buf[pos] = b_act
        rew_buf[pos] = rb
        nxt_buf[pos] = torch.as_tensor(obs_b2)
        done_buf[pos] = float(done)
        pos = (pos + 1) % cap
        filled = min(filled + 1, cap)
        train_step()
        n_steps += 1
        obs_a, obs_b = (env.reset() if done else (obs_a2, obs_b2))
    dt = time.perf_counter() - t0
    rate = n_steps / dt

    # extrapolations at the reference's own budgets (config.yaml:20-24)
    steps_per_episode = 300  # observed mean episode length, round figure
    eps_per_gen = 2400
    one_try_s = eps_per_gen * steps_per_episode / rate
    print(json.dumps({
        "metric": "reference_cpu_train_loop",
        "env_steps_per_s": round(rate, 1),
        "timed_steps": n_steps,
        "est_seconds_per_generation_try": round(one_try_s),
        "note": "train-per-env-step loop of train_iterative.py:239-244, "
                "8 BLAS threads, batch 256",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
