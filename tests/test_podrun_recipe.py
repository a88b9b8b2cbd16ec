"""docs/PODRUN.md recipe dry-run: the exact CLI a pod owner runs must
parse, execute on the virtual mesh, and emit the documented JSON
contract (VERDICT r3 item 8)."""

import json

import jax
import pytest


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_podrun_cli_contract(capsys):
    from pingpong_tpu.tools.scaling_bench import main

    rc = main([
        "--per-device-envs", "8", "--rollout-length", "8",
        "--updates", "2", "--n1", "1", "--n2", "2",
        "--devices", "1,2",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["metric"] == "weak_scaling_efficiency"
    assert summary["unit"] == "fraction"
    assert 0.0 < summary["value"]
    ladder = summary["ladder"]
    assert [r["devices"] for r in ladder] == [1, 2]
    assert ladder[0]["scaling_efficiency"] == 1.0
    assert all(
        set(r) == {"devices", "global_envs", "env_steps_per_s",
                   "scaling_efficiency"}
        for r in ladder
    )
