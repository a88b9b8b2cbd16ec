"""CLI error UX: bad inputs produce clean messages and exit code 2."""

import pytest

from pingpong_tpu.cli import main


def test_missing_config(capsys):
    rc = main(["train", "--config", "/definitely/not/here.yaml"])
    assert rc == 2
    assert "error: file not found" in capsys.readouterr().err


def test_unknown_override(capsys):
    rc = main(["train", "dqn.not_a_real_field=1"])
    assert rc == 2
    assert "unknown config field" in capsys.readouterr().err


def test_malformed_override(capsys):
    rc = main(["train", "no_equals"])
    assert rc == 2
    assert "key.path=value" in capsys.readouterr().err


def test_unknown_subcommand_exits():
    with pytest.raises(SystemExit):
        main(["frobnicate"])
