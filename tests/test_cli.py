"""End-to-end CLI smoke tests (tiny models/data): the reference's script
surface — train_v -> pretrain_g -> train (with pretrained-G pickup + V
rating) -> sample -> show_ckpt."""

import json
import os

import numpy as np
import pytest

from catgen.cli import pretrain_g, sample, show_ckpt, train, train_v


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli"))


def _logs(workdir):
    return os.path.join(workdir, "logs")


COMMON = ["--scale", "16", "--fixture", "16", "--N_epoch", "32",
          "--batchSize", "8"]


def test_cli_train_v(workdir):
    train_v.main(COMMON + ["--epochs", "1", "--save", _logs(workdir)])
    assert os.path.exists(os.path.join(_logs(workdir), "v_3x16x16.ckpt"))


def test_cli_pretrain_g(workdir):
    pretrain_g.main(COMMON + ["--epochs", "1", "--save", _logs(workdir)])
    assert os.path.exists(os.path.join(
        _logs(workdir), "g_pretrained_3x16x16_nd100.ckpt"))


def test_cli_train_and_resume(workdir):
    logs = _logs(workdir)
    train.main(COMMON + ["--epochs", "1", "--save", logs, "--saveFreq", "1",
                         "--G", "g16up", "--D", "d16b"])
    path = os.path.join(logs, "adversarial.ckpt")
    assert os.path.exists(path)
    # metrics logged, V rating present (V ckpt exists from test_cli_train_v)
    lines = [json.loads(l) for l in
             open(os.path.join(logs, "train_metrics.jsonl"))]
    events = {l["event"] for l in lines}
    assert {"setup", "epoch", "viz", "checkpoint_saved"} <= events
    viz = [l for l in lines if l["event"] == "viz"]
    assert "v_rating_all" in viz[-1]
    assert any(l["event"] == "pretrained_g_loaded" for l in lines)
    # grids written
    assert os.listdir(os.path.join(logs, "images"))
    # resume continues from saved epoch; --profile captures a device trace
    trace_dir = os.path.join(workdir, "trace")
    train.main(COMMON + ["--epochs", "1", "--save", logs, "--saveFreq", "1",
                         "--G", "g16up", "--D", "d16b", "--network", path,
                         "--profile", trace_dir])
    lines2 = [json.loads(l) for l in
              open(os.path.join(logs, "train_metrics.jsonl"))]
    assert any(l["event"] == "resumed" for l in lines2)
    assert os.path.isdir(trace_dir) and os.listdir(trace_dir)


def test_cli_sample(workdir, capsys):
    logs = _logs(workdir)
    sample.main(["--save", logs, "--count", "64", "--neighbours",
                 "--fixture", "16"])
    out = os.path.join(logs, "samples")
    files = os.listdir(out)
    assert any("best64" in f for f in files)
    assert any("neighbours" in f for f in files)


def test_cli_show_ckpt(workdir, capsys):
    show_ckpt.main([os.path.join(_logs(workdir), "adversarial.ckpt")])
    out = capsys.readouterr().out
    assert "TOTAL" in out and "g_params" in out
