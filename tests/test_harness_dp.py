"""GanHarness on the simulated 8-device mesh: full orchestration path
(epoch batches sharded, replicated state, checkpoint round-trip)."""

import os

import jax
import pytest

from catgen.data.fixture import write_fixture_dataset
from catgen.data.loader import ImageDataset
from catgen.train import gan
from catgen.train.harness import GanHarness, HarnessConfig


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("cats_dp")
    write_fixture_dataset(str(d), n=32, size=64, seed=11)
    return ImageDataset([str(d)], scale=16, colorspace="rgb")


def test_harness_dp_epoch_and_checkpoint(tmp_path, dataset):
    assert jax.device_count() >= 8
    hc = HarnessConfig(save_dir=str(tmp_path), n_epoch=128, scale=16,
                       seed=3, n_devices=8, g_model="g16up", d_model="d16b",
                       save_freq=1)
    gc = gan.GanConfig(batch_size=8)
    h = GanHarness(hc, gc, dataset)
    summary = h.run_epoch()
    assert summary["epoch"] == 1
    assert summary["loss_d"] > 0
    h.visualize()
    h.save()
    assert os.path.exists(os.path.join(str(tmp_path), "adversarial.ckpt"))
    # resume restores DP-replicated state
    h2 = GanHarness(hc, gc, dataset)
    h2.resume()
    assert int(h2.state.epoch) == int(h.state.epoch)
    h2.run_epoch()


def test_v_harness_dp(tmp_path, dataset):
    from catgen.train import v_trainer
    from catgen.train.harness import VHarness

    hc = HarnessConfig(save_dir=str(tmp_path), n_epoch=64, scale=16,
                       seed=5, n_devices=8, v_model="v16")
    vc = v_trainer.VConfig(batch_size=8)
    h = VHarness(hc, vc, dataset)
    summary = h.run_epoch()
    assert summary["epoch"] == 1
    assert 0.0 <= summary["acc"] <= 1.0
    h.save()
    assert os.path.exists(os.path.join(str(tmp_path), "v_3x16x16.ckpt"))


def test_pretrain_harness_dp(tmp_path, dataset):
    from catgen.train import pretrainer
    from catgen.train.harness import PretrainHarness

    hc = HarnessConfig(save_dir=str(tmp_path), n_epoch=64, scale=16,
                       seed=7, n_devices=8)
    pc = pretrainer.PretrainConfig(batch_size=8)
    h = PretrainHarness(hc, pc, dataset)
    s1 = h.run_epoch()
    s2 = h.run_epoch()
    assert s2["mse"] <= s1["mse"] * 1.5  # training, not diverging
    h.save()
    assert os.path.exists(os.path.join(
        str(tmp_path), "g_pretrained_3x16x16_nd100.ckpt"))
