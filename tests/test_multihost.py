"""Multi-host helpers (single-process degradation) + TB writer shim."""

import json
import os

import jax
import pytest

from graphneuralnetwork_tpu.parallel import (
    initialize_distributed, is_primary, make_mesh, process_count)
from graphneuralnetwork_tpu.utils.tb import SummaryWriter


def test_initialize_distributed_single_process_noop():
    initialize_distributed()  # no coordinator anywhere -> no-op
    initialize_distributed()  # idempotent: second call must not raise
    assert process_count() == 1
    assert is_primary()


def test_initialize_distributed_ignores_bare_coordinator_address(
        monkeypatch):
    # COORDINATOR_ADDRESS alone must be passed explicitly (JAX does not
    # read it); an unreachable address must fail fast, not hang — so we
    # only verify the gate logic via a mocked initialize.
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls["addr"] = coordinator_address

    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    initialize_distributed()
    # either no-op'd because already-initialised short-circuit hit, or
    # passed the address through explicitly
    assert calls.get("addr") in (None, "10.0.0.1:1234")


def test_make_mesh_1d_covers_all_devices():
    mesh = make_mesh(("data",))
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data",)


def test_make_mesh_2d_host_major():
    n = len(jax.devices())
    if n < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = make_mesh(("data", "model"), shape=(n // 2, 2))
    assert mesh.devices.shape == (n // 2, 2)


def test_make_mesh_2d_requires_shape():
    with pytest.raises(ValueError):
        make_mesh(("data", "model"))


@pytest.mark.heavy
def test_summary_writer_logs_scalars(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss/o1", 1.5, step=0)
    w.add_scalar("loss/o1", 1.2, step=1)
    w.flush()
    w.close()
    files = os.listdir(tmp_path)
    assert files, "writer produced no output"
    jsonl = tmp_path / "events.jsonl"
    if jsonl.exists():  # fallback path
        rows = [json.loads(l) for l in jsonl.read_text().splitlines()]
        assert rows[0]["tag"] == "loss/o1"
        assert rows[1]["step"] == 1


@pytest.mark.heavy
def test_summary_writer_global_step_alias_and_ctx(tmp_path):
    # torch SummaryWriter spelling (BiNE/train_utils/train_eval.py:75-77)
    with SummaryWriter(str(tmp_path)) as w:
        w.add_scalar("loss/o2", 0.5, global_step=7)
    jsonl = tmp_path / "events.jsonl"
    if jsonl.exists():
        rows = [json.loads(l) for l in jsonl.read_text().splitlines()]
        assert rows[0]["step"] == 7


def test_bine_writes_tensorboard(tmp_path):
    from graphneuralnetwork_tpu.models import BiNEConfig, train_bine
    cfg = BiNEConfig(epochs=1, batch_size=256, max_t=4,
                     logdir=str(tmp_path))
    train_bine(cfg=cfg)
    assert os.listdir(tmp_path), "BiNE produced no TB events"
