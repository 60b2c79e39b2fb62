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
    assert process_count() == 1
    assert is_primary()


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
