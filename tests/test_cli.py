"""CLI smoke tests (tiny configs, synthetic data)."""

import pytest

from graphneuralnetwork_tpu.cli import main


def test_cli_gcn_quick():
    res = main(["--model", "gcn", "--epochs", "60", "--quiet"])
    assert res["test_acc"] > 0.3


def test_cli_deepwalk_quick():
    res = main(["--model", "deepwalk", "--epochs", "1", "--quiet",
                "--set", "num_walks=5", "--set", "walk_length=6",
                "--set", "embed_dim=16", "--set", "subsample_t=1.0"])
    assert "final_loss" in res


def test_cli_line_quick():
    res = main(["--model", "line", "--epochs", "1", "--quiet",
                "--set", "embed_dim=16", "--set", "batch_size=64"])
    assert "final_loss" in res


def test_cli_unknown_override_rejected():
    with pytest.raises(SystemExit):
        main(["--model", "deepwalk", "--quiet", "--set", "bogus=1"])


def test_cli_basis():
    res = main(["--model", "basis", "--quiet"])
    assert res["diameter"] == 4
    assert len(res["betweenness"]) == 10


def test_cli_han_batch_quick():
    res = main(["--model", "han_batch", "--epochs", "2", "--quiet",
                "--set", "batch_size=64", "--set", "patience=100"])
    assert "test_acc" in res and res["batches"] > 0


def test_cli_graphsage_device_sampling():
    res = main(["--model", "graphsage", "--epochs", "1", "--quiet",
                "--set", "device_sampling=true", "--set", "batch_size=32",
                "--set", "hidden=16"])
    assert "test_acc" in res
