"""CLI smoke tests (tiny configs, synthetic data)."""

import pytest

from graphneuralnetwork_tpu.cli import main


@pytest.mark.heavy
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


@pytest.mark.heavy
def test_cli_han_batch_quick():
    res = main(["--model", "han_batch", "--epochs", "2", "--quiet",
                "--set", "batch_size=64", "--set", "patience=100"])
    assert "test_acc" in res and res["batches"] > 0


@pytest.mark.heavy
def test_cli_graphsage_device_sampling():
    res = main(["--model", "graphsage", "--epochs", "1", "--quiet",
                "--set", "device_sampling=true", "--set", "batch_size=32",
                "--set", "hidden=16"])
    assert "test_acc" in res

def test_cli_gcn_sgd_reference_optimizer():
    # --optimizer sgd = SGD + warmup-poly (GAT/train_eval.py:9-33 recipe).
    # GCN's reference optimizer is Adam (GCN/train_eval.py:27) and lr=2e-3
    # under plain SGD converges far slower, so this asserts the recipe
    # runs end-to-end, not an accuracy bar (GAT's SGD config is the
    # accuracy target, exercised in REPRO.md).
    res = main(["--model", "gcn", "--epochs", "40", "--quiet",
                "--optimizer", "sgd"])
    assert 0.0 <= res["test_acc"] <= 1.0


def test_cli_graphsage_sgd_sets_reference_lr():
    res = main(["--model", "graphsage", "--epochs", "1", "--quiet",
                "--optimizer", "sgd", "--set", "batch_size=32",
                "--set", "hidden=16"])
    assert "test_acc" in res


def test_make_optimizer_warmup_poly_matches_reference_factors():
    # Factor sequence of HAN/train_utils/optimizer_utils.py:5-24 LambdaLR:
    # linear 1e-3 -> 1 over warmup steps, then ((1-p)/(1-pw))^0.9 decay.
    import jax.numpy as jnp
    from graphneuralnetwork_tpu.train.schedule import warmup_poly_schedule
    sched = warmup_poly_schedule(1.0, total_steps=10, warmup_steps=2,
                                 warmup_factor=1e-3)
    # step 0: factor = warmup_factor
    assert abs(float(sched(jnp.asarray(0))) - 1e-3) < 1e-6
    # step 2 (first post-warmup): ((1-2/10)/(1-2/10))^0.9 = 1
    assert abs(float(sched(jnp.asarray(2))) - 1.0) < 1e-6
    # step 6: ((1-0.6)/(1-0.2))^0.9
    import math
    assert abs(float(sched(jnp.asarray(6)))
               - (0.4 / 0.8) ** 0.9) < 1e-5


def test_cli_gcn_hybrid_layout():
    res = main(["--model", "gcn", "--epochs", "60", "--quiet",
                "--layout", "hybrid"])
    assert res["test_acc"] > 0.3


@pytest.mark.heavy
def test_cli_gat_hybrid_layout():
    """GAT trains on the tiled layout through the public CLI (attention
    rides the dense tiles, ops/bcsr_attention.py)."""
    res = main(["--model", "gat", "--epochs", "40", "--quiet",
                "--layout", "hybrid"])
    assert res["test_acc"] > 0.3


def test_repro_harness_fast_smoke(tmp_path):
    """The accuracy-repro harness itself (row generation, criteria,
    markdown output) — fast subset; the full run is the committed
    REPRO.md."""
    import sys
    sys.path.insert(0, "tools")
    import repro_accuracy

    out = str(tmp_path / "REPRO_test.md")
    rc = repro_accuracy.main(["--fast", "--models", "line,basis",
                              "--out", out])
    assert rc == 0
    text = open(out).read()
    assert "| line |" in text and "| basis |" in text
    assert "❌" not in text


@pytest.mark.heavy
def test_cli_han_hybrid_layout():
    res = main(["--model", "han", "--epochs", "4", "--quiet",
                "--layout", "hybrid"])
    assert "test_acc" in res


@pytest.mark.heavy
def test_cli_graphsage_hybrid_layout():
    res = main(["--model", "graphsage", "--epochs", "20", "--quiet",
                "--layout", "hybrid"])
    assert res["test_acc"] > 0.3


@pytest.mark.heavy
def test_cli_gtn_sparse_layout():
    res = main(["--model", "gtn", "--epochs", "10", "--quiet",
                "--layout", "sparse"])
    assert "test_acc" in res and res["test_acc"] > 0.3
