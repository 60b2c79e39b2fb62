import pytest
import optax

from graphneuralnetwork_tpu.data import load_cora
from graphneuralnetwork_tpu.nn import GCN
from graphneuralnetwork_tpu.train import fit_node_classifier_scan


@pytest.mark.heavy
def test_scan_fit_matches_plain_fit_quality():
    data = load_cora(seed=0)
    model = GCN(hidden=32, num_classes=data.num_classes, dropout=0.3)
    res = fit_node_classifier_scan(
        model, data, epochs=200,
        optimizer=optax.adamw(2e-2, weight_decay=5e-4),
        epochs_per_call=50, patience_calls=2, seed=0)
    assert res.test_acc > 0.5, res
    assert res.epochs_run <= 200


@pytest.mark.heavy
def test_scan_early_stop_triggers_before_budget():
    """patience_calls must cut training when val stops improving."""
    data = load_cora(seed=0)
    model = GCN(hidden=8, num_classes=data.num_classes, dropout=0.0)
    res = fit_node_classifier_scan(
        model, data, epochs=2000,
        optimizer=optax.adamw(5.0),         # diverges -> val never improves
        epochs_per_call=25, patience_calls=1, seed=0)
    assert res.epochs_run < 2000


@pytest.mark.heavy
def test_scan_checkpoint_save_and_resume(tmp_path):
    """Best-val checkpointing (GCN/train_eval.py:53-55) + resume
    (is_current_train, GTN/train_utils/train_eval.py:22-25): a resumed
    short run starts from the saved state and keeps its quality."""
    ckpt = str(tmp_path / "ck")
    data = load_cora(seed=0)
    model = GCN(hidden=16, num_classes=data.num_classes, dropout=0.0)
    res1 = fit_node_classifier_scan(
        model, data, epochs=100, optimizer=optax.adamw(2e-2),
        epochs_per_call=50, patience_calls=5, seed=0,
        checkpoint_dir=ckpt)
    import os
    assert os.path.exists(ckpt)

    # resume: tiny extra budget on top of the checkpoint must not lose
    # the converged quality (fresh 25-epoch training would score lower)
    res2 = fit_node_classifier_scan(
        model, data, epochs=25, optimizer=optax.adamw(2e-2),
        epochs_per_call=25, patience_calls=5, seed=1,
        checkpoint_dir=ckpt, resume=True)
    fresh = fit_node_classifier_scan(
        model, data, epochs=25, optimizer=optax.adamw(2e-2),
        epochs_per_call=25, patience_calls=5, seed=1)
    assert res2.test_acc >= fresh.test_acc - 0.02
    assert res2.test_acc >= res1.test_acc - 0.10


def test_scan_resume_missing_checkpoint_is_fresh_run(tmp_path):
    """The resume flag tolerates a missing first checkpoint (reference
    behavior: is_current_train on a fresh dir just trains)."""
    data = load_cora(seed=0)
    model = GCN(hidden=8, num_classes=data.num_classes, dropout=0.0)
    res = fit_node_classifier_scan(
        model, data, epochs=50, optimizer=optax.adamw(2e-2),
        epochs_per_call=25, patience_calls=3, seed=0,
        checkpoint_dir=str(tmp_path / "nonexistent"), resume=True)
    assert res.epochs_run >= 25


def test_scan_history_and_best_params_selection():
    """History is recorded per chunk; test eval uses BEST-val params, not
    the last ones (best-checkpoint semantics, GCN/train_eval.py:49-64)."""
    data = load_cora(seed=0)
    model = GCN(hidden=16, num_classes=data.num_classes, dropout=0.0)
    res = fit_node_classifier_scan(
        model, data, epochs=100, optimizer=optax.adamw(2e-2),
        epochs_per_call=20, patience_calls=99, seed=0)
    assert len(res.history) == 5            # 100 / 20 chunks
    epochs_logged = [h[0] for h in res.history]
    assert epochs_logged == [20, 40, 60, 80, 100]
    assert res.best_val_loss <= min(h[3] for h in res.history) + 1e-9
