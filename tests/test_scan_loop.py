import optax

from graphneuralnetwork_tpu.data import load_cora
from graphneuralnetwork_tpu.nn import GCN
from graphneuralnetwork_tpu.train import fit_node_classifier_scan


def test_scan_fit_matches_plain_fit_quality():
    data = load_cora(seed=0)
    model = GCN(hidden=32, num_classes=data.num_classes, dropout=0.3)
    res = fit_node_classifier_scan(
        model, data, epochs=200,
        optimizer=optax.adamw(2e-2, weight_decay=5e-4),
        epochs_per_call=50, patience_calls=2, seed=0)
    assert res.test_acc > 0.5, res
    assert res.epochs_run <= 200
