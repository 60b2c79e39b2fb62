"""Epochs/s benchmark: end-to-end full-batch training throughput
(BASELINE.md north star "epochs/s, TPU 1 chip").

Runs the scanned GCN/GAT training step (train/scan_loop.py — whole epoch
blocks inside one jit dispatch) on a Cora-shaped graph and on a larger
synthetic graph, and reports epochs/s per model.

Usage: python tools/bench_epochs.py [--epochs 400] [--models gcn gat]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_model(name: str, data, epochs: int, dtype):
    import jax
    import jax.numpy as jnp
    import optax

    from graphneuralnetwork_tpu.nn import GAT, GCN
    from graphneuralnetwork_tpu.train.loop import create_train_state
    from graphneuralnetwork_tpu.train.scan_loop import (
        make_scanned_node_classification_run)

    cdtype = jnp.bfloat16 if dtype == "bfloat16" else None
    if name == "gcn":
        model = GCN(hidden=128, num_classes=data.num_classes, dropout=0.5,
                    dtype=cdtype)
        tx = optax.adamw(2e-3, weight_decay=5e-4)
    else:
        model = GAT(hidden=8, num_heads=8, num_classes=data.num_classes,
                    dropout=0.6, dtype=cdtype)
        tx = optax.adamw(1e-2, weight_decay=5e-4)

    state = create_train_state(model, data.graph, data.features,
                               jax.random.PRNGKey(0), tx)
    run = make_scanned_node_classification_run(model, epochs)

    import numpy as np

    # warmup (compile); sync via host transfer — block_until_ready
    # undercounts through the axon tunnel (verify SKILL.md).
    state2, ms = run(state, data.graph, data.features, data.labels,
                     data.train_idx, data.val_idx)
    _ = np.asarray(ms["loss"][-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, ms = run(state, data.graph, data.features, data.labels,
                    data.train_idx, data.val_idx)
        _ = np.asarray(ms["loss"][-1])
        best = min(best, time.perf_counter() - t0)
    return epochs / best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--models", nargs="+", default=["gcn", "gat"])
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="bfloat16")
    ap.add_argument("--big", action="store_true",
                    help="also bench a 65k-node / 1M-edge graph")
    args = ap.parse_args(argv)

    from graphneuralnetwork_tpu.data import load_cora
    from graphneuralnetwork_tpu.data.planetoid import (
        NodeClassificationData, synthetic_citation_graph)

    results = {}
    data = load_cora(seed=0)
    for m in args.models:
        results[f"{m}_cora_epochs_per_s"] = round(
            bench_model(m, data, args.epochs, args.dtype), 2)
        print(json.dumps({m: results[f'{m}_cora_epochs_per_s']}), flush=True)

    if args.big:
        import jax.numpy as jnp
        import numpy as np

        from graphneuralnetwork_tpu.core.graph import (
            gcn_graph, row_normalize_features)
        feats, labels, s, r = synthetic_citation_graph(
            n_nodes=65536, n_feats=128, n_classes=16, avg_degree=8, seed=0)
        big = NodeClassificationData(
            graph=gcn_graph(s, r, feats.shape[0]),
            features=jnp.asarray(row_normalize_features(feats)),
            labels=jnp.asarray(labels),
            train_idx=jnp.arange(0, 4096, dtype=jnp.int32),
            val_idx=jnp.arange(4096, 8192, dtype=jnp.int32),
            test_idx=jnp.arange(8192, 16384, dtype=jnp.int32),
            num_classes=16)
        for m in args.models:
            results[f"{m}_65k_epochs_per_s"] = round(
                bench_model(m, big, max(args.epochs // 4, 20),
                            args.dtype), 2)
            print(json.dumps(
                {m + "_65k": results[f'{m}_65k_epochs_per_s']}), flush=True)

    print(json.dumps({
        "metric": "train_epochs_per_s",
        "value": results.get("gcn_cora_epochs_per_s"),
        "unit": "epochs/s",
        "detail": results,
        "dtype": args.dtype,
    }))


if __name__ == "__main__":
    main()
