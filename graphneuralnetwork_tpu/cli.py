"""Unified training CLI: ``python train.py --model gcn --dataset cora``.

Replaces the reference's 14 per-model ``run.py`` scripts with one entry
point. Every model's defaults replicate the cited reference configs
(BASELINE.md); any config field can be overridden with ``--set key=value``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _apply_overrides(cfg, overrides):
    for kv in overrides or []:
        k, v = kv.split("=", 1)
        if not hasattr(cfg, k):
            raise SystemExit(f"unknown config field {k!r} for "
                             f"{type(cfg).__name__}")
        cur = getattr(cfg, k)
        if isinstance(cur, bool):
            v = v.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            v = int(v)
        elif isinstance(cur, float):
            v = float(v)
        elif isinstance(cur, tuple):
            v = tuple(int(x) for x in v.split(","))
        setattr(cfg, k, v)
    return cfg


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="TPU-native GNN framework trainer")
    ap.add_argument("--model", required=True, choices=[
        "gcn", "gat", "graphsage", "graphsage_unsup", "han", "han_batch",
        "gtn", "deepwalk", "node2vec", "line", "struc2vec", "sdne",
        "metapath2vec", "gatne", "bine", "basis"])
    ap.add_argument("--dataset", default=None,
                    help="dataset path (falls back to synthetic)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--set", action="append", metavar="KEY=VALUE",
                    help="override any config field")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="load a prior checkpoint before training "
                         "(reference is_current_train, "
                         "GTN/train_utils/train_eval.py:22-25)")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--optimizer", choices=["adamw", "sgd"], default=None,
                    help="adamw = TPU-fast default; sgd = the reference's "
                         "recipe (SGD + warmup-poly schedule with the "
                         "reference lr, GAT/train_eval.py:9-33,54, "
                         "HAN/run.py:10-11, GraphSAGE_Pytorch/run.py:8-10)")
    ap.add_argument("--layout", choices=["auto", "coo", "hybrid", "sparse"],
                    default="auto",
                    help="graph layout for gcn/gat/graphsage/han/gtn: "
                         "'auto' (default) probes post-clustering tile "
                         "fill and picks hybrid/COO per graph "
                         "(core/layout.py; logs the decision). "
                         "'hybrid' = locality-clustered dense-tile BCSR "
                         "+ COO remainder (core/bcsr.py; 2.9-3.9x SpMM "
                         "on clustered graphs). graphsage + hybrid runs "
                         "the full-batch SAGEConv path (nn/conv.py:236) "
                         "— a pipeline change, so auto keeps graphsage "
                         "on the reference sampled pipeline. "
                         "han + hybrid tiles each metapath adjacency "
                         "(data/acm.py:_hybrid_metapath_graphs). "
                         "'sparse' (gtn only) = wedge-plan metapath "
                         "composition without dense [N,N] tensors "
                         "(nn/gtn_sparse.py, O(nnz) memory); auto keeps "
                         "gtn dense (the ACM-scale fast path)")
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="compute dtype for gcn/gat/graphsage/han/gtn "
                         "(params stay f32; bfloat16 = native MXU rate)")
    args = ap.parse_args(argv)

    # Validate the model/layout combination up front: data loaders only
    # handle the layouts their model supports, and a bare loader assert
    # is a worse error than a CLI message (ADVICE r4).
    _layout_models = {"hybrid": ("gcn", "gat", "graphsage", "han"),
                      "sparse": ("gtn",)}
    _allowed = _layout_models.get(args.layout)
    if _allowed is not None and args.model not in _allowed:
        raise SystemExit(
            f"--layout {args.layout} is not supported for --model "
            f"{args.model} (supported models: {', '.join(_allowed)}; "
            f"use --layout auto or coo)")

    # Multi-host: init the runtime (no-op single-process) and restrict
    # console logging to the primary host. Checkpoint writes are gated on
    # is_primary() inside train/checkpoint.py.
    from .parallel.multihost import initialize_distributed, is_primary
    initialize_distributed()
    verbose = not args.quiet and is_primary()

    import optax

    name = args.model
    result = {}
    # raw --set key/value map for branches that read individual fields
    # (dataclass-config branches keep using _apply_overrides)
    overrides = dict(kv.split("=", 1) for kv in (args.set or []))

    if name in ("gcn", "gat"):
        from .data import load_cora
        from .nn import GAT, GCN
        from .train.scan_loop import fit_node_classifier_scan

        import jax.numpy as jnp
        cdtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

        layout = args.layout
        # the auto chooser applies the attention economics for GAT (the
        # COO attention path is far costlier than COO SpMM, so hybrid
        # pays off at much lower tile fill — core/layout.py)
        objective = "attention" if name == "gat" else "spmm"
        if args.dataset in ("cora", "citeseer"):   # named synthetic preset
            data = load_cora(name=args.dataset, seed=args.seed,
                             layout=layout, layout_objective=objective)
        else:
            data = load_cora(root=args.dataset, seed=args.seed,
                             layout=layout, layout_objective=objective)
        # "auto" is resolved inside the loader; read the decision off the
        # returned graph container
        layout = "hybrid" if hasattr(data.graph, "bcsr") else "coo"
        if name == "gat" and layout == "hybrid":
            # GAT needs BINARY tile weights (attention softmax over the
            # edge set, not the sym-normalised GCN operator): rebuild the
            # hybrid from the already-cluster-permuted raw edges with
            # unit weights (ops/bcsr_attention.py semantics).
            import dataclasses as _dc

            from .core.bcsr import build_hybrid
            from .core.graph import add_self_loops, symmetrize
            s2, r2 = symmetrize(data.raw_senders, data.raw_receivers)
            s2, r2 = add_self_loops(s2, r2, int(data.features.shape[0]))
            # bf16 tiles when computing in bf16: GAT's adjacency is
            # binary, so the counts are exact and the attend kernels'
            # tile stream halves
            data = _dc.replace(
                data, graph=build_hybrid(
                    s2, r2, int(data.features.shape[0]), symmetric=True,
                    dtype=(jnp.bfloat16 if args.dtype == "bfloat16"
                           else jnp.float32)))
        from .train.schedule import make_optimizer
        opt_name = args.optimizer or "adamw"
        if name == "gcn":
            # GCN/run.py:7-11: lr=2e-3, wd=5e-4, hidden=128, dropout=0.5,
            # 4000 epochs (reference optimizer is Adam,
            # GCN/train_eval.py:27)
            model = GCN(hidden=128, num_classes=data.num_classes,
                        dropout=0.5, dtype=cdtype)
            epochs = args.epochs or 4000
            opt = make_optimizer(opt_name, 2e-3, weight_decay=5e-4,
                                 total_steps=epochs, warmup_steps=1,
                                 momentum=0.9)
        else:
            # GAT/run.py:8-9: lr=1e-2, hidden=8, heads=8, dropout=0.6;
            # reference trains with SGD + warmup-poly
            # (GAT/train_eval.py:54, 9-33) — that exact recipe under
            # --optimizer sgd; adamw is the TPU-fast default.
            model = GAT(hidden=8, num_heads=8,
                        num_classes=data.num_classes, dropout=0.6,
                        dtype=cdtype)
            epochs = args.epochs or 1000
            # momentum 0.9 on top of the reference recipe: torch's
            # implicit momentum=0 stalls below criterion at lr=1e-2
            # (measured: 0.36 vs 0.92 test acc at 1000 epochs).
            opt = make_optimizer(opt_name, 1e-2, weight_decay=5e-4,
                                 total_steps=epochs, warmup_steps=1,
                                 momentum=0.9)
        res = fit_node_classifier_scan(
            model, data, epochs=epochs, optimizer=opt,
            epochs_per_call=min(100, epochs), seed=args.seed,
            verbose=verbose, checkpoint_dir=args.checkpoint_dir,
            resume=args.resume)
        result = dict(test_acc=res.test_acc, val_acc=res.best_val_acc,
                      epochs=res.epochs_run, seconds=res.seconds)

    elif name == "graphsage" and args.layout == "hybrid":
        # Full-batch SAGEConv on the locality-clustered hybrid layout
        # (SAGEConv dispatches on HybridGraph, nn/conv.py:236-252) — the
        # fast path for graphs that fit on-chip; the sampled mini-batch
        # reference pipeline stays under --layout coo. Layout
        # construction lives in the data layer like the other loaders.
        import jax.numpy as jnp

        from .data.pubmed import load_pubmed_fullbatch
        from .nn import GraphSAGE
        from .train.schedule import make_optimizer
        from .train.scan_loop import fit_node_classifier_scan

        data = load_pubmed_fullbatch(root=args.dataset, seed=args.seed,
                                     layout="hybrid")
        cdtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
        model = GraphSAGE(
            hidden_dims=(128,), num_classes=data.num_classes,
            aggregator=overrides.get("aggregator", "mean"), dtype=cdtype)
        epochs = args.epochs or 100
        opt = make_optimizer(args.optimizer or "adamw",
                             float(overrides.get("lr", 1e-2)),
                             weight_decay=1e-4, total_steps=epochs,
                             warmup_steps=1, momentum=0.9)
        res = fit_node_classifier_scan(
            model, data, epochs=epochs, optimizer=opt,
            epochs_per_call=min(50, epochs), seed=args.seed,
            verbose=verbose, checkpoint_dir=args.checkpoint_dir,
            resume=args.resume)
        result = dict(test_acc=res.test_acc, val_acc=res.best_val_acc,
                      epochs=res.epochs_run, seconds=res.seconds)

    elif name in ("graphsage", "graphsage_unsup"):
        from .data.pubmed import load_pubmed
        from .train.sage_loop import (
            SageConfig, train_sage_supervised, train_sage_unsupervised)

        data = load_pubmed(root=args.dataset, seed=args.seed)
        cfg = SageConfig(epochs=args.epochs or 5, seed=args.seed)
        if args.optimizer:
            cfg.optimizer = args.optimizer
            if args.optimizer == "sgd":
                # reference recipe: SGD lr=0.1 wd=1e-4 + warmup-poly
                # (GraphSAGE_Pytorch/run.py:8-10, train_eval.py:74)
                cfg.lr, cfg.weight_decay = 0.1, 1e-4
        cfg = _apply_overrides(cfg, args.set)
        if name == "graphsage":
            params, history, test_acc = train_sage_supervised(
                data, cfg, verbose=verbose)
            result = dict(test_acc=test_acc, history_tail=history[-1])
        else:
            params, history = train_sage_unsupervised(
                data, cfg, verbose=verbose)
            result = dict(final_loss=history[-1][1],
                      initial_loss=history[0][1],
                          binary_acc=history[-1][2])

    elif name == "han":
        from .data import load_acm_han
        from .nn import HAN
        import jax
        import jax.numpy as jnp

        if args.dataset == "imdb":
            from .data import load_imdb_han
            data = load_imdb_han(seed=args.seed, layout=args.layout)
        else:
            data = load_acm_han(
                path=args.dataset, seed=args.seed, layout=args.layout,
                n_papers=int(overrides.get("n_papers", 600)))
        model = HAN(num_metapaths=len(data.graphs),
                    num_classes=data.num_classes, hidden=8, num_heads=(4,),
                    dtype=(jnp.bfloat16 if args.dtype == "bfloat16"
                           else None))
        epochs = args.epochs or 100
        params = model.init(jax.random.PRNGKey(args.seed), data.graphs,
                            data.features)["params"]
        # --optimizer sgd = the reference recipe: SGD lr=0.05
        # (HAN/run.py:10-11, train_eval.py:48) + warmup-poly schedule.
        from .train.schedule import make_optimizer
        opt_name = args.optimizer or "adamw"
        tx = make_optimizer(opt_name,
                            0.05 if opt_name == "sgd" else 5e-3,
                            total_steps=epochs, warmup_steps=1,
                            momentum=0.9)
        opt_state = tx.init(params)

        def loss_fn(p):
            logits = model.apply({"params": p}, data.graphs, data.features)
            sel = logits[data.train_idx]
            return -jax.nn.log_softmax(sel)[
                jnp.arange(sel.shape[0]),
                data.labels[data.train_idx]].mean()

        # Whole epoch blocks in one dispatch (scan_loop rationale: ~30ms
        # per dispatch through a remote tunnel dwarfs the step itself).
        chunk = min(20, epochs)

        @jax.jit
        def run_chunk(params, opt_state):
            def body(carry, _):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(params)
                upd, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, upd), opt_state), loss
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=chunk)
            return params, opt_state, losses

        import time as _time
        done, t_after_first = 0, None
        t0_train = _time.perf_counter()
        while done < epochs:
            params, opt_state, losses = run_chunk(params, opt_state)
            _ = float(losses[-1])          # sync (scalar transfer)
            done += chunk
            if t_after_first is None:
                t_after_first = _time.perf_counter()
            if verbose:
                print(f"epoch {done}: loss {float(losses[-1]):.4f}")
        t_end = _time.perf_counter()
        logits = model.apply({"params": params}, data.graphs, data.features)
        import numpy as np
        pred = np.argmax(np.asarray(logits)[np.asarray(data.test_idx)], -1)
        acc = float((pred == np.asarray(
            data.labels)[np.asarray(data.test_idx)]).mean())
        result = dict(test_acc=acc, seconds=t_end - t0_train)
        if done > chunk:
            # steady-state throughput: excludes the first (compiling) chunk
            result["steady_epochs_per_s"] = ((done - chunk)
                                             / (t_end - t_after_first))

    elif name == "han_batch":
        # HAN node-minibatch mode (reference is_batch=True: batch=32 dense
        # sub-adjacencies, SGD lr=0.05 + warmup-poly, eval every 20 batches
        # — HAN/utils/data_utils.py:92-123, train_eval.py:29-96).
        from .data import load_acm_han
        from .train.han_batch import fit_han_minibatch
        import jax.numpy as jnp

        if args.dataset == "imdb":
            from .data import load_imdb_han
            data = load_imdb_han(seed=args.seed)
        else:
            data = load_acm_han(path=args.dataset, seed=args.seed)
        res = fit_han_minibatch(
            data,
            batch_size=int(overrides.get("batch_size", 32)),
            lr=float(overrides.get("lr", 0.05)),
            epochs=args.epochs or 100,
            patience=int(overrides.get("patience", 20)),
            seed=args.seed, verbose=verbose,
            dtype=(jnp.bfloat16 if args.dtype == "bfloat16" else None))
        result = dict(test_acc=res.test_acc, val_acc=res.best_val_acc,
                      batches=res.epochs_run, seconds=res.seconds)

    elif name == "basis":
        # The reference's Basis/networkx_study.py centrality walkthrough.
        from .analysis.demo import basis_demo
        result = basis_demo()

    elif name == "gtn":
        from .data import load_acm_gtn
        from .nn import GTN
        import jax
        import jax.numpy as jnp
        import numpy as np

        if args.dataset == "imdb":
            from .data import load_imdb_gtn
            data = load_imdb_gtn(seed=args.seed)
        else:
            data = load_acm_gtn(path=args.dataset, seed=args.seed)
        cdtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
        if args.layout == "sparse":
            # wedge-plan composition, no dense [N,N] tensors
            # (nn/gtn_sparse.py; parameter tree identical to dense GTN)
            from .nn.gtn_sparse import (SparseGTN, build_gtn_plan,
                                        stacked_adj_to_sparse)
            import numpy as _np
            plan = build_gtn_plan(
                stacked_adj_to_sparse(_np.asarray(data.adj)),
                int(data.adj.shape[1]), num_layers=2)
            model = SparseGTN(num_classes=data.num_classes, channels=2,
                              num_layers=2, hidden=64, dtype=cdtype)
            graph_arg = plan
        else:
            model = GTN(num_classes=data.num_classes, channels=2,
                        num_layers=2, hidden=64, dtype=cdtype)
            graph_arg = data.adj
        epochs = args.epochs or 40
        params = model.init(jax.random.PRNGKey(args.seed), graph_arg,
                            data.features)["params"]
        # adaptive per-group lr (GTN/train_utils/train_eval.py:29-34):
        # GT layers get 0.5×, others 5e-3 — implemented with masked labels
        def label_fn(params):
            return {k: ("gt" if k.startswith("gt") else "other")
                    for k in params}
        tx = optax.multi_transform(
            {"gt": optax.adamw(5e-3 * 0.5, weight_decay=1e-3),
             "other": optax.adamw(5e-3, weight_decay=1e-3)},
            label_fn)
        opt_state = tx.init(params)
        tgt = data.target_idx

        def loss_fn(p, g_in):
            logits = model.apply({"params": p}, g_in, data.features)
            sel = logits[tgt][data.train_idx]
            return -jax.nn.log_softmax(sel)[
                jnp.arange(sel.shape[0]),
                data.labels[data.train_idx]].mean()

        chunk = min(10, epochs)

        # graph passed as a jit argument: closing over a large dense
        # stack or wedge plan embeds it as HLO constants and the remote
        # compile rejects the request body at scale (HTTP 413)
        @jax.jit
        def run_chunk(params, opt_state, g_in):
            def body(carry, _):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(params, g_in)
                upd, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, upd), opt_state), loss
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=chunk)
            return params, opt_state, losses

        import time as _time
        done, t_after_first = 0, None
        t0_train = _time.perf_counter()
        while done < epochs:
            params, opt_state, losses = run_chunk(params, opt_state,
                                                  graph_arg)
            _ = float(losses[-1])          # sync (scalar transfer)
            done += chunk
            if t_after_first is None:
                t_after_first = _time.perf_counter()
            if verbose:
                print(f"epoch {done}: loss {float(losses[-1]):.4f}")
        t_end = _time.perf_counter()
        logits = model.apply({"params": params}, graph_arg,
                             data.features)
        from .train.metrics import precision_recall_fbeta
        sel = logits[tgt][data.test_idx]
        pred = np.argmax(np.asarray(sel), -1)
        labels = np.asarray(data.labels)[np.asarray(data.test_idx)]
        acc = float((pred == labels).mean())
        prec, rec, f1 = precision_recall_fbeta(
            sel, jnp.asarray(labels), data.num_classes)
        result = dict(test_acc=acc, f1=float(f1), precision=float(prec),
                      recall=float(rec), seconds=t_end - t0_train)
        if done > chunk:
            result["steady_epochs_per_s"] = ((done - chunk)
                                             / (t_end - t_after_first))

    elif name in ("deepwalk", "node2vec", "struc2vec"):
        from .data.edgelist import load_edgelist
        from .models import (WalkEmbedConfig, run_deepwalk, run_node2vec,
                             run_struc2vec)

        data = load_edgelist(path=args.dataset, seed=args.seed)
        cfg = _apply_overrides(
            WalkEmbedConfig(epochs=args.epochs or 5, seed=args.seed),
            args.set)
        fn = dict(deepwalk=run_deepwalk, node2vec=run_node2vec,
                  struc2vec=run_struc2vec)[name]
        emb, history = fn(data, cfg)
        result = dict(final_loss=history[-1][1],
                      initial_loss=history[0][1], embed_shape=emb.shape)

    elif name == "line":
        from .data.edgelist import load_edgelist
        from .models import LINEConfig, run_line

        data = load_edgelist(path=args.dataset, seed=args.seed)
        cfg = _apply_overrides(
            LINEConfig(epochs=args.epochs or 5, seed=args.seed), args.set)
        emb, history = run_line(data, cfg)
        result = dict(final_loss=history[-1][1],
                      initial_loss=history[0][1], embed_shape=emb.shape)

    elif name == "sdne":
        from .data.edgelist import load_edgelist
        from .models import SDNEConfig, run_sdne

        data = load_edgelist(path=args.dataset, seed=args.seed)
        cfg = _apply_overrides(
            SDNEConfig(epochs=args.epochs or 10, seed=args.seed), args.set)
        emb, history = run_sdne(data, cfg)
        result = dict(final_loss=history[-1][1],
                      initial_loss=history[0][1], embed_shape=emb.shape)

    elif name == "metapath2vec":
        from .models import WalkEmbedConfig, run_metapath2vec

        cfg = _apply_overrides(
            WalkEmbedConfig(window=4, num_negatives=4, batch_size=512,
                            epochs=args.epochs or 5, seed=args.seed),
            args.set)
        if args.dataset is not None:
            # JData pipeline (MetaPath2Vec/run.py:29-32: data_procession →
            # read_JData → metapath walks); --dataset = processed dir.
            from .data.jdata import load_jdata
            jd = load_jdata(args.dataset, seed=args.seed)
            emb, history = run_metapath2vec(
                hetero=jd.hetero, metapath=jd.metapath,
                type_offsets=jd.type_offsets, cfg=cfg)
        else:
            emb, history = run_metapath2vec(cfg=cfg)
        result = dict(final_loss=history[-1][1],
                      initial_loss=history[0][1], embed_shape=emb.shape)

    elif name == "gatne":
        from .data.edgelist import load_multiplex
        from .models import GATNEConfig, train_gatne

        data = load_multiplex(root=args.dataset, seed=args.seed)
        cfg = _apply_overrides(
            GATNEConfig(epochs=args.epochs or 5, seed=args.seed), args.set)
        params, history, metrics = train_gatne(data, cfg, verbose=verbose)
        result = dict(test_metrics=metrics)

    elif name == "bine":
        from .models import BiNEConfig, train_bine

        cfg = _apply_overrides(
            BiNEConfig(epochs=args.epochs or 5, seed=args.seed), args.set)
        params, history, metrics = train_bine(cfg=cfg, verbose=verbose)
        result = dict(final_loss=history[-1][1],
                      initial_loss=history[0][1], test_metrics=metrics)

    def _clean(o):
        if isinstance(o, dict):
            return {k: _clean(v) for k, v in o.items()}
        if isinstance(o, (tuple, list)):
            return [_clean(v) for v in o]
        if hasattr(o, "item"):
            return o.item()
        return o

    print(json.dumps({"model": name, **_clean(result)}))
    return result


if __name__ == "__main__":
    main()
