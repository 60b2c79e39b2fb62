"""Accuracy-reproduction harness: train every model family at the
reference's own hyperparameters and record the eval metrics.

The reference publishes no numbers (BASELINE.md), so the oracle is
behavioral: every model must train to its task's success criterion on the
synthetic reference-shaped dataset its loader provides — masked node
classification for GCN/GAT/SAGE/HAN/GTN (SURVEY.md §4 "behavioral
oracles"), link prediction for GATNE/BiNE, loss descent for the
skip-gram/autoencoder embedders (the reference's own eval protocol,
e.g. GraphEmbedding/DeepWalk/train_eval.py:17-71 reports loss only).

Writes REPRO.md at the repo root and prints one JSON line per model.

Usage: python tools/repro_accuracy.py [--fast] [--models gcn,gat,...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (model, cli args, threshold description, check fn over the result dict)
# 4th optional element: REFERENCE-RECIPE args — a second run under the
# reference's own optimizer/schedule (SGD + warmup-poly, --optimizer sgd);
# REPRO.md then shows both columns. HAN's reference epoch count (100,
# HAN/run.py) underfits the synthetic stand-in under SGD; its reference
# column runs the same recipe for 400 epochs (documented in the table).
SPECS = [
    ("gcn", [], "test_acc ≥ 0.80",
     lambda r: r.get("test_acc", 0) >= 0.80),
    ("gat", [], "test_acc ≥ 0.80",
     lambda r: r.get("test_acc", 0) >= 0.80,
     ["--optimizer", "sgd"]),
    ("graphsage", [], "test_acc ≥ 0.80",
     lambda r: r.get("test_acc", 0) >= 0.80,
     ["--optimizer", "sgd", "--epochs", "50"]),
    ("graphsage_unsup", [], "binary_acc ≥ 0.75",
     lambda r: r.get("binary_acc", 0) >= 0.75),
    ("han", [], "test_acc ≥ 0.80",
     lambda r: r.get("test_acc", 0) >= 0.80,
     ["--optimizer", "sgd", "--epochs", "400"]),
    ("han_batch", [], "test_acc ≥ 0.80",
     lambda r: r.get("test_acc", 0) >= 0.80),
    ("gtn", [], "test_acc ≥ 0.80",
     lambda r: r.get("test_acc", 0) >= 0.80),
    ("deepwalk", [], "loss decreases",
     lambda r: r.get("final_loss", 1e9) < r.get("initial_loss", 1e9)),
    ("node2vec", [], "loss decreases",
     lambda r: r.get("final_loss", 1e9) < r.get("initial_loss", 1e9)),
    ("line", [], "loss decreases",
     lambda r: r.get("final_loss", 1e9) < r.get("initial_loss", 1e9)),
    ("struc2vec", [], "loss decreases",
     lambda r: r.get("final_loss", 1e9) < r.get("initial_loss", 1e9)),
    ("sdne", [], "loss decreases",
     lambda r: r.get("final_loss", 1e9) < r.get("initial_loss", 1e9)),
    ("metapath2vec", [], "loss decreases",
     lambda r: r.get("final_loss", 1e9) < r.get("initial_loss", 1e9)),
    # like BiNE below, F1 alone is satisfiable by an always-positive
    # scorer on the balanced split — gate on threshold-free AUC as well
    ("gatne", [], "link-pred F1 ≥ 0.60 and AUC ≥ 0.75",
     lambda r: (_first_metric(r, "f1") >= 0.60
                and _first_metric(r, "auc") >= 0.75)),
    # F1 alone is gameable here (an always-positive scorer gets 0.667 on
    # the balanced split), so BiNE also gates on threshold-free AUC. The
    # reference's own eval is accuracy + BCE + F-beta on explicit-relation
    # scores (BiNE/train_utils/train_eval.py:16-24).
    ("bine", [], "link-pred F1 ≥ 0.60 and AUC ≥ 0.75",
     lambda r: (_first_metric(r, "f1") >= 0.60
                and _first_metric(r, "auc") >= 0.75)),
    ("basis", [], "runs (centralities vs oracle in tests)",
     lambda r: True),
]

FAST_EPOCHS = {"gcn": 400, "gat": 200, "han": 50, "gtn": 20}


def _first_metric(r, key):
    tm = r.get("test_metrics", {})
    if key in tm:
        return tm[key]
    for v in tm.values():  # per-edge-type dicts
        if isinstance(v, dict) and key in v:
            return v[key]
    return 0.0


def _headline(r):
    # link-pred rows print every gated quantity (F1 AND AUC — the
    # criterion requires both, so both belong in the committed table),
    # even when a final_loss is also reported (e.g. bine)
    tm = r.get("test_metrics", {})
    if tm:
        return (f"link-pred f1={_first_metric(r, 'f1'):.4f}"
                f" auc={_first_metric(r, 'auc'):.4f}")
    for k in ("test_acc", "binary_acc", "final_loss"):
        if k in r and r[k] is not None:
            return f"{k}={r[k]:.4f}"
    return "ok"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="cap the long full-batch runs (smoke mode)")
    ap.add_argument("--models", default=None,
                    help="comma-separated subset")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "REPRO.md"))
    args = ap.parse_args(argv)

    from graphneuralnetwork_tpu import cli

    want = set(args.models.split(",")) if args.models else None
    rows = []
    for spec in SPECS:
        name, extra, desc, check = spec[0], spec[1], spec[2], spec[3]
        ref_extra = spec[4] if len(spec) > 4 else None
        if want and name not in want:
            continue

        def run_one(extra_args):
            argv_m = ["--model", name, "--quiet", *extra_args]
            if args.fast and name in FAST_EPOCHS and \
                    "--epochs" not in extra_args:
                argv_m += ["--epochs", str(FAST_EPOCHS[name])]
            t0 = time.perf_counter()
            try:
                res = cli.main(argv_m) or {}
                if ("loss decreases" in desc and "final_loss" in res
                        and "initial_loss" not in res):
                    ok1, err = False, "inconclusive: no initial_loss"
                else:
                    ok1, err = bool(check(res)), ""
            except Exception as e:  # keep going; report the failure
                res, ok1, err = {}, False, f"{type(e).__name__}: {e}"
            dt = time.perf_counter() - t0
            return (_headline(res) if not err else err), ok1, dt

        head, ok, dt = run_one(extra)
        if ref_extra is not None and not args.fast:
            ref_head, ref_ok, ref_dt = run_one(ref_extra)
            ok = ok and ref_ok
            dt += ref_dt
        else:
            ref_head = "—" if ref_extra is None else "(skipped: --fast)"
        rows.append((name, desc, head, ref_head, ok, dt))
        print(json.dumps({"model": name, "pass": ok,
                          "seconds": round(dt, 1), "tpu_fast": head,
                          "reference_recipe": ref_head}), flush=True)

    lines = [
        "# REPRO — reference configs, measured results",
        "",
        "Generated by `python tools/repro_accuracy.py`"
        + (" --fast" if args.fast else "")
        + f" on `{_device_str()}`. Each row trains the model through the"
          " public CLI at the reference's hyperparameters (BASELINE.md) on"
          " its loader's reference-shaped synthetic dataset and applies the"
          " reference's own eval protocol (SURVEY.md §4). The TPU-fast"
          " column is the CLI default (AdamW); the reference-recipe column"
          " re-runs GAT/SAGE/HAN under the reference's own SGD +"
          " warmup-poly training recipe (`--optimizer sgd`; momentum 0.9"
          " added — torch's implicit momentum=0 stalls at the reference"
          " lr; HAN's SGD run extends 100→400 epochs to converge on the"
          " synthetic stand-in). Pass requires BOTH columns to meet the"
          " criterion.",
        "",
        "| Model | Criterion | TPU-fast result | Reference-recipe result"
        " | Pass | Seconds |",
        "|---|---|---|---|---|---|",
    ]
    for name, desc, head, ref_head, ok, dt in rows:
        lines.append(f"| {name} | {desc} | {head} | {ref_head} |"
                     f" {'✅' if ok else '❌'} | {dt:.1f} |")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    n_ok = sum(1 for r in rows if r[4])
    print(f"{n_ok}/{len(rows)} passed -> {args.out}")
    return 0 if n_ok == len(rows) else 1


def _device_str():
    try:
        import jax
        d = jax.devices()[0]
        return f"{d.platform}:{d.device_kind}"
    except Exception:
        return "unknown"


if __name__ == "__main__":
    sys.exit(main())
