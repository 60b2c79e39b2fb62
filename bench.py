"""Benchmark driver: SpMM edges/s on the flagship aggregation path.

Prints one JSON result line per section as it completes, and ALWAYS
re-prints the best available headline as the FINAL line:
{"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares the fast path (hybrid BCSR dense-tile / Pallas COO)
against the XLA gather+segment_sum path on the same device, graph and
dtype — the stand-in for the reference's torch.spmm (GCN/GCN.py:43; the
reference publishes no numbers, BASELINE.md).

Fail-safe structure (round 4; BENCH_r03 was rc=124 with zero output).
Platform reality measured this round: the FIRST device sync of a process
pays a 1-4 minute remote claim/init tax, after which dispatches cost
~30-40 ms; individual remote compiles can also stall for minutes when
the compile service degrades. Hence:

  * ONE worker subprocess runs all sections sequentially (pays the
    per-process init tax once); the parent watchdog enforces per-section
    stall deadlines and kills/respawns the worker past a deadline, so a
    hung compile loses one section, never the artifact;
  * sections run headline-first, so the flagship number exists as soon
    as possible;
  * the JAX persistent compilation cache (.cache/jax) is enabled in the
    worker — re-runs (including the driver's end-of-round run) skip the
    degradation-prone remote compiles (verified: cached compile 0.3 s);
  * the host-side 2M-edge LPA clustering permutation is memoised to
    .cache/ (deterministic given the seed);
  * successful section results persist to .cache/bench_results.json; if
    every live section fails, the freshest stored headline is re-printed
    with "stale": true rather than printing nothing.
"""

import argparse
import functools
import hashlib
import json
import os
import queue
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(REPO, ".cache")
JAX_CACHE = os.path.join(CACHE_DIR, "jax")
RESULTS_FILE = os.path.join(CACHE_DIR, "bench_results.json")

# Preference order for the final headline line (first available wins).
HEADLINE_ORDER = [
    "clustered_bf16",   # the flagship: locality-clustered graph, MXU tiles
    "quick",            # small-shape clustered bf16 fallback
    "spmm_bf16",        # random-graph COO Pallas
    "spmm_f32",
    "sddmm",
]

SECTIONS = [
    # (name, stall_allowance_s once the worker is warm) — headline-first.
    ("clustered_bf16", 240),
    ("gat_attend", 300),
    ("quick", 120),
    ("epochs_quick", 180),
    ("spmm_bf16", 150),
    ("sddmm", 120),
    ("clustered_f32", 120),
    ("spmm_f32", 120),
]
# Extra allowance for the worker's first result line (device claim/init
# tax + first compiles).
INIT_ALLOWANCE_S = 330


def _enable_cache():
    os.makedirs(JAX_CACHE, exist_ok=True)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", JAX_CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimisation only
        pass


# ---------------------------------------------------------------------------
# measurement helpers (run inside the worker subprocess)
# ---------------------------------------------------------------------------


def _timed_chain(fn, x0, iters, reps=3):
    """Best per-iteration time of an unrolled dependency chain in one jit
    (amortises the ~30ms axon dispatch overhead; the dependency through x
    defeats hoisting/DCE — PERF_NOTES methodology)."""
    import jax

    @jax.jit
    def chain(x):
        for _ in range(iters):
            out = fn(x)
            x = out * 1e-3 + x * 0.5
        return x

    out = chain(x0)
    _ = np.asarray(out[-1, -1])  # sync via host transfer
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(x0)
        _ = np.asarray(out[-1, -1])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def _clustered_graph(n, e, comm, seed=0):
    """Shuffled community graph: ~90% intra-community edges hidden behind
    random node ids (locality must be *recovered* by LPA, not given)."""
    rng = np.random.default_rng(seed)
    shuffle = rng.permutation(n)
    s = rng.integers(0, n, e).astype(np.int64)
    intra = rng.random(e) < 0.9
    inv = np.empty(n, np.int64)
    inv[shuffle] = np.arange(n)
    base = (shuffle[s] // comm) * comm
    r = np.where(intra,
                 inv[np.minimum(base + rng.integers(0, comm, e), n - 1)],
                 rng.integers(0, n, e))
    keep = s != r
    return s[keep].astype(np.int32), r[keep].astype(np.int32)


def _memo_locality_order(s, r, n):
    """Disk-memoised LPA ordering (deterministic; the 2M-edge build costs
    ~a minute of host time the driver run should not repay)."""
    from graphneuralnetwork_tpu.core.reorder import locality_order

    h = hashlib.sha1()
    h.update(np.ascontiguousarray(s[:4096]))
    h.update(np.ascontiguousarray(r[:4096]))
    h.update(np.int64(len(s)).tobytes() + np.int64(n).tobytes())
    path = os.path.join(CACHE_DIR, f"perm_{h.hexdigest()[:16]}.npy")
    if os.path.exists(path):
        perm = np.load(path)
        if perm.shape[0] == n:
            return perm
    perm = locality_order(s, r, n)
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        np.save(path, perm)
    except OSError:
        pass
    return perm


_GRAPH_CACHE: dict = {}


def _clustered_setup(n, e, comm, dtype="float32"):
    """Build (hybrid, coo, e_real) once per worker process.

    bf16 sections get bf16 tile stores: the bench graph's edge weights
    are unit counts (small ints — exact in bf16), and f32 tiles would
    otherwise be the kernel's single largest stream (134 MB at the
    headline shape) plus an in-jit cast pass."""
    key = (n, e, comm, dtype)
    if key in _GRAPH_CACHE:
        return _GRAPH_CACHE[key]
    import graphneuralnetwork_tpu as g
    from graphneuralnetwork_tpu.core.bcsr import build_hybrid
    from graphneuralnetwork_tpu.core.reorder import relabel_edges

    s, r = _clustered_graph(n, e, comm)
    perm = _memo_locality_order(s, r, n)
    s2, r2 = relabel_edges(perm, s, r)
    tile_dtype = np.float32
    if dtype == "bfloat16":
        import jax.numpy as jnp
        tile_dtype = jnp.bfloat16
    hg = build_hybrid(s2, r2, n, dtype=tile_dtype)
    gr = g.build_graph(s2, r2, n)
    _GRAPH_CACHE[key] = (hg, gr, len(s))
    return _GRAPH_CACHE[key]


# ---------------------------------------------------------------------------
# achieved-bandwidth accounting (VERDICT r4 #2): every section models the
# bytes its fast path moves through HBM and reports bytes/time as "gbps",
# to be read against the chip's own measured ceilings (PERF_NOTES):
# Pallas per-stream DMA ~160-300 GB/s, XLA streaming ~620 GB/s, random
# row-gather ~140 GB/s. Models count each materialised buffer once per
# read/write of its dominant streams (index/weight side arrays ≤2% are
# dropped); they are traffic models, not measurements.
# ---------------------------------------------------------------------------


def _coo_spmm_bytes(e_pad, n_pad, f, b):
    """gather random-read E·F·b + write gathered E·F·b + kernel read
    E·F·b + out write N·F·4 (f32 accumulators) + cast back N·F·b."""
    return 3 * e_pad * f * b + n_pad * f * (4 + b)


def _hybrid_spmm_bytes(hg, f, b):
    """tiles T·RB·CB·tb + x-blocks T·CB·F·b + tile-out N·F·4, plus the
    COO remainder (same model as _coo_spmm_bytes) and the final add."""
    from graphneuralnetwork_tpu.core.bcsr import COL_BLOCK, ROW_BLOCK

    t = hg.bcsr.tiles.shape[0]
    tb = hg.bcsr.tiles.dtype.itemsize
    n_pad = hg.bcsr.n_node_pad
    tile = t * (ROW_BLOCK * COL_BLOCK * tb + COL_BLOCK * f * b) \
        + n_pad * f * 4
    rem = _coo_spmm_bytes(hg.rem.n_edge_pad, n_pad, f, b)
    return tile + rem + 2 * n_pad * f * b   # + elementwise add


def _bench_spmm(n=131072, e=2_097_152, f=128, iters=4, dtype="float32"):
    import jax.numpy as jnp

    import graphneuralnetwork_tpu as g
    from graphneuralnetwork_tpu.ops import set_ops_impl, spmm

    rng = np.random.default_rng(0)
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    gr = g.build_graph(s, r, n)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    if dtype == "bfloat16":
        x0 = x0.astype(jnp.bfloat16)

    t_main = _timed_chain(lambda x: spmm(gr, x), x0, iters)
    set_ops_impl("xla")
    t_xla = _timed_chain(lambda x: spmm(gr, x), x0, iters)
    set_ops_impl("auto")
    b = 2 if dtype == "bfloat16" else 4
    gbps = _coo_spmm_bytes(gr.n_edge_pad, gr.n_node_pad, f, b) \
        / t_main / 1e9
    return e / t_main, t_xla / t_main, gbps


def _bench_sddmm(n=131072, e=2_097_152, f=128, iters=4):
    """Edge scoring (SDDMM): our two-gather dot vs the reference's
    formulation that materialises the E×2F concat then dots with the
    attention vector (GAT/models/layers.py:105-108)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    r = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    a_vec = jnp.asarray(rng.normal(size=(2 * f,)).astype(np.float32))

    from graphneuralnetwork_tpu.ops.spmm import sddmm_additive

    def ours(x):
        # additive decomposition: a·[x_s ‖ x_r] = a_src·x_s + a_dst·x_r,
        # with the scalar logits packed into [N, 2] rows (narrow row
        # gathers are ~2x faster than 1-D gathers on TPU).
        return sddmm_additive(s, r, x @ a_vec[:f], x @ a_vec[f:])

    def reference_style(x):
        edge_h = jnp.concatenate([x[s], x[r]], axis=1)  # E×2F materialised
        return edge_h @ a_vec

    def timed(fn):
        @jax.jit
        def chain(x):
            acc = jnp.float32(0)
            for _ in range(iters):
                out = fn(x)
                acc = acc + out[-1]
                x = x + acc * 1e-9
            return x

        out = chain(x0)
        _ = np.asarray(out[-1, -1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = chain(x0)
            _ = np.asarray(out[-1, -1])
            best = min(best, time.perf_counter() - t0)
        return best / iters

    t_ours = timed(ours)
    t_ref = timed(reference_style)
    # bytes: two [N,2]-packed row gathers (16 B/edge) + logit write/read
    # + the two x@a projections streaming x twice
    gbps = (e * (16 + 8) + 2 * n * f * 4) / t_ours / 1e9
    return e / t_ours, t_ref / t_ours, gbps


def _bench_spmm_clustered(n=131072, e=2_097_152, f=128, comm=256,
                          iters=4, dtype="float32"):
    """Locality path: community graph → label-propagation clustering →
    hybrid dense-tile BCSR + COO remainder (core/bcsr.py), vs the XLA
    gather+segment_sum on the same graph. This is the speed-of-light
    replacement for torch.spmm on real (clustered) graphs."""
    import jax.numpy as jnp

    from graphneuralnetwork_tpu.ops import set_ops_impl, spmm

    hg, gr, e_real = _clustered_setup(n, e, comm, dtype)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    if dtype == "bfloat16":
        x0 = x0.astype(jnp.bfloat16)

    t_hyb = _timed_chain(lambda x: spmm(hg, x), x0, iters)
    set_ops_impl("xla")
    t_xla = _timed_chain(lambda x: spmm(gr, x), x0, iters)
    set_ops_impl("auto")
    b = 2 if dtype == "bfloat16" else 4
    gbps = _hybrid_spmm_bytes(hg, f, b) / t_hyb / 1e9
    return e_real / t_hyb, t_xla / t_hyb, gbps


def _bench_gat_attend(n=131072, e=2_097_152, f=128, heads=8, comm=256,
                      iters=3):
    """The flagship attention result (VERDICT r4 #1): tiled GAT softmax
    aggregation (ops/bcsr_attention.py) vs the COO edge_softmax +
    spmm_weighted path that replaces GAT/models/layers.py:105-122, at
    the 2M-edge clustered shape, bf16, H=8, F=128 — forward AND full
    train step (fwd+bwd w.r.t. x, f_src, f_dst)."""
    import jax
    import jax.numpy as jnp

    import graphneuralnetwork_tpu as g
    from graphneuralnetwork_tpu.core.bcsr import build_hybrid
    from graphneuralnetwork_tpu.core.reorder import relabel_edges
    from graphneuralnetwork_tpu.ops import edge_softmax
    from graphneuralnetwork_tpu.ops.bcsr_attention import gat_tiled_attend
    from graphneuralnetwork_tpu.ops.spmm import spmm_weighted

    s, r = _clustered_graph(n, e, comm)
    e_real = len(s)
    perm = _memo_locality_order(s, r, n)
    s2, r2 = relabel_edges(perm, s, r)
    # unit weights — GAT semantics; bf16 tile store is exact for the
    # binary adjacency and halves the kernels' tile stream
    hg = build_hybrid(s2, r2, n, dtype=jnp.bfloat16)
    gr = g.build_graph(s2, r2, n)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, heads, f)).astype(np.float32),
                    jnp.bfloat16)
    fs = jnp.asarray(rng.normal(size=(n, heads)).astype(np.float32))
    fd = jnp.asarray(rng.normal(size=(n, heads)).astype(np.float32))

    def coo_fwd(g_, xx, a, b):
        sc = a[g_.senders] + b[g_.receivers]
        sc = jnp.where(sc > 0, sc, 0.2 * sc)
        al = edge_softmax(g_, sc)
        return spmm_weighted(g_, al.astype(xx.dtype), xx)

    def tiled_fwd(g_, xx, a, b):
        return gat_tiled_attend(g_, xx, a, b)

    def timed(fn, graph, grad):
        # graph passes as a jit ARGUMENT: closed-over containers embed
        # 100MB+ HLO constants and the remote-compile endpoint rejects
        # the request body (HTTP 413 — verify SKILL.md)
        if grad:
            gfn = jax.grad(
                lambda g_, xx, a, b: jnp.sum(
                    fn(g_, xx, a, b).astype(jnp.float32) * 1e-3),
                argnums=(1, 2, 3))

            def step(g_, carry, _):
                xx, a, b = carry
                dx, da, db = gfn(g_, xx, a, b)
                return (xx * 0.5 + dx.astype(xx.dtype) * 1e-3,
                        a + da * 1e-6, b + db * 1e-6), None
        else:
            def step(g_, carry, _):
                xx, a, b = carry
                out = fn(g_, xx, a, b)
                return (xx * 0.5 + out * 1e-3,
                        a + out[:, :, 0].astype(a.dtype) * 1e-6, b), None

        @jax.jit
        def chain(g_, xx, a, b):
            (xx, a, b), _ = jax.lax.scan(
                functools.partial(step, g_), (xx, a, b), None,
                length=iters)
            return xx.ravel()[0].astype(jnp.float32)   # scalar sync

        _ = np.asarray(chain(graph, x, fs, fd))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(chain(graph, x, fs, fd))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t_tile_f = timed(tiled_fwd, hg, grad=False)
    t_coo_f = timed(coo_fwd, gr, grad=False)
    t_tile_g = timed(tiled_fwd, hg, grad=True)
    t_coo_g = timed(coo_fwd, gr, grad=True)

    # coarse fwd traffic model: tiles read twice (nmax + attend) +
    # x-blocks once + remainder gather×3 + [N, H·F] out + partials
    from graphneuralnetwork_tpu.core.bcsr import COL_BLOCK, ROW_BLOCK
    t_tiles = hg.bcsr.tiles.shape[0]
    n_pad = hg.bcsr.n_node_pad
    hf = heads * f
    fwd_bytes = (2 * t_tiles * ROW_BLOCK * COL_BLOCK * 4
                 + t_tiles * COL_BLOCK * hf * 2
                 + 3 * hg.rem.n_edge_pad * hf * 2
                 + 2 * n_pad * hf * 4)
    return dict(e_real=e_real, fwd_ms=t_tile_f * 1e3,
                fwd_speedup=t_coo_f / t_tile_f,
                train_eps=e_real / t_tile_g,
                train_speedup=t_coo_g / t_tile_g,
                train_ms=t_tile_g * 1e3,
                gbps=fwd_bytes / t_tile_f / 1e9)


def _bench_epochs_quick(epochs=300):
    """Driver-witnessed epochs/s anchor (VERDICT r4 #6): the scanned
    full-batch GCN at the Cora shape, bf16 (BASELINE.md north star;
    replaces the per-epoch Python loop of GCN/train_eval.py:20-67).
    vs_baseline = the same scanned run on the XLA ops impl (the kernel
    stack is shape-neutral at Cora scale; the number anchors epochs/s)."""
    import jax
    import jax.numpy as jnp
    import optax

    from graphneuralnetwork_tpu.data import load_cora
    from graphneuralnetwork_tpu.nn import GCN
    from graphneuralnetwork_tpu.ops import set_ops_impl
    from graphneuralnetwork_tpu.train.loop import create_train_state
    from graphneuralnetwork_tpu.train.scan_loop import (
        make_scanned_node_classification_run)

    data = load_cora(seed=0)
    model = GCN(hidden=128, num_classes=data.num_classes, dropout=0.5,
                dtype=jnp.bfloat16)
    tx = optax.adamw(2e-3, weight_decay=5e-4)
    state = create_train_state(model, data.graph, data.features,
                               jax.random.PRNGKey(0), tx)
    run = make_scanned_node_classification_run(model, epochs)

    def timed():
        _, ms = run(state, data.graph, data.features, data.labels,
                    data.train_idx, data.val_idx)
        _ = np.asarray(ms["loss"][-1])       # warm/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, ms = run(state, data.graph, data.features, data.labels,
                        data.train_idx, data.val_idx)
            _ = np.asarray(ms["loss"][-1])
            best = min(best, time.perf_counter() - t0)
        return epochs / best

    eps = timed()
    set_ops_impl("xla")
    try:
        eps_xla = timed()
    finally:
        set_ops_impl("auto")
    return eps, eps / eps_xla


# ---------------------------------------------------------------------------
# sections
# ---------------------------------------------------------------------------


def run_section(name: str) -> dict:
    if name == "quick":
        # Small-shape clustered bf16: cheap headline-capable fallback.
        eps, speed, gbps = _bench_spmm_clustered(
            n=32768, e=524_288, comm=256, iters=2, dtype="bfloat16")
        return {"metric": "spmm_clustered_bf16_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
                "vs_baseline": round(speed, 3), "note": "small-shape",
                "gbps": round(gbps, 1)}
    if name == "clustered_bf16":
        eps, speed, gbps = _bench_spmm_clustered(dtype="bfloat16")
        return {"metric": "spmm_clustered_bf16_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
                "vs_baseline": round(speed, 3), "gbps": round(gbps, 1)}
    if name == "clustered_f32":
        eps, speed, gbps = _bench_spmm_clustered(dtype="float32")
        return {"metric": "spmm_clustered_f32_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
                "vs_baseline": round(speed, 3), "gbps": round(gbps, 1)}
    if name == "spmm_bf16":
        eps, speed, gbps = _bench_spmm(dtype="bfloat16")
        return {"metric": "spmm_bf16_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
                "vs_baseline": round(speed, 3), "gbps": round(gbps, 1)}
    if name == "spmm_f32":
        eps, speed, gbps = _bench_spmm(dtype="float32")
        return {"metric": "spmm_f32_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
                "vs_baseline": round(speed, 3), "gbps": round(gbps, 1)}
    if name == "sddmm":
        eps, speed, gbps = _bench_sddmm()
        return {"metric": "sddmm_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
                "vs_baseline": round(speed, 3), "gbps": round(gbps, 1)}
    if name == "gat_attend":
        r = _bench_gat_attend()
        return {"metric": "gat_attend_train_edges_per_s_per_chip",
                "value": round(r["train_eps"], 1), "unit": "edges/s",
                "vs_baseline": round(r["train_speedup"], 3),
                "train_ms": round(r["train_ms"], 1),
                "fwd_ms": round(r["fwd_ms"], 1),
                "fwd_speedup": round(r["fwd_speedup"], 3),
                "gbps": round(r["gbps"], 1)}
    if name == "epochs_quick":
        eps, speed = _bench_epochs_quick()
        return {"metric": "gcn_epochs_per_s_cora_bf16",
                "value": round(eps, 1), "unit": "epochs/s",
                "vs_baseline": round(speed, 3)}
    raise SystemExit(f"unknown section {name!r}")


def run_worker(section_names):
    _enable_cache()
    for name in section_names:
        try:
            res = run_section(name)
        except Exception as ex:  # noqa: BLE001 — isolate section failures
            print(json.dumps({"section": name,
                              "error": f"{type(ex).__name__}: {ex}"[:200]}),
                  flush=True)
            continue
        res["section"] = name
        print(json.dumps(res), flush=True)


# ---------------------------------------------------------------------------
# parent orchestrator
# ---------------------------------------------------------------------------


def _load_stored() -> dict:
    try:
        with open(RESULTS_FILE) as f:
            return json.load(f)
    except Exception:  # noqa: BLE001
        return {}


def _store(results: dict) -> None:
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        with open(RESULTS_FILE, "w") as f:
            json.dump(results, f)
    except Exception:  # noqa: BLE001
        pass


def _spawn_worker(names):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", JAX_CACHE)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--worker", ",".join(names)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        bufsize=1, cwd=REPO, env=env)
    q: "queue.Queue[str]" = queue.Queue()

    def reader():
        for line in proc.stdout:
            q.put(line)
        q.put("")  # EOF marker

    threading.Thread(target=reader, daemon=True).start()
    return proc, q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default=None)
    ap.add_argument("--worker", default=None)
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 500)))
    args = ap.parse_args()

    if args.section:
        _enable_cache()
        print(json.dumps(run_section(args.section)), flush=True)
        return
    if args.worker:
        run_worker(args.worker.split(","))
        return

    t0 = time.time()
    os.makedirs(JAX_CACHE, exist_ok=True)
    allowance = {name: a for name, a in SECTIONS}
    pending = [name for name, _ in SECTIONS]
    results: dict = {}
    spawns = 0

    while pending and spawns < 3:
        remaining = args.budget - (time.time() - t0)
        if remaining < 60:
            break
        spawns += 1
        proc, q = _spawn_worker(pending)
        warm = False
        try:
            while pending:
                current = pending[0]
                deadline = allowance[current] + (
                    0 if warm else INIT_ALLOWANCE_S)
                deadline = min(deadline,
                               args.budget - (time.time() - t0) - 10)
                if deadline <= 0:
                    break
                try:
                    line = q.get(timeout=deadline)
                except queue.Empty:
                    print(f"# section {current} stalled "
                          f"({allowance[current]}s allowance)",
                          file=sys.stderr, flush=True)
                    pending.pop(0)   # drop the hung section
                    break            # kill + respawn for the rest
                if line == "":       # worker exited
                    pending = [p for p in pending if p not in results]
                    if proc.poll() is not None and not pending:
                        break
                    # crashed mid-list: drop the section it died on
                    if pending:
                        pending.pop(0)
                    break
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                warm = True
                name = rec.pop("section", None)
                if name in pending:
                    pending.remove(name)
                if "error" in rec:
                    print(f"# section {name} failed: {rec['error']}",
                          file=sys.stderr, flush=True)
                    continue
                results[name] = rec
                print(json.dumps(rec), flush=True)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()

    if results:
        stored = _load_stored()
        stored.update(results)
        _store(stored)

    # ALWAYS end with the best available headline (live > stored-stale).
    for source, pool in (("live", results), ("stale", _load_stored())):
        for name in HEADLINE_ORDER:
            if name in pool:
                final = dict(pool[name])
                if source == "stale":
                    final["stale"] = True
                print(json.dumps(final), flush=True)
                return
    # Nothing measured and nothing stored: emit an explicit failure record
    # (rc stays 0 so the stderr context reaches the artifact tail).
    print(json.dumps({"metric": "spmm_clustered_bf16_edges_per_s_per_chip",
                      "value": None, "unit": "edges/s",
                      "vs_baseline": None, "error": "all sections failed"}),
          flush=True)


if __name__ == "__main__":
    main()
