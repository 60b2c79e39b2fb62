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
    ("quick", 120),
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


def _clustered_setup(n, e, comm):
    """Build (hybrid, coo, e_real) once per worker process."""
    key = (n, e, comm)
    if key in _GRAPH_CACHE:
        return _GRAPH_CACHE[key]
    import graphneuralnetwork_tpu as g
    from graphneuralnetwork_tpu.core.bcsr import build_hybrid
    from graphneuralnetwork_tpu.core.reorder import relabel_edges

    s, r = _clustered_graph(n, e, comm)
    perm = _memo_locality_order(s, r, n)
    s2, r2 = relabel_edges(perm, s, r)
    hg = build_hybrid(s2, r2, n)
    gr = g.build_graph(s2, r2, n)
    _GRAPH_CACHE[key] = (hg, gr, len(s))
    return _GRAPH_CACHE[key]


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
    return e / t_main, t_xla / t_main


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
    return e / t_ours, t_ref / t_ours


def _bench_spmm_clustered(n=131072, e=2_097_152, f=128, comm=256,
                          iters=4, dtype="float32"):
    """Locality path: community graph → label-propagation clustering →
    hybrid dense-tile BCSR + COO remainder (core/bcsr.py), vs the XLA
    gather+segment_sum on the same graph. This is the speed-of-light
    replacement for torch.spmm on real (clustered) graphs."""
    import jax.numpy as jnp

    from graphneuralnetwork_tpu.ops import set_ops_impl, spmm

    hg, gr, e_real = _clustered_setup(n, e, comm)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    if dtype == "bfloat16":
        x0 = x0.astype(jnp.bfloat16)

    t_hyb = _timed_chain(lambda x: spmm(hg, x), x0, iters)
    set_ops_impl("xla")
    t_xla = _timed_chain(lambda x: spmm(gr, x), x0, iters)
    set_ops_impl("auto")
    return e_real / t_hyb, t_xla / t_hyb


# ---------------------------------------------------------------------------
# sections
# ---------------------------------------------------------------------------


def run_section(name: str) -> dict:
    if name == "quick":
        # Small-shape clustered bf16: cheap headline-capable fallback.
        eps, speed = _bench_spmm_clustered(
            n=32768, e=524_288, comm=256, iters=2, dtype="bfloat16")
        return {"metric": "spmm_clustered_bf16_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
                "vs_baseline": round(speed, 3), "note": "small-shape"}
    if name == "clustered_bf16":
        eps, speed = _bench_spmm_clustered(dtype="bfloat16")
        return {"metric": "spmm_clustered_bf16_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
                "vs_baseline": round(speed, 3)}
    if name == "clustered_f32":
        eps, speed = _bench_spmm_clustered(dtype="float32")
        return {"metric": "spmm_clustered_f32_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
                "vs_baseline": round(speed, 3)}
    if name == "spmm_bf16":
        eps, speed = _bench_spmm(dtype="bfloat16")
        return {"metric": "spmm_bf16_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
                "vs_baseline": round(speed, 3)}
    if name == "spmm_f32":
        eps, speed = _bench_spmm(dtype="float32")
        return {"metric": "spmm_f32_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
                "vs_baseline": round(speed, 3)}
    if name == "sddmm":
        eps, speed = _bench_sddmm()
        return {"metric": "sddmm_edges_per_s_per_chip",
                "value": round(eps, 1), "unit": "edges/s",
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
