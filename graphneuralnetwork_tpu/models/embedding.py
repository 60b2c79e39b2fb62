"""End-to-end embedding model drivers with the reference's exact defaults.

Each ``run_*`` mirrors one reference ``run.py``: walk generation →
skip-gram dataset → jitted training → embedding table. Hyperparameter
defaults cite their source lines (BASELINE.md table).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import numpy as np
import optax

from ..data.edgelist import EdgeListData, load_edgelist
from ..nn.embed import LINE as LINEModel
from ..nn.embed import SDNE as SDNEModel
from ..nn.embed import SkipGram
from ..sampling import (
    Node2VecWalker,
    csr_from_edges,
    minibatches,
    skipgram_dataset,
    uniform_walks,
)
from ..train.embed_loop import (
    get_embedding,
    make_line_step,
    make_skipgram_step,
    train_skipgram,
)


@dataclass
class WalkEmbedConfig:
    """Shared defaults: 80 walks × len 10, window 5, neg 5, dim 128,
    lr 2e-3 Adam, batch 256 (DeepWalk/run.py:7-12, Node2vec/run.py:7-14,
    Struc2Vec/run.py:7-15)."""
    num_walks: int = 80
    walk_length: int = 10
    window: int = 5
    num_negatives: int = 5
    embed_dim: int = 128
    lr: float = 2e-3
    batch_size: int = 256
    epochs: int = 5
    seed: int = 0
    # node2vec biases (Node2vec/run.py:7-8)
    p: float = 0.25
    q: float = 2.0
    # frequency subsampling threshold (DeepWalk/data_utils.py:65-76);
    # None disables — small corpora drop almost everything at 1e-4
    subsample_t: float | None = 1e-4
    # generate uniform walks on the accelerator (lax.scan over a padded
    # HBM neighbor table, sampling/device_neighbor.py) instead of the
    # host CPU / C++ engine
    device_walks: bool = False


def _train_from_walks(walks: np.ndarray, n_nodes: int,
                      cfg: WalkEmbedConfig):
    rng = np.random.default_rng(cfg.seed)
    arrays = skipgram_dataset(
        walks, n_nodes, window=cfg.window,
        num_negatives=cfg.num_negatives, rng=rng,
        subsample_t=cfg.subsample_t)
    model = SkipGram(vocab_size=n_nodes, embed_dim=cfg.embed_dim)
    params, history = train_skipgram(
        model, arrays, epochs=cfg.epochs, batch_size=cfg.batch_size,
        optimizer=optax.adam(cfg.lr), seed=cfg.seed)
    return get_embedding(params, "center"), history


def run_deepwalk(data: Optional[EdgeListData] = None,
                 cfg: Optional[WalkEmbedConfig] = None):
    """DeepWalk (GraphEmbedding/DeepWalk/run.py:6-17)."""
    cfg = cfg or WalkEmbedConfig()
    data = data or load_edgelist(seed=cfg.seed)
    rng = np.random.default_rng(cfg.seed)
    indptr, indices, _ = csr_from_edges(
        data.senders, data.receivers, data.n_nodes)
    starts = np.tile(np.arange(data.n_nodes), cfg.num_walks)
    if cfg.device_walks:
        import jax
        import jax.numpy as jnp
        from ..sampling.device_neighbor import (
            build_device_neighbor_table, device_uniform_walks)
        table, deg = build_device_neighbor_table(indptr, indices)
        walks = np.asarray(jax.jit(
            device_uniform_walks, static_argnames=("length",))(
                jax.random.PRNGKey(cfg.seed), jnp.asarray(starts),
                cfg.walk_length, table, deg))
    else:
        walks = uniform_walks(indptr, indices, starts, cfg.walk_length, rng)
    return _train_from_walks(walks, data.n_nodes, cfg)


def run_node2vec(data: Optional[EdgeListData] = None,
                 cfg: Optional[WalkEmbedConfig] = None):
    """Node2vec p/q walks (GraphEmbedding/Node2vec/run.py:6-19)."""
    cfg = cfg or WalkEmbedConfig()
    data = data or load_edgelist(seed=cfg.seed)
    rng = np.random.default_rng(cfg.seed)
    indptr, indices, w = csr_from_edges(
        data.senders, data.receivers, data.n_nodes, data.weights)
    starts = np.tile(np.arange(data.n_nodes), cfg.num_walks)
    if cfg.device_walks:
        import jax
        import jax.numpy as jnp
        from ..sampling.device_walks import (build_node2vec_tables,
                                             device_node2vec_walks)
        tables = build_node2vec_tables(indptr, indices, p=cfg.p, q=cfg.q,
                                       weights=w)
        walks = np.asarray(jax.jit(
            device_node2vec_walks, static_argnames=("length",))(
                jax.random.PRNGKey(cfg.seed), jnp.asarray(starts),
                cfg.walk_length, tables))
    else:
        walker = Node2VecWalker(indptr, indices, p=cfg.p, q=cfg.q,
                                weights=w)
        walks = walker.walk(starts, cfg.walk_length, rng)
    return _train_from_walks(walks, data.n_nodes, cfg)


def run_struc2vec(data: Optional[EdgeListData] = None,
                  cfg: Optional[WalkEmbedConfig] = None,
                  k_max: int = 3, stay_prob: float = 0.3):
    """Struc2Vec multilayer walks (GraphEmbedding/Struc2Vec/run.py:6-19)."""
    from ..sampling.struc2vec import Struc2VecWalker, build_multilayer_graph

    cfg = cfg or WalkEmbedConfig()
    data = data or load_edgelist(seed=cfg.seed)
    rng = np.random.default_rng(cfg.seed)
    indptr, indices, _ = csr_from_edges(
        data.senders, data.receivers, data.n_nodes)
    layers = build_multilayer_graph(indptr, indices, data.n_nodes,
                                    k_max=k_max)
    walker = Struc2VecWalker(layers, stay_prob=stay_prob)
    starts = np.tile(np.arange(data.n_nodes), cfg.num_walks)
    walks = walker.walk(starts, cfg.walk_length, rng)
    # struc2vec trains skip-gram WITHOUT frequency subsampling
    arrays = skipgram_dataset(
        walks, data.n_nodes, window=cfg.window,
        num_negatives=cfg.num_negatives,
        rng=rng, subsample_t=None)
    model = SkipGram(vocab_size=data.n_nodes, embed_dim=cfg.embed_dim)
    params, history = train_skipgram(
        model, arrays, epochs=cfg.epochs, batch_size=cfg.batch_size,
        optimizer=optax.adam(cfg.lr), seed=cfg.seed)
    return get_embedding(params, "center"), history


@dataclass
class LINEConfig:
    """dim=128, neg=5, batch=32, lr=2e-3 (LINE/run.py:10-12)."""
    embed_dim: int = 128
    num_negatives: int = 5
    batch_size: int = 32
    lr: float = 2e-3
    epochs: int = 5
    seed: int = 0


def run_line(data: Optional[EdgeListData] = None,
             cfg: Optional[LINEConfig] = None):
    """LINE: neighbors-as-contexts (no walks, LINE/data_utils.py:33-43),
    degree^0.75 negatives (:46-54), pagerank-weighted 2nd-order loss
    (:112, train_eval.py:47-51)."""
    import jax.numpy as jnp

    from ..sampling.skipgram import NegativeSampler, batchify

    cfg = cfg or LINEConfig()
    data = data or load_edgelist(seed=cfg.seed)
    rng = np.random.default_rng(cfg.seed)
    n = data.n_nodes
    indptr, indices, _ = csr_from_edges(data.senders, data.receivers, n)
    deg = (indptr[1:] - indptr[:-1]).astype(np.float64)

    # pagerank weights per center (power iteration; replaces networkx)
    pr = np.full(n, 1.0 / n)
    out_deg = np.maximum(deg, 1)
    for _ in range(30):
        contrib = pr / out_deg
        nxt = np.zeros(n)
        np.add.at(nxt, indices, contrib[np.repeat(
            np.arange(n), (indptr[1:] - indptr[:-1]))])
        pr = 0.15 / n + 0.85 * nxt
    pr = pr * n  # scale ~1

    # centers = every node; contexts = its neighbors (padded)
    max_deg = int(deg.max())
    contexts = np.full((n, max_deg), -1, np.int64)
    for v in range(n):
        nb = indices[indptr[v]:indptr[v + 1]]
        contexts[v, :len(nb)] = nb
    centers = np.arange(n, dtype=np.int64)
    sampler = NegativeSampler(np.maximum(deg, 1))
    K = cfg.num_negatives * max_deg
    negs = sampler.draw((n, K), rng)
    keep = np.arange(K)[None, :] < (cfg.num_negatives * deg)[:, None]
    negs = np.where(keep, negs, -1)
    c, cn, lab, mask = batchify(centers, contexts, negs)

    model = LINEModel(vocab_size=n, embed_dim=cfg.embed_dim)

    def line_device_loss(p, centers_b, ctx_b, labels_b, mask_b, w_b):
        # LINE loss in scan-able form (same math as make_line_step):
        # BCE(first) + per-center-pagerank-weighted BCE(second)
        from ..train.metrics import masked_sigmoid_bce

        first, second = model.apply({"params": p}, centers_b, ctx_b)
        l1 = masked_sigmoid_bce(first, labels_b, mask_b)
        l2 = masked_sigmoid_bce(second * w_b[:, None], labels_b, mask_b)
        return l1 + l2, jnp_zero()

    import jax.numpy as _jnp

    def jnp_zero():
        return _jnp.float32(0.0)

    params, history = train_skipgram(
        model, (c, cn, lab, mask),
        epochs=cfg.epochs, batch_size=cfg.batch_size,
        optimizer=optax.adam(cfg.lr), seed=cfg.seed,
        step_fn_factory=make_line_step,
        extra_batch_arrays=(pr.astype(np.float32),),
        device_loss_fn=line_device_loss)
    return get_embedding(params, "vertex"), history


@dataclass
class SDNEConfig:
    """hidden=[256,128], α=1e-6, β=5, wd=1e-4, batch=32, lr=2e-3
    (SDNE/run.py:7-9)."""
    hidden_dims: Tuple[int, ...] = (256, 128)
    alpha: float = 1e-6
    beta: float = 5.0
    weight_decay: float = 1e-4
    batch_size: int = 32
    lr: float = 2e-3
    epochs: int = 10
    seed: int = 0


def run_sdne(data: Optional[EdgeListData] = None,
             cfg: Optional[SDNEConfig] = None):
    """SDNE autoencoder (GraphEmbedding/SDNE/run.py:6-14): reconstruct
    adjacency rows with β-weighting + Laplacian smoothness over the batch
    sub-graph (creat_A_L data_utils.py:12-31, losses train_eval.py:9-28)."""
    import jax
    import jax.numpy as jnp

    from ..nn.embed import sdne_loss_first, sdne_loss_second

    cfg = cfg or SDNEConfig()
    data = data or load_edgelist(seed=cfg.seed)
    rng = np.random.default_rng(cfg.seed)
    n = data.n_nodes
    a = np.zeros((n, n), np.float32)
    a[data.senders, data.receivers] = data.weights

    model = SDNEModel(n_nodes=n, hidden_dims=cfg.hidden_dims)
    params = model.init(jax.random.PRNGKey(cfg.seed),
                        jnp.zeros((2, n)))["params"]
    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rows, sub_a):
        # L = D − A on the batch sub-graph (data_utils.py:24-31)
        d = jnp.diag(sub_a.sum(1))
        sub_l = d - sub_a

        def loss_fn(p):
            y, x_hat = model.apply({"params": p}, rows)
            l1 = sdne_loss_first(y, rows, sub_l, cfg.alpha)
            l2 = sdne_loss_second(x_hat, rows, cfg.beta)
            return l1 + l2

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    nb = max((n - cfg.batch_size) // cfg.batch_size + 1, 1) \
        if n >= cfg.batch_size else 0
    if jax.default_backend() != "cpu" and nb > 0:
        # device epoch loop: A stays resident, batch row/sub-matrix
        # gathers happen on device, one lax.scan dispatch per epoch
        # (the host loop pays ~30 ms tunnel latency per batch).
        # NOTE: this path shuffles from a PRNGKey while the host loop
        # below shuffles from the numpy rng — same-seed runs on CPU vs
        # TPU see different batch orders (each backend is individually
        # deterministic; see train/embed_loop.train_skipgram docstring).
        a_dev = jnp.asarray(a)
        bs = cfg.batch_size

        @jax.jit
        def epoch_fn(params, opt_state, key, a_in):
            # a passed as a jit argument (closure constants bloat the
            # remote-compile request body)
            perm = jax.random.permutation(key, n)[: nb * bs]
            sels = perm.reshape(nb, bs)

            def body(carry, sel):
                p, o = carry
                p, o, loss = step(p, o, a_in[sel],
                                  a_in[sel[:, None], sel[None, :]])
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), sels)
            return params, opt_state, losses.mean()

        key = jax.random.PRNGKey(cfg.seed ^ 0x50E)
        for epoch in range(1, cfg.epochs + 1):
            key, sub = jax.random.split(key)
            params, opt_state, mean_loss = epoch_fn(params, opt_state,
                                                    sub, a_dev)
            history.append((epoch, float(mean_loss)))
    else:
        idx = np.arange(n)
        for epoch in range(1, cfg.epochs + 1):
            rng.shuffle(idx)
            tot, k = 0.0, 0
            for i in range(0, n - cfg.batch_size + 1, cfg.batch_size):
                sel = idx[i:i + cfg.batch_size]
                rows = jnp.asarray(a[sel])
                sub_a = jnp.asarray(a[np.ix_(sel, sel)])
                params, opt_state, loss = step(params, opt_state, rows,
                                               sub_a)
                tot += float(loss)
                k += 1
            history.append((epoch, tot / max(k, 1)))

    import jax.numpy as jnp2
    y, _ = model.apply({"params": params}, jnp2.asarray(a))
    return np.asarray(y), history


def run_metapath2vec(hetero=None, metapath=None, type_offsets=None,
                     cfg: Optional[WalkEmbedConfig] = None,
                     typed_negatives: bool = True):
    """MetaPath2Vec (MetaPath2Vec/run.py:29-35): metapath-constrained walks
    (U-I-U-I-U default), window=4, neg=4, dim=128, batch=512, lr=0.4 —
    run.py:12-25. ``type_offsets`` maps per-type local ids into one global
    id space; typed negatives redraw within the context's node type
    (get_negative_ultra, utils/data_utils.py:73-93)."""
    from ..sampling.walks import metapath_walks

    cfg = cfg or WalkEmbedConfig(window=4, num_negatives=4,
                                 batch_size=512, lr=0.4)
    if hetero is None:
        from ..data.edgelist import synthetic_multiplex

        # default synthetic user–item bipartite
        from ..core.hetero import HeteroGraph
        rng0 = np.random.default_rng(cfg.seed)
        nu, ni = 200, 150
        u = rng0.integers(0, nu, 2000)
        i = rng0.integers(0, ni, 2000)
        hetero = HeteroGraph({"u": nu, "i": ni})
        hetero.add_relation(("u", "ui", "i"), u, i)
        hetero.add_relation(("i", "iu", "u"), i, u)
        metapath = [("u", "ui", "i"), ("i", "iu", "u")]
        type_offsets = {"u": 0, "i": nu}

    rng = np.random.default_rng(cfg.seed)
    start_type = metapath[0][0]
    n_start = hetero.node_counts[start_type]
    starts = np.tile(np.arange(n_start), cfg.num_walks)
    if cfg.device_walks:
        import jax
        import jax.numpy as jnp
        from ..sampling.device_walks import (build_metapath_tables,
                                             device_metapath_walks)
        legs = build_metapath_tables(hetero, metapath)
        walks_local = np.asarray(jax.jit(
            device_metapath_walks, static_argnames=("length",))(
                jax.random.PRNGKey(cfg.seed), jnp.asarray(starts),
                cfg.walk_length, legs))
    else:
        walks_local = metapath_walks(hetero, metapath, starts,
                                     cfg.walk_length, rng)
    # map to global ids: position t has type metapath[(t-1) % L].dst (t>0)
    L = len(metapath)
    types = [start_type] + [metapath[(t - 1) % L][2]
                            for t in range(1, cfg.walk_length)]
    offs = np.array([type_offsets[t] for t in types], np.int64)
    walks = walks_local.astype(np.int64) + offs[None, :]
    n_total = sum(hetero.node_counts[t] for t in type_offsets)

    token_types = None
    if typed_negatives and len(type_offsets) == 2:
        # 'ultra' mode: alternate user/item negatives per pair
        # (get_negative_ultra, MetaPath2Vec/utils/data_utils.py:73-93).
        # Global ids are laid out per type by type_offsets, so type = 1 for
        # ids at/after the second type's offset.
        second_off = sorted(type_offsets.values())[1]
        token_types = (np.arange(n_total) >= second_off).astype(np.int64)
    arrays = skipgram_dataset(
        walks, n_total, window=cfg.window,
        num_negatives=cfg.num_negatives, rng=rng,
        token_types=token_types)
    model = SkipGram(vocab_size=n_total, embed_dim=cfg.embed_dim)
    params, history = train_skipgram(
        model, arrays, epochs=cfg.epochs, batch_size=cfg.batch_size,
        optimizer=optax.adam(min(cfg.lr, 0.05)), seed=cfg.seed)
    return get_embedding(params, "center"), history
