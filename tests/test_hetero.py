import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphneuralnetwork_tpu.core.hetero import (
    BipartiteGraph,
    HeteroGraph,
    Vocab,
)
from graphneuralnetwork_tpu.data import load_acm_gtn, load_acm_han
from graphneuralnetwork_tpu.nn import GTN, HAN


def test_vocab_min_freq_and_unk():
    v = Vocab([["a", "b", "a"], ["a", "c"]], min_freq=2)
    assert v["a"] != v.unk
    assert v["c"] == v.unk  # below min_freq
    assert v["zzz"] == v.unk
    assert v.to_tokens(v["a"]) == "a"
    assert len(v) == 2  # <UNK> + 'a'


def test_metapath_compose_matches_dense():
    """compose == boolean A@B (MetaPath2Vec/utils/graph_utils.py:114-139)."""
    rng = np.random.default_rng(3)
    n_p, n_a = 20, 15
    pa_s = rng.integers(0, n_p, 40)
    pa_d = rng.integers(0, n_a, 40)
    hg = HeteroGraph({"p": n_p, "a": n_a})
    hg.add_relation(("p", "pa", "a"), pa_s, pa_d)
    hg.add_relation(("a", "ap", "p"), pa_d, pa_s)

    s, d, w = hg.compose([("p", "pa", "a"), ("a", "ap", "p")],
                         binarize=True)
    a = np.zeros((n_p, n_a))
    a[pa_s, pa_d] = 1.0
    ref = (a @ a.T > 0).astype(np.float32)
    got = np.zeros((n_p, n_p))
    got[s, d] = w
    np.testing.assert_allclose(got, ref)


def test_metapath_compose_weights_count_paths():
    hg = HeteroGraph({"p": 2, "a": 2})
    # p0 -> a0, p0 -> a1, p1 -> a0 ; a_i -> p_j reverse
    hg.add_relation(("p", "pa", "a"), [0, 0, 1], [0, 1, 0])
    hg.add_relation(("a", "ap", "p"), [0, 1, 0], [0, 0, 1])
    s, d, w = hg.compose([("p", "pa", "a"), ("a", "ap", "p")],
                         binarize=False)
    got = np.zeros((2, 2))
    got[s, d] = w
    # p0-p0: via a0 and a1 = 2 paths; p0-p1: via a0 = 1; p1-p1: via a0 = 1
    np.testing.assert_allclose(got, [[2, 1], [1, 1]])


def test_bipartite_projection_removes_diagonal():
    bg = BipartiteGraph(3, 2, np.array([0, 1, 2]), np.array([0, 0, 1]))
    g = bg.homogeneous_projection("u")
    s = np.asarray(g.senders)[: g.n_edges]
    d = np.asarray(g.receivers)[: g.n_edges]
    assert (s != d).all()
    pairs = set(zip(s.tolist(), d.tolist()))
    assert (0, 1) in pairs and (1, 0) in pairs  # share item 0
    assert (0, 2) not in pairs


@pytest.mark.heavy
def test_han_learns_synthetic_acm():
    data = load_acm_han(seed=0)
    model = HAN(num_metapaths=len(data.graphs),
                num_classes=data.num_classes, hidden=8, num_heads=(4,))
    params = model.init(jax.random.PRNGKey(0), data.graphs,
                        data.features)["params"]
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply({"params": p}, data.graphs, data.features)
            sel = logits[data.train_idx]
            ls = -jax.nn.log_softmax(sel)[
                jnp.arange(sel.shape[0]), data.labels[data.train_idx]]
            return ls.mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(60):
        params, opt, loss = step(params, opt)
    logits = model.apply({"params": params}, data.graphs, data.features)
    pred = jnp.argmax(logits[data.test_idx], -1)
    acc = float((pred == data.labels[data.test_idx]).mean())
    assert acc > 0.5, acc  # 3 classes, chance=0.33


@pytest.mark.heavy
def test_gtn_learns_synthetic_acm():
    data = load_acm_gtn(seed=0, per_class_train=60, per_class_val=30)
    model = GTN(num_classes=data.num_classes, channels=2, num_layers=2,
                hidden=32)
    # GTN logits are per-paper: select target nodes then split indices
    tgt = data.target_idx
    params = model.init(jax.random.PRNGKey(0), data.adj,
                        data.features)["params"]
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply({"params": p}, data.adj, data.features)
            sel = logits[tgt][data.train_idx]
            ls = -jax.nn.log_softmax(sel)[
                jnp.arange(sel.shape[0]), data.labels[data.train_idx]]
            return ls.mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(80):
        params, opt, loss = step(params, opt)
    logits = model.apply({"params": params}, data.adj, data.features)
    pred = jnp.argmax(logits[tgt][data.test_idx], -1)
    acc = float((pred == data.labels[data.test_idx]).mean())
    assert acc > 0.5, acc


def test_gtn_return_weights():
    data = load_acm_gtn(seed=0, per_class_train=10, per_class_val=5)
    model = GTN(num_classes=data.num_classes, channels=2, num_layers=2,
                hidden=16)
    variables = model.init(jax.random.PRNGKey(0), data.adj, data.features)
    logits, h = model.apply(variables, data.adj, data.features,
                            return_weights=True)
    n = data.features.shape[0]
    assert h.shape == (2, n, n)

def test_gtn_han_mixed_precision_close():
    """bf16 compute in GTN (dense MXU chains) and HAN stays close to f32."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graphneuralnetwork_tpu.data import load_acm_gtn, load_acm_han
    from graphneuralnetwork_tpu.nn import GTN, HAN

    d = load_acm_gtn(seed=0)
    m32 = GTN(num_classes=d.num_classes, channels=2, num_layers=2, hidden=16)
    mbf = GTN(num_classes=d.num_classes, channels=2, num_layers=2, hidden=16,
              dtype=jnp.bfloat16)
    p = m32.init(jax.random.PRNGKey(0), d.adj, d.features)["params"]
    y32 = np.asarray(m32.apply({"params": p}, d.adj, d.features))
    ybf = np.asarray(mbf.apply({"params": p}, d.adj, d.features))
    assert ybf.dtype == np.float32
    rel = np.abs(ybf - y32) / np.maximum(np.abs(y32), 1e-2)
    assert np.median(rel) < 0.06, float(np.median(rel))

    dh = load_acm_han(seed=0)
    h32 = HAN(num_metapaths=len(dh.graphs), num_classes=dh.num_classes,
              hidden=8, num_heads=(4,))
    hbf = HAN(num_metapaths=len(dh.graphs), num_classes=dh.num_classes,
              hidden=8, num_heads=(4,), dtype=jnp.bfloat16)
    ph = h32.init(jax.random.PRNGKey(0), dh.graphs, dh.features)["params"]
    z32 = np.asarray(h32.apply({"params": ph}, dh.graphs, dh.features))
    zbf = np.asarray(hbf.apply({"params": ph}, dh.graphs, dh.features))
    rel = np.abs(zbf - z32) / np.maximum(np.abs(z32), 1e-2)
    assert np.median(rel) < 0.06, float(np.median(rel))

def test_gtn_pickle_loader_roundtrip(tmp_path):
    """The reference's processed train.pkl format loads correctly
    (GTN/utils/data_utils.py:130-139)."""
    import pickle
    import numpy as np
    from scipy import sparse
    from graphneuralnetwork_tpu.data import load_acm_gtn
    rng = np.random.default_rng(0)
    n, n_papers = 40, 25
    edges = [sparse.csr_matrix(
        (rng.random((n, n)) < 0.1).astype(np.float32)) for _ in range(4)]
    target = rng.integers(0, 3, n_papers).astype(np.int64)
    feats = rng.random((n, 16)).astype(np.float32)
    p = tmp_path / "train.pkl"
    with open(p, "wb") as f:
        pickle.dump((np.arange(n_papers), target, edges, feats), f)
    d = load_acm_gtn(path=str(p), seed=0, per_class_train=3,
                     per_class_val=2)
    assert d.adj.shape == (5, n, n)          # 4 types + identity
    assert float(d.adj[-1].sum()) == n       # identity slice
    assert d.num_classes == 3
    assert len(d.labels) == n_papers


def test_named_dataset_presets():
    from graphneuralnetwork_tpu.data import (
        load_citeseer, load_imdb_gtn, load_imdb_han)
    d = load_citeseer(seed=0)
    assert d.features.shape == (3327, 3703) and d.num_classes == 6
    h = load_imdb_han(seed=0)
    assert len(h.graphs) == 2 and h.num_classes == 3
    g = load_imdb_gtn(seed=0)
    assert g.adj.shape[0] == 5
