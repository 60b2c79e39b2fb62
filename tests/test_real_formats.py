"""Real-file-format fixtures: every loader's *real* parser code path.

Each helper writes a tiny fixture in the exact on-disk format the
reference consumes (.content/.cites, NCBI Pubmed .tab, ACM .mat, GTN
train.pkl, GATNE multiplex txt dir, JData CSVs), then the test loads it
through the same code path a user pointing at the real download would
hit — closing the gap where the synthetic fallbacks kept the real
parsers untested.
"""

import os
import pickle

import numpy as np
import pytest

# ---------------------------------------------------------------- cora


def write_cora_fixture(root, n=60, f=16, c=3, seed=0):
    """.content rows '<id> <feat...> <label>'; .cites rows '<a> <b>'
    (GCN/data_utils.py:14-18). String ids + a dangling citation."""
    rng = np.random.default_rng(seed)
    ids = [f"paper{1000 + i}" for i in range(n)]
    labels = rng.integers(0, c, n)
    label_names = [f"class_{x}" for x in labels]
    feats = (rng.random((n, f)) < 0.3).astype(int)
    with open(os.path.join(root, "cora.content"), "w") as fh:
        for i in range(n):
            row = [ids[i], *map(str, feats[i]), label_names[i]]
            fh.write("\t".join(row) + "\n")
    edges = [(ids[int(a)], ids[int(b)])
             for a, b in rng.integers(0, n, (3 * n, 2)) if a != b]
    with open(os.path.join(root, "cora.cites"), "w") as fh:
        for a, b in edges:
            fh.write(f"{a}\t{b}\n")
        fh.write("paper99999\tpaper1000\n")   # id not in .content: dropped
    return ids, labels, feats, edges


def test_cora_content_cites_roundtrip(tmp_path):
    from graphneuralnetwork_tpu.data.planetoid import _read_content_cites

    ids, labels, feats, edges = write_cora_fixture(str(tmp_path))
    rf, rl, s, r = _read_content_cites(str(tmp_path), "cora")
    assert rf.shape == feats.shape
    np.testing.assert_allclose(rf, feats.astype(np.float32))
    # labels mapped by sorted class-name order
    classes = sorted({f"class_{x}" for x in labels})
    expect = np.array([classes.index(f"class_{x}") for x in labels])
    np.testing.assert_array_equal(rl, expect)
    # dangling citation dropped, all others kept in file order
    assert len(s) == len(edges)
    id_map = {j: i for i, j in enumerate(ids)}
    np.testing.assert_array_equal(s, [id_map[a] for a, _ in edges])
    np.testing.assert_array_equal(r, [id_map[b] for _, b in edges])


def test_load_cora_real_files(tmp_path):
    """The public load_cora() must take the real-file branch and produce a
    normalized graph, not the synthetic fallback."""
    from graphneuralnetwork_tpu.data import load_cora

    write_cora_fixture(str(tmp_path), n=60)
    data = load_cora(root=str(tmp_path))
    assert data.features.shape[0] == 60
    assert data.num_classes == 3
    # row-normalised features sum to 1 (or 0 for empty rows)
    rows = np.asarray(data.features).sum(1)
    assert np.all((np.abs(rows - 1) < 1e-5) | (rows == 0))


# -------------------------------------------------------------- pubmed


def write_pubmed_fixture(root, n=30, seed=0):
    """NCBI Pubmed-Diabetes tab format (GraphSAGE_Pytorch/
    data_utils.py:9-42): NODE header declares numeric:w-* fields; rows are
    'pid <tab> label=k <tab> w-x=v ... <tab> summary=...'; DIRECTED.cites
    rows are 'eid <tab> paper:a <tab> | <tab> paper:b'."""
    rng = np.random.default_rng(seed)
    words = [f"w-kw{j}" for j in range(5)]
    pids = [str(10000 + i) for i in range(n)]
    labels = rng.integers(1, 4, n)          # file labels are 1-based
    with open(os.path.join(root, "Pubmed-Diabetes.NODE.paper.tab"),
              "w") as fh:
        fh.write("DIRECTED GRAPH -- pubmed diabetes nodes\n")
        header = ["paper_id", "label:cat=1,2,3"]
        header += [f"numeric:{w}:0.0" for w in words]
        header += ["summary:string="]
        fh.write("\t".join(header) + "\n")
        for i in range(n):
            toks = [pids[i], f"label={labels[i]}"]
            nz = rng.choice(5, size=2, replace=False)
            for j in sorted(nz):
                toks.append(f"{words[j]}={rng.random():.3f}")
            toks.append(f"summary={pids[i]} text")
            fh.write("\t".join(toks) + "\n")
    edges = [(pids[int(a)], pids[int(b)])
             for a, b in rng.integers(0, n, (2 * n, 2)) if a != b]
    with open(os.path.join(root, "Pubmed-Diabetes.DIRECTED.cites.tab"),
              "w") as fh:
        fh.write("DIRECTED GRAPH -- citations\n")
        fh.write("NO_FEATURES\n")
        for k, (a, b) in enumerate(edges):
            fh.write(f"{k}\tpaper:{a}\t|\tpaper:{b}\n")
    return pids, labels, edges


def test_pubmed_tab_roundtrip(tmp_path):
    from graphneuralnetwork_tpu.data.pubmed import _parse_pubmed_tab

    pids, labels, edges = write_pubmed_fixture(str(tmp_path))
    feats, rl, s, r = _parse_pubmed_tab(str(tmp_path))
    assert feats.shape == (30, 5)           # only numeric:w-* fields
    np.testing.assert_array_equal(rl, labels - 1)   # 0-based
    assert len(s) == len(edges)
    assert feats.max() > 0                  # values parsed, not all-zero


def test_load_pubmed_real_files(tmp_path):
    from graphneuralnetwork_tpu.data.pubmed import load_pubmed

    write_pubmed_fixture(str(tmp_path))
    data = load_pubmed(root=str(tmp_path))
    assert data.features.shape == (30, 5)
    assert data.num_classes == 3
    # loader symmetrises the directed citations
    assert len(data.senders) == 2 * 58 or len(data.senders) % 2 == 0


# ------------------------------------------------------------- ACM.mat


def write_acm_mat(path, n_papers=40, n_authors=15, n_subjects=6,
                  n_terms=20, seed=0):
    """ACM.mat with the PvsL/PvsA/PvsT/PvsC sparse matrices HAN reads
    (HAN/utils/data_utils.py:13-42). 14 conference columns so the
    conf_ids [0,1,9,10,13] filter applies."""
    from scipy import io as sio
    from scipy import sparse as sp

    rng = np.random.default_rng(seed)
    conf_ids = [0, 1, 9, 10, 13]
    conf = np.array([conf_ids[i % 5] for i in range(n_papers)])
    pvsc = sp.csr_matrix(
        (np.ones(n_papers), (np.arange(n_papers), conf)),
        shape=(n_papers, 14))
    pa = sp.random(n_papers, n_authors, density=0.15, random_state=1,
                   format="csr", data_rvs=lambda k: np.ones(k))
    pl = sp.csr_matrix(
        (np.ones(n_papers),
         (np.arange(n_papers), rng.integers(0, n_subjects, n_papers))),
        shape=(n_papers, n_subjects))
    pt = sp.random(n_papers, n_terms, density=0.3, random_state=2,
                   format="csr", data_rvs=lambda k: np.ones(k))
    sio.savemat(path, {"PvsL": pl, "PvsA": pa, "PvsT": pt, "PvsC": pvsc})
    return conf


def test_acm_mat_han_loader(tmp_path):
    from graphneuralnetwork_tpu.data.acm import _load_acm_mat, load_acm_han

    mat = str(tmp_path / "ACM.mat")
    conf = write_acm_mat(mat)
    hg, feats, labels = _load_acm_mat(mat)
    assert feats.shape == (40, 20)
    # conference -> label map [0,1,9,10,13] -> [0,1,2,2,1]
    lmap = {0: 0, 1: 1, 9: 2, 10: 2, 13: 1}
    np.testing.assert_array_equal(labels, [lmap[c] for c in conf])
    data = load_acm_han(path=mat)
    assert len(data.graphs) == 2            # PAP + PLP
    assert data.features.shape[0] == 40


def test_acm_mat_gtn_loader(tmp_path):
    from graphneuralnetwork_tpu.data.acm import load_acm_gtn

    mat = str(tmp_path / "ACM.mat")
    write_acm_mat(mat)
    data = load_acm_gtn(path=mat, per_class_train=5, per_class_val=3)
    n = 40 + 15 + 6
    assert data.adj.shape == (5, n, n)      # PA/AP/PL/LP + identity
    np.testing.assert_allclose(np.asarray(data.adj[-1]), np.eye(n))


def test_gtn_train_pkl_loader(tmp_path):
    """The reference's processed train.pkl tuple
    (GTN/utils/data_utils.py:130-139)."""
    from scipy import sparse as sp

    from graphneuralnetwork_tpu.data.acm import load_acm_gtn

    rng = np.random.default_rng(0)
    n = 30
    edges = [sp.random(n, n, density=0.2, random_state=i, format="csr")
             for i in range(4)]
    labels = rng.integers(0, 3, n)
    feats = rng.random((n, 8)).astype(np.float32)
    pkl = str(tmp_path / "train.pkl")
    with open(pkl, "wb") as f:
        pickle.dump((np.arange(n), labels, edges, feats), f)
    data = load_acm_gtn(path=pkl, per_class_train=4, per_class_val=2)
    assert data.adj.shape == (5, n, n)      # 4 types + identity
    assert data.num_classes == 3
    assert len(data.train_idx) + len(data.val_idx) + len(data.test_idx) == n


# ---------------------------------------------------- GATNE multiplex


def write_multiplex_dir(root, seed=0):
    """GATNE amazon layout (GATNE/utils/data_utils.py:11-51): train.txt
    '<type> <src> <dst>'; valid/test '<type> <src> <dst> <label>'."""
    rng = np.random.default_rng(seed)
    nodes = [f"n{i}" for i in range(30)]
    for fname, with_label in (("train.txt", False), ("valid.txt", True),
                              ("test.txt", True)):
        with open(os.path.join(root, fname), "w") as fh:
            for t in ("1", "2"):
                for _ in range(40 if fname == "train.txt" else 10):
                    a, b = rng.choice(30, 2, replace=False)
                    line = f"{t} {nodes[a]} {nodes[b]}"
                    if with_label:
                        line += f" {int(rng.random() < 0.5)}"
                    fh.write(line + "\n")


def test_multiplex_dir_loader(tmp_path):
    from graphneuralnetwork_tpu.data.edgelist import load_multiplex

    write_multiplex_dir(str(tmp_path))
    data = load_multiplex(root=str(tmp_path))
    assert data.edge_types == ["1", "2"]
    assert data.n_nodes <= 31               # 30 names + <UNK> slot
    for t in data.edge_types:
        s, r = data.train_edges[t]
        assert len(s) == 40 and s.max() < data.n_nodes
        vt, vf = data.valid_true[t], data.valid_false[t]
        assert len(vt[0]) + len(vf[0]) == 10
    # ids round-trip through the vocab
    assert data.vocab is not None
    assert all(tok.startswith("n") for tok in data.vocab.idx_to_token[1:])


@pytest.mark.heavy
def test_multiplex_gatne_trains_on_real_files(tmp_path):
    """End-to-end: the real-file multiplex graph feeds train_gatne."""
    from graphneuralnetwork_tpu.data.edgelist import load_multiplex
    from graphneuralnetwork_tpu.models.gatne import (GATNEConfig,
                                                     train_gatne)

    write_multiplex_dir(str(tmp_path))
    data = load_multiplex(root=str(tmp_path))
    cfg = GATNEConfig(embed_dim=8, edge_embed_dim=4, attn_dim=4,
                      num_walks=2, walk_length=5, epochs=1,
                      batch_size=64, neighbor_samples=3)
    _, history, metrics = train_gatne(data, cfg)
    assert np.isfinite(history[-1][1])


# --------------------------------------------------------- JData CSVs


def write_jdata_csvs(root, seed=0):
    """Raw JData CSVs with the reference's schema
    (MetaPath2Vec/utils/data_procession.py:41-87), gbk-encoded with the
    labelled Chinese age buckets."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    n_users, n_items, n_act = 20, 15, 120
    ages = ["15岁以下", "16-25岁", "26-35岁", "36-45岁", "46-55岁",
            "56岁以上", "-1"]
    user = pd.DataFrame({
        "user_id": np.arange(1, n_users + 1),
        "age": [ages[i % len(ages)] for i in range(n_users)],
        "sex": rng.integers(0, 3, n_users),
        "user_lv_cd": rng.integers(1, 6, n_users),
        "user_reg_tm": "2016-01-01",
    })
    item = pd.DataFrame({
        "sku_id": np.arange(1, n_items + 1),
        "a1": rng.integers(-1, 4, n_items),
        "a2": rng.integers(-1, 3, n_items),
        "a3": rng.integers(-1, 3, n_items),
        "cate": 8,
        "brand": rng.integers(1, 5, n_items),
    })
    action = pd.DataFrame({
        "user_id": rng.integers(1, n_users + 1, n_act).astype(float),
        "sku_id": rng.integers(1, n_items + 1, n_act),
        "time": "2016-02-01 10:00:00",
        "model_id": np.nan,
        "type": rng.choice([1, 2, 6], n_act, p=[0.3, 0.3, 0.4]),
        "cate": 8,
        "brand": 1,
    })
    user.to_csv(os.path.join(root, "JData_User.csv"), index=False,
                encoding="gbk")
    item.to_csv(os.path.join(root, "JData_Product.csv"), index=False,
                encoding="gbk")
    action.to_csv(os.path.join(root, "JData_Action_201602.csv"),
                  index=False, encoding="gbk")
    return action


def test_jdata_process_and_load(tmp_path):
    import pandas as pd

    from graphneuralnetwork_tpu.data.jdata import load_jdata, process_jdata

    raw = write_jdata_csvs(str(tmp_path))
    node_features, action = process_jdata(str(tmp_path))
    # only type-6 actions survive, deduped, with u_/i_ prefixes
    n6 = raw[raw["type"] == 6][["user_id", "sku_id"]].drop_duplicates()
    assert len(action) == len(n6)
    assert action["user_id"].str.startswith("u_").all()
    assert action["sku_id"].str.startswith("i_").all()
    # age buckets one-hot encoded (no raw strings remain)
    assert not any("岁" in c for c in node_features.columns)

    jd = load_jdata(str(tmp_path))
    assert jd.hetero.node_counts["user"] == action["user_id"].nunique()
    assert jd.hetero.node_counts["item"] == action["sku_id"].nunique()
    assert jd.metapath[0] == ("user", "ui", "item")
    # metapath2vec trains on it
    from graphneuralnetwork_tpu.models import (WalkEmbedConfig,
                                               run_metapath2vec)
    cfg = WalkEmbedConfig(embed_dim=8, num_walks=2, walk_length=6,
                          epochs=1, batch_size=64, window=2,
                          num_negatives=2)
    emb, history = run_metapath2vec(
        hetero=jd.hetero, metapath=jd.metapath,
        type_offsets=jd.type_offsets, cfg=cfg)
    assert emb.shape[1] == 8


# ------------------------------------------------------ edgelist file


def test_edgelist_string_and_numeric_paths(tmp_path):
    """String files take the Python vocab path; numeric files take the
    native C++ fast path — ids must agree with the Vocab ordering."""
    from graphneuralnetwork_tpu.data.edgelist import read_edgelist

    p1 = str(tmp_path / "wiki.txt")
    with open(p1, "w") as f:
        f.write("alice bob\nbob carol\nalice carol\nbob alice\n")
    d = read_edgelist(p1)
    assert d.n_nodes == 4                   # <UNK> + 3 names
    assert len(d.senders) == 8              # symmetrised

    p2 = str(tmp_path / "flight.txt")
    with open(p2, "w") as f:
        f.write("1 2 3.5\n2 3 1.0\n1 3 2.0\n")
    d2 = read_edgelist(p2, weighted=True)
    assert d2.n_nodes == 4
    assert set(np.round(d2.weights, 1)) == {3.5, 1.0, 2.0}
