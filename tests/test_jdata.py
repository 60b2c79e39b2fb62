"""JData ETL + loader (MetaPath2Vec/utils/data_procession.py:41-87,
generate_meta_paths_utils.py:8-19)."""

import os

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from graphneuralnetwork_tpu.data.jdata import (  # noqa: E402
    convert_age,
    load_jdata,
    process_jdata,
)


def _write_raw(tmp_path, rng):
    n_users, n_items = 30, 20
    users = pd.DataFrame({
        "user_id": np.arange(n_users),
        "age": rng.choice(["-1", "15岁以下", "16-25岁", "26-35岁",
                           "36-45岁", "46-55岁", "56岁以上"], n_users),
        "sex": rng.integers(0, 3, n_users),
        "user_lv_cd": rng.integers(1, 6, n_users),
    })
    items = pd.DataFrame({
        "sku_id": np.arange(n_items),
        "a1": rng.integers(-1, 4, n_items),
        "a2": rng.integers(-1, 3, n_items),
        "a3": rng.integers(-1, 3, n_items),
        "cate": rng.integers(4, 9, n_items),
        "brand": rng.integers(0, 6, n_items),
    })
    n_act = 300
    actions = pd.DataFrame({
        "user_id": rng.integers(0, n_users, n_act),
        "sku_id": rng.integers(0, n_items, n_act),
        "time": "2016-02-01 00:00:00",
        "model_id": np.nan,
        "type": rng.choice([1, 2, 6, 6], n_act),
        "cate": rng.integers(4, 9, n_act),
        "brand": rng.integers(0, 6, n_act),
    })
    users.to_csv(tmp_path / "JData_User.csv", index=False, encoding="gbk")
    items.to_csv(tmp_path / "JData_Product.csv", index=False,
                 encoding="gbk")
    actions.to_csv(tmp_path / "JData_Action_201602.csv", index=False,
                   encoding="gbk")
    return actions


def test_age_buckets():
    assert convert_age("-1") == 0
    assert convert_age("15岁以下") == 1
    assert convert_age("56岁以上") == 6
    assert convert_age("bogus") == -1


def test_process_then_load(tmp_path, rng):
    raw = _write_raw(tmp_path, rng)
    node_features, action = process_jdata(str(tmp_path))

    # only type-6 actions, deduplicated, prefixed ids
    expect = raw[raw["type"] == 6][["user_id", "sku_id"]].drop_duplicates()
    assert len(action) == len(expect)
    assert action["user_id"].str.startswith("u_").all()
    assert action["sku_id"].str.startswith("i_").all()
    # node feature table covers exactly the active users+items
    assert set(node_features["node_id"]) == (
        set(action["user_id"]) | set(action["sku_id"]))
    for f in ("user_features.csv", "item_features.csv",
              "node_features.csv", "data_action.csv"):
        assert os.path.exists(tmp_path / f)

    jd = load_jdata(str(tmp_path), seed=0)
    assert jd.hetero.node_counts["user"] == action["user_id"].nunique()
    assert jd.hetero.node_counts["item"] == action["sku_id"].nunique()
    assert jd.type_offsets["item"] == len(jd.idx_to_users)
    assert jd.user_features is not None

    # the loaded graph drives metapath2vec end-to-end
    from graphneuralnetwork_tpu.models import (
        WalkEmbedConfig, run_metapath2vec)
    cfg = WalkEmbedConfig(window=2, num_negatives=2, batch_size=64,
                          embed_dim=16, num_walks=2, walk_length=5,
                          epochs=1, seed=0)
    emb, history = run_metapath2vec(hetero=jd.hetero, metapath=jd.metapath,
                                    type_offsets=jd.type_offsets, cfg=cfg)
    n_total = len(jd.idx_to_users) + len(jd.idx_to_items)
    assert emb.shape[0] == n_total
    assert np.isfinite(history[-1][1])


def test_load_jdata_synthetic_fallback():
    jd = load_jdata(None, seed=1)
    assert jd.hetero.node_counts["user"] > 0
    assert jd.metapath[0][0] == "user"
