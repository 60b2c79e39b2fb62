import jax.numpy as jnp
import numpy as np
import pytest

from graphneuralnetwork_tpu.utils import (
    MetricLogger,
    StepTimer,
    assert_all_finite,
    find_nonfinite,
    nan_checked,
)


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": jnp.array([1.0, np.nan])}, "bad")


def test_find_nonfinite_paths():
    bad = find_nonfinite({"x": jnp.array([np.inf]), "y": jnp.ones(2)})
    assert len(bad) == 1 and "x" in bad[0]


def test_nan_checked_flags(monkeypatch):
    import jax

    def f(x):
        return jnp.log(x)

    wrapped = nan_checked(f)
    # flag off: no error even for nan-producing input
    monkeypatch.setenv("GNN_TPU_DEBUG_NANS", "0")
    _ = wrapped(jnp.array([-1.0]))
    # flag on: raises
    monkeypatch.setenv("GNN_TPU_DEBUG_NANS", "1")
    with pytest.raises(Exception):
        wrapped(jnp.array([-1.0]))


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            pass
    assert len(t.times) == 2
    assert t.steps_per_s() > 0


def test_metric_logger_smoothing(capsys):
    ml = MetricLogger(window=2, print_freq=2)
    ml.update(loss=1.0)
    ml.update(loss=3.0)
    assert ml.smoothed("loss") == 2.0
    ml.log(total_steps=4)
    out = capsys.readouterr().out
    assert "loss" in out and "eta" in out


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax
    from graphneuralnetwork_tpu.train import TrainState
    from graphneuralnetwork_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint)

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    tx = optax.adam(1e-2)
    state = TrainState.create(apply_fn=lambda *a: None, params=params,
                              tx=tx, dropout_rng=jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), state, step=7, backend="orbax")

    blank = TrainState.create(
        apply_fn=lambda *a: None,
        params={"w": jnp.zeros((2, 3))}, tx=tx,
        dropout_rng=jax.random.PRNGKey(0))
    restored, step = restore_checkpoint(str(tmp_path), blank)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(params["w"]))
