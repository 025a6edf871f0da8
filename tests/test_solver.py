"""Scheduler/optimizer factory tests.

The reference registers 8 scheduler types (easyhec/solver/build.py:32-81) but
ships no tests for any of them (SURVEY.md §4); these pin the semantics.
"""
import numpy as np
import optax
import pytest

from easyhec_tpu.solver import make_optimizer, make_schedule


def _vals(sched, steps):
    return np.asarray([float(sched(s)) for s in steps])


def test_constant():
    s = make_schedule("constant", 3e-3, 1000)
    assert np.allclose(_vals(s, [0, 500, 999]), 3e-3)


def test_warmup_multistep():
    s = make_schedule(
        "warmup_multistep", 1.0, 100, warmup_steps=10, gamma=0.1,
        milestones=(30, 60), warmup_factor=1 / 3, warmup_method="linear",
    )
    assert float(s(0)) == pytest.approx(1 / 3)
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(31)) == pytest.approx(0.1)
    assert float(s(61)) == pytest.approx(0.01)


def test_warmup_constant_method():
    s = make_schedule(
        "warmup_multistep", 1.0, 100, warmup_steps=5, milestones=(50,),
        warmup_factor=0.5, warmup_method="constant",
    )
    assert float(s(2)) == pytest.approx(0.5)
    assert float(s(6)) == pytest.approx(1.0)


def test_exponential_continuous():
    s = make_schedule("exponential", 1.0, 1000, gamma=0.1, decay_steps=100)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(100)) == pytest.approx(0.1)
    assert float(s(200)) == pytest.approx(0.01, rel=1e-4)


def test_exponential_step():
    s = make_schedule("exponential_step", 2.0, 100, min_factor=0.1)
    assert float(s(0)) == pytest.approx(2.0)
    assert float(s(100)) == pytest.approx(0.2, rel=1e-5)
    assert float(s(1000)) == pytest.approx(0.2, rel=1e-5)  # clipped at t=1


def test_cosine_and_onecycle_endpoints():
    c = make_schedule("cosine", 1.0, 100)
    assert float(c(0)) == pytest.approx(1.0)
    assert float(c(100)) == pytest.approx(0.0, abs=1e-6)
    oc = make_schedule("onecycle", 1.0, 100)
    peak = max(_vals(oc, range(0, 101, 5)))
    assert peak == pytest.approx(1.0, rel=1e-2)


def test_warmup_cosine():
    s = make_schedule("warmup_cosine", 1.0, 100, warmup_steps=10, warmup_factor=0.001)
    assert float(s(0)) == pytest.approx(0.001, rel=1e-3)
    assert float(s(10)) == pytest.approx(1.0, rel=1e-3)
    assert float(s(99)) < 0.01


def test_optimizer_steps_params():
    import jax.numpy as jnp

    opt = make_optimizer("adam", 1e-2, 100, "constant", grad_clip=1.0)
    p = jnp.asarray([1.0, 2.0])
    state = opt.init(p)
    g = jnp.asarray([10.0, 10.0])  # will be clipped
    upd, state = opt.update(g, state, p)
    assert np.all(np.isfinite(np.asarray(upd)))


def test_bias_lr_groups():
    import jax.numpy as jnp

    params = {"w": jnp.ones(3), "bias": jnp.ones(3)}
    opt = make_optimizer(
        "sgd", 1.0, 10, "constant", bias_lr_factor=2.0, momentum=0.0
    )
    state = opt.init(params)
    g = {"w": jnp.ones(3), "bias": jnp.ones(3)}
    upd, _ = opt.update(g, state, params)
    ratio = float(upd["bias"][0] / upd["w"][0])
    assert ratio == pytest.approx(2.0)
