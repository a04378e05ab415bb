"""Clos-routed planned permutation (ops/permute_clos.py +
kernels/permute_pallas.py) vs the direct gather oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

from sparsematrix_tpu.ops.permute_clos import (apply_clos_permutation,
                                               plan_clos_permutation)


@pytest.fixture
def rng():
    return np.random.default_rng(3)


@pytest.mark.parametrize("n", [8192, 100_000, 513 * 1024])
def test_clos_full_permutation(rng, n):
    g = rng.permutation(n)
    plan = plan_clos_permutation(g, n_src=n)
    assert plan is not None
    x = rng.uniform(-10, 10, n).astype(np.float32)
    got = np.asarray(apply_clos_permutation(plan, jnp.asarray(x),
                                            interpret=True))
    np.testing.assert_array_equal(got, x[g])


@pytest.mark.parametrize("n,q", [(1_200_000, 2), (2_200_000, 3)])
def test_clos_two_level(rng, n, q):
    # cap > 1M forces the q>1 (5-stage) decomposition; q=3 exercises the
    # arbitrary-q geometry (q need not be a power of two)
    g = rng.permutation(n)
    plan = plan_clos_permutation(g, n_src=n)
    assert plan is not None and plan.q == q
    x = rng.uniform(-10, 10, n).astype(np.float32)
    got = np.asarray(apply_clos_permutation(plan, jnp.asarray(x),
                                            interpret=True))
    np.testing.assert_array_equal(got, x[g])


def test_clos_sentinels_and_shapes(rng):
    # injective partial map with sentinel slots reading zero
    n_src, n_out = 50_000, 60_000
    g = np.full(n_out, n_src + 7, np.int64)
    live = rng.choice(n_out, size=40_000, replace=False)
    g[live] = rng.choice(n_src, size=40_000, replace=False)
    plan = plan_clos_permutation(g, n_src=n_src)
    x = rng.uniform(-10, 10, n_src).astype(np.float32)
    got = np.asarray(apply_clos_permutation(plan, jnp.asarray(x),
                                            interpret=True))
    want = np.zeros(n_out, np.float32)
    want[live] = x[g[live]]
    np.testing.assert_array_equal(got, want)


def test_clos_int_payload(rng):
    n = 20_000
    g = rng.permutation(n)
    plan = plan_clos_permutation(g, n_src=n)
    x = rng.integers(-2**30, 2**30, n).astype(np.int32)
    got = np.asarray(apply_clos_permutation(plan, jnp.asarray(x),
                                            interpret=True))
    np.testing.assert_array_equal(got, x[g])


def test_clos_python_colorer_matches(rng):
    """The numpy/python Euler-split fallback produces a valid coloring."""
    from sparsematrix_tpu.ops.permute_clos import _edge_color_py

    R, C = 16, 32
    p = rng.permutation(R * C)
    left = (p // C).astype(np.int64)
    right = np.arange(R * C) // C
    col = _edge_color_py(left, right, R, R, C)
    for v in range(R):
        assert sorted(col[left == v]) == list(range(C))
        assert sorted(col[right == v]) == list(range(C))


def test_clos_vjp(rng):
    """apply_clos_permutation is differentiable in x (inverse-gather
    cotangent); sentinel slots drop gradient."""
    import jax

    n_src, n_out = 30_000, 33_000
    g = np.full(n_out, n_src + 1, np.int64)
    live = rng.choice(n_out, size=25_000, replace=False)
    src = rng.choice(n_src, size=25_000, replace=False)
    g[live] = src
    plan = plan_clos_permutation(g, n_src=n_src)
    x = jnp.asarray(rng.uniform(-1, 1, n_src).astype(np.float32))
    w = jnp.asarray(rng.uniform(-1, 1, n_out).astype(np.float32))
    gx = jax.grad(lambda xx: (apply_clos_permutation(
        plan, xx, interpret=True) * w).sum())(x)
    want = np.zeros(n_src, np.float32)
    want[src] = np.asarray(w)[live]
    np.testing.assert_allclose(np.asarray(gx), want, rtol=1e-6)
