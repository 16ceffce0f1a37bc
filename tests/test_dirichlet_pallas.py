"""Pallas Dirichlet sampler (kernels/dirichlet_pallas.py): exact numpy
replica given the same uniform draws (interpret mode), plus shape/mask
invariants.  The on-hardware statistical acceptance (moments vs exact
Dirichlet at large and small alpha) runs in scripts/validate_fused_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instruct_tpu.kernels import dirichlet_pallas as dp


def np_replica(conc, valid, draws, rows_per_group, rounds=3):
    """The kernel's exact math in numpy, consuming `draws` in order."""
    it = iter(list(draws))

    def u01():
        return np.asarray(next(it), np.float32)

    def normal():
        u1, u2 = u01(), u01()
        return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)

    a0 = np.where(valid, conc, 1.0).astype(np.float32)
    a = a0 + (a0 < 1.0)
    d = a - 1.0 / 3.0
    c = 1.0 / np.sqrt(9.0 * d)
    g = np.zeros_like(a)
    acc = np.zeros(a.shape, bool)
    for _ in range(rounds):
        z = normal()
        u = u01()
        v = (1.0 + c * z) ** 3
        ok = (v > 0) & (np.log(u) < 0.5 * z * z + d - d * v
                        + d * np.log(np.maximum(v, 1e-30)))
        g = np.where(ok & ~acc, d * v, g)
        acc |= ok
    zf = normal()
    wh = a * (1.0 - 1.0 / (9.0 * a) + zf / (3.0 * np.sqrt(a))) ** 3
    g = np.where(acc, g, np.maximum(wh, 1e-30))
    ub = u01()
    g = np.where(a0 < 1.0, g * np.exp(np.log(ub) / np.maximum(a0, 1e-6)), g)
    g = np.where(valid, g, 0.0)
    out = np.empty_like(g)
    for gi in range(g.shape[0] // rows_per_group):
        sl = slice(gi * rows_per_group, (gi + 1) * rows_per_group)
        out[sl] = g[sl] / np.maximum(g[sl].sum(0, keepdims=True), 1e-30)
    return out


@pytest.mark.parametrize("rows_per_group,c", [(2, 300), (3, 77)])
def test_matches_numpy_replica(rows_per_group, c):
    rng = np.random.default_rng(0)
    r = rows_per_group * 2
    conc = jnp.asarray(rng.uniform(0.2, 50.0, (r, c)), jnp.float32)
    valid = jnp.asarray(rng.random((r, c)) > 0.05)
    draws = jnp.asarray(
        rng.uniform(1e-4, 1.0 - 1e-4, (dp.n_test_draws(), r, c)),
        jnp.float32)
    got = dp.dirichlet_rows(0, conc, valid, rows_per_group=rows_per_group,
                            interpret=True, test_draws=draws)
    want = np_replica(np.asarray(conc), np.asarray(valid),
                      np.asarray(draws), rows_per_group)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_group_simplex_and_mask():
    rng = np.random.default_rng(3)
    conc = jnp.asarray(rng.uniform(0.5, 9.0, (4, 130)), jnp.float32)
    valid = jnp.asarray(rng.random((4, 130)) > 0.3)
    draws = jnp.asarray(rng.uniform(1e-4, 1 - 1e-4,
                                    (dp.n_test_draws(), 4, 130)),
                        jnp.float32)
    out = np.asarray(dp.dirichlet_rows(0, conc, valid, rows_per_group=2,
                                       interpret=True, test_draws=draws))
    v = np.asarray(valid)
    assert (out[~v] == 0).all()
    for gi in range(2):
        s = out[2 * gi:2 * gi + 2].sum(0)
        live = v[2 * gi:2 * gi + 2].any(0)
        np.testing.assert_allclose(s[live], 1.0, atol=1e-5)


def test_dirichlet_kla_shape_roundtrip():
    rng = np.random.default_rng(5)
    k, l, a = 3, 40, 2
    counts = jnp.asarray(rng.integers(0, 30, (k, l, a)), jnp.float32) + 1.0
    valid = jnp.asarray(np.ones((l, a), bool))
    draws = jnp.asarray(rng.uniform(1e-4, 1 - 1e-4,
                                    (dp.n_test_draws(), k * a, l)),
                        jnp.float32)
    rows = jnp.transpose(counts, (0, 2, 1)).reshape(k * a, l)
    vrows = jnp.tile(valid.T, (k, 1))
    out_rows = dp.dirichlet_rows(0, rows, vrows, rows_per_group=a,
                                 interpret=True, test_draws=draws)
    freq = np.asarray(out_rows).reshape(k, a, l).transpose(0, 2, 1)
    np.testing.assert_allclose(freq.sum(-1), 1.0, atol=1e-5)
