"""Fused Pallas Z-Gibbs kernel (interpret mode on CPU): conditional
distribution and count bookkeeping must match the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instruct_tpu.data.synthetic import synthetic_panel
from instruct_tpu.kernels.zq_pallas import zq_sample_counts


@pytest.fixture(scope="module")
def setup():
    panel = synthetic_panel(n_indv=17, n_loci=23, n_pops=3, n_alleles=2,
                            missing_rate=0.1, seed=5)
    data = panel.data
    rng = np.random.default_rng(0)
    freq = jnp.asarray(rng.dirichlet(np.ones(2), size=(3, 23)), jnp.float32)
    q = jnp.asarray(rng.dirichlet(np.ones(3), size=17), jnp.float32)
    return data, freq, q


def _u(seed, shape):
    return jax.random.uniform(jax.random.key(seed), shape,
                              minval=1e-6, maxval=1.0 - 1e-6)


def test_zq_kernel_counts_consistent(setup):
    data, freq, q = setup
    z, qqnum = zq_sample_counts(1234, q, freq, data.geno, data.site_valid,
                                n_pops=3, interpret=True,
                                u=_u(0, data.geno.shape))
    assert z.shape == data.geno.shape
    assert ((np.asarray(z) >= 0) & (np.asarray(z) < 3)).all()
    # counts must equal the recount of z over valid sites
    valid = np.tile(np.asarray(data.site_valid), (1, 2))   # copy-major
    want = np.stack([(valid & (np.asarray(z) == k)).sum(1)
                     for k in range(3)], axis=1)
    np.testing.assert_allclose(np.asarray(qqnum), want, atol=1e-5)


def test_zq_kernel_conditional_distribution(setup):
    data, freq, q = setup
    draws = []
    for seed in range(300):
        z, _ = zq_sample_counts(seed, q, freq, data.geno, data.site_valid,
                                n_pops=3, interpret=True,
                                u=_u(seed, data.geno.shape))
        draws.append(np.asarray(z))
    emp = np.stack(draws)                      # [T, N, S]
    geno3 = data.geno3
    n, l, p = geno3.shape
    f = np.asarray(freq)
    qn = np.asarray(q)
    l_idx = np.arange(l)[None, :, None]
    w = np.stack([qn[:, k][:, None, None] * f[k][l_idx, geno3]
                  for k in range(3)], axis=-1)     # [N, L, P, K]
    want = (w / w.sum(-1, keepdims=True)).transpose(0, 2, 1, 3).reshape(n, p * l, 3)
    for k in range(3):
        emp_k = (emp == k).mean(0)
        np.testing.assert_allclose(emp_k, want[..., k], atol=0.12)


def test_zq_kernel_padding_edges():
    # shapes far from multiples of the block sizes
    panel = synthetic_panel(n_indv=5, n_loci=7, n_pops=2, seed=8)
    data = panel.data
    rng = np.random.default_rng(1)
    freq = jnp.asarray(rng.dirichlet(np.ones(2), size=(2, 7)), jnp.float32)
    q = jnp.asarray(rng.dirichlet(np.ones(2), size=5), jnp.float32)
    z, qqnum = zq_sample_counts(7, q, freq, data.geno, data.site_valid,
                                n_pops=2, interpret=True,
                                u=_u(7, data.geno.shape))
    assert z.shape == (5, 14)
    valid = np.tile(np.asarray(data.site_valid), (1, 2))   # copy-major
    assert np.asarray(qqnum).sum() == valid.sum()
