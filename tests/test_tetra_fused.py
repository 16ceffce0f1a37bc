"""Fused tetra P/ZQ path (tetra/engine.py:_update_*_tetra_fused): the
copy-major [N, 4L] layout makes each subgenome system a diploid pass, so
the diploid Pallas kernels are reused.  These tests verify the *view*
equivalence on CPU (interpret mode): kernel allele counts over the
[N, 2*(2L)] auto view / per-system views match the XLA count loops, and
the kernel's inverse-CDF z draw matches the XLA formulation given the
same uniforms.
"""

import jax
import jax.numpy as jnp
import numpy as np

from instruct_tpu.config import ModelSpec
from instruct_tpu.data.synthetic import synthetic_tetra_panel
from instruct_tpu.kernels import fused_step as fs
from instruct_tpu.tetra import engine as te


def _panel(autopoly=True, n=30, l=17, k=3):
    panel = synthetic_tetra_panel(n_indv=n, n_loci=l, n_pops=k, n_alleles=2,
                                  seed=3, autopoly=autopoly)
    spec = ModelSpec(mode=2, n_pops=k, ploid=4, autopoly=autopoly)
    st = te.init_tetra_state(jax.random.key(0), spec, panel.data)
    return panel.data, spec, st


def _xla_counts(spec, data, z, geno, slots):
    k, a = spec.n_pops, data.max_alleles
    zc, gc = te._split4(z), te._split4(geno)
    out = np.zeros((k, data.n_loci, a), np.float32)
    v = np.asarray(data.site_valid)
    for kk in range(k):
        for ai in range(a):
            for c in slots:
                m = v & (np.asarray(zc[c]) == kk) & (np.asarray(gc[c]) == ai)
                out[kk, :, ai] += m.sum(axis=0)
    return out


def test_auto_view_counts_match():
    data, spec, st = _panel(autopoly=True)
    l = data.n_loci
    v2 = jnp.tile(data.site_valid, (1, 2))
    cnt2 = fs.allele_counts(st.z, st.geno, v2, n_pops=spec.n_pops,
                            max_alleles=data.max_alleles, interpret=True)
    cnt = np.asarray(cnt2[:, :l] + cnt2[:, l:])
    np.testing.assert_array_equal(cnt, _xla_counts(spec, data, st.z,
                                                   st.geno, range(4)))


def test_allo_system_counts_match():
    data, spec, st = _panel(autopoly=False)
    l = data.n_loci
    c1 = fs.allele_counts(st.z[:, :2 * l], st.geno[:, :2 * l],
                          data.site_valid, n_pops=spec.n_pops,
                          max_alleles=data.max_alleles, interpret=True)
    c2 = fs.allele_counts(st.z[:, 2 * l:], st.geno[:, 2 * l:],
                          data.site_valid, n_pops=spec.n_pops,
                          max_alleles=data.max_alleles, interpret=True)
    np.testing.assert_array_equal(np.asarray(c1),
                                  _xla_counts(spec, data, st.z, st.geno,
                                              [0, 1]))
    np.testing.assert_array_equal(np.asarray(c2),
                                  _xla_counts(spec, data, st.z, st.geno,
                                              [2, 3]))


def test_z_draw_matches_xla_given_same_uniforms():
    """The kernel's inverse-CDF draw z = sum_j 1[u*tot > cum_j] equals the
    XLA formulation in _update_zq_tetra fed the same uniform planes."""
    data, spec, st = _panel(autopoly=True, n=12, l=9, k=3)
    l = data.n_loci
    n = st.q.shape[0]
    rng = np.random.default_rng(11)
    u4 = jnp.asarray(rng.uniform(0.01, 0.99, (n, 4 * l)), jnp.float32)

    # XLA replica on the copy-major flat layout
    freq = st.freq
    geno = st.geno
    k = spec.n_pops
    terms = []
    for kk in range(k):
        v1 = jnp.zeros((n, 4 * l), freq.dtype)
        for ai in range(data.max_alleles):
            vals = jnp.tile(freq[kk, :, ai], 4)[None]
            v1 = jnp.where(geno == ai, vals, v1)
        terms.append(st.q[:, kk][:, None] * v1)
    total = sum(terms[1:], terms[0])
    u = u4 * total
    z_ref = jnp.zeros((n, 4 * l), jnp.int32)
    cum = jnp.zeros_like(total)
    for kk in range(k - 1):
        cum = cum + terms[kk]
        z_ref = z_ref + (u > cum).astype(jnp.int32)

    # kernel on the [N, 2*(2L)] view with the same uniforms: the site pass
    # consumes u as the two copy planes of the folded view
    v2 = jnp.tile(data.site_valid, (1, 2))
    freq_2l = jnp.concatenate([freq, freq], axis=1)
    z, qqnum, _ = fs.zq_sample_pass(jnp.zeros(2, jnp.int32), st.q, freq_2l,
                                    geno, v2, interpret=True, u=u4)
    valid4 = np.asarray(jnp.tile(data.site_valid, (1, 4)))
    np.testing.assert_array_equal(
        np.asarray(z.astype(jnp.int32))[valid4],
        np.asarray(z_ref)[valid4])
    # per-individual pop counts over all four copies
    zr, vb = np.asarray(z_ref), valid4.astype(bool)
    qq_ref = np.stack([np.where(vb, zr == kk, False).sum(axis=1)
                       for kk in range(k)], axis=1)
    np.testing.assert_array_equal(np.asarray(qqnum), qq_ref)
