"""Pallas tetraploid genotype-move kernel vs the XLA weight formulation.

The kernel (kernels/tetra_geno_pallas.py) evaluates, per candidate
ordering, the same weights as engine._sample_geno (update_geno,
poly_geno.c:520-580) and Gumbel-argmaxes them.  With injected noise
planes the chosen candidates must match an independent XLA reference
bit-for-bit (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instruct_tpu.config import ModelSpec
from instruct_tpu.data.synthetic import synthetic_tetra_panel
from instruct_tpu.kernels.tetra_geno_pallas import geno_choice_pass
from instruct_tpu.tetra import engine as eng


def _xla_choice(tables, spec, data, freq, freq2, q, table_log, z, gumbel):
    """Reference argmax_c [w_c + gumbel_c] with the engine's own weight
    helpers (the streaming-Gumbel path of _sample_geno, gumbel injected)."""
    n, l = data.n_distinct.shape
    zc = eng._split4(z)
    same_z = (zc[0] == zc[1]) & (zc[1] == zc[2]) & (zc[2] == zc[3])
    mix1 = eng._mix_per_allele(freq, q)
    mix2 = (eng._mix_per_allele(freq2, q) if not spec.autopoly else mix1)
    a = freq.shape[2]
    dist = eng._split4(data.distinct)
    n_cand = int(tables.n_patterns_np.max())
    nc = tables.cand_nc.astype(jnp.int32)

    best = jnp.full((n, l), -1e30)
    choice = jnp.zeros((n, l), jnp.int32)
    for c in range(n_cand):
        cls_idx = tables.cand_cls[c].astype(jnp.int32)
        w_same = eng._table_at(table_log, zc[0], cls_idx)
        w_mix = jnp.log(tables.cand_mult[c].astype(jnp.float32))
        sel8 = tables.cand_sel[c].astype(jnp.int32)
        for m in range(4):
            sel_m = (sel8 >> (2 * m)) & 3
            av = jnp.zeros((n, l), jnp.int32)
            for j in range(4):
                av = jnp.where(sel_m == j, dist[j], av)
            mix = mix1 if (spec.autopoly or m < 2) else mix2
            val = jnp.zeros((n, l), jnp.float32)
            for ai in range(a):
                val = jnp.where(av == ai, mix[ai], val)
            w_mix = w_mix + jnp.log(jnp.maximum(val, 1e-30))
        w = jnp.where(same_z, w_same, w_mix)
        v = jnp.where(c < nc, w + gumbel[c], -1e30)
        take = v > best
        best = jnp.where(take, v, best)
        choice = jnp.where(take, c, choice)
    return choice


@pytest.mark.parametrize("autopoly,n_alleles", [(True, 2), (False, 2),
                                                (True, 4), (False, 4)])
def test_geno_choice_kernel_matches_xla(autopoly, n_alleles):
    panel = synthetic_tetra_panel(n_indv=12, n_loci=17, n_pops=3,
                                  n_alleles=n_alleles, autopoly=autopoly,
                                  seed=3)
    data = panel.data
    spec = ModelSpec(mode=2, ploid=4, n_pops=3, autopoly=autopoly)
    tables = eng.build_tables(spec, data)
    n, l = data.n_distinct.shape
    k = 3
    key = jax.random.key(11)
    kf, kf2, kq, kz, kg, ks = jax.random.split(key, 6)
    a = data.max_alleles
    freq = jax.random.dirichlet(kf, jnp.ones(a), (k, l)).astype(jnp.float32)
    freq2 = jax.random.dirichlet(kf2, jnp.ones(a), (k, l)).astype(
        jnp.float32)
    q = jax.random.dirichlet(kq, jnp.ones(k), (n,)).astype(jnp.float32)
    z = jax.random.randint(kz, (n, 4 * l), 0, k, dtype=jnp.int8)
    # force some same-z sites so both weight branches are exercised
    z = z.at[: n // 2].set(
        jnp.tile(z[: n // 2, :l], (1, 4)).astype(jnp.int8))
    log_hwe = eng.log_hwe_table(tables, spec, freq, freq2)
    rates = jax.random.uniform(ks, (k,), minval=0.1, maxval=0.9)
    table_log = eng.selfing_equilibrium(tables, log_hwe, rates)

    n_cand = int(tables.n_patterns_np.max())
    gumbel = jax.random.gumbel(kg, (n_cand, n, l), jnp.float32)

    mix1 = eng._mix_per_allele(freq, q)
    mix2 = eng._mix_per_allele(freq2, q) if not autopoly else mix1
    mix = jnp.stack(mix1 if autopoly else mix1 + mix2)
    got = geno_choice_pass(
        jnp.zeros((2,), jnp.int32), table_log, z, data.distinct,
        tables.cand_nc, mix, tables.cand_sel, tables.cand_cls,
        tables.cand_mult, n_pops=k, autopoly=autopoly, interpret=True,
        gumbel=gumbel)
    want = _xla_choice(tables, spec, data, freq, freq2, q, table_log, z,
                       gumbel)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_reconstruct_matches_candidate_slots():
    """_reconstruct_geno routes choice -> slots exactly like the direct
    per-candidate slot evaluation."""
    panel = synthetic_tetra_panel(n_indv=8, n_loci=9, n_pops=2,
                                  n_alleles=4, autopoly=False, seed=1)
    data = panel.data
    spec = ModelSpec(mode=2, ploid=4, n_pops=2, autopoly=False)
    tables = eng.build_tables(spec, data)
    n, l = data.n_distinct.shape
    n_cand = int(tables.n_patterns_np.max())
    choice = jax.random.randint(jax.random.key(0), (n, l), 0, n_cand)
    choice = jnp.minimum(choice, tables.cand_nc.astype(jnp.int32) - 1)
    got = eng._reconstruct_geno(tables, data, choice, n_cand)
    want_slots = []
    for m in range(4):
        vm = jnp.zeros((n, l), jnp.int32)
        for c in range(n_cand):
            slots = eng._candidate_slots(tables, data, c)
            vm = jnp.where(choice == c, slots[m], vm)
        want_slots.append(vm)
    want = jnp.concatenate(want_slots, axis=1).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("autopoly,n_alleles", [(True, 4), (False, 2),
                                                (False, 4)])
def test_s_delta_pass_matches_xla(autopoly, n_alleles):
    """The one-pass S MH log-ratio kernel equals the XLA formulation
    (_site_class + _table_at pair + masked per-pop sums) bit-for-bit up
    to f32 reduction order."""
    from instruct_tpu.kernels.tetra_geno_pallas import s_delta_pass

    panel = synthetic_tetra_panel(n_indv=10, n_loci=19, n_pops=3,
                                  n_alleles=n_alleles, autopoly=autopoly,
                                  seed=7)
    data = panel.data
    spec = ModelSpec(mode=2, ploid=4, n_pops=3, autopoly=autopoly)
    tables = eng.build_tables(spec, data)
    l, k = data.n_loci, 3
    key = jax.random.key(4)
    kf, kf2, kz, ks1, ks2, kg = jax.random.split(key, 6)
    a = data.max_alleles
    freq = jax.random.dirichlet(kf, jnp.ones(a), (k, l)).astype(
        jnp.float32)
    freq2 = jax.random.dirichlet(kf2, jnp.ones(a), (k, l)).astype(
        jnp.float32)
    z = jax.random.randint(kz, (10, 4 * l), 0, k, dtype=jnp.int8)
    z = z.at[:5].set(jnp.tile(z[:5, :l], (1, 4)).astype(jnp.int8))
    # a valid latent ordered genotype (orderings of the observed sets)
    n_cand = int(tables.n_patterns_np.max())
    choice = jnp.zeros((10, l), jnp.int32)
    geno = eng._reconstruct_geno(tables, data, choice, n_cand)
    log_hwe = eng.log_hwe_table(tables, spec, freq, freq2)
    tab_cur = eng.selfing_equilibrium(
        tables, log_hwe, jax.random.uniform(ks1, (k,), minval=0.1,
                                            maxval=0.9))
    tab_prop = eng.selfing_equilibrium(
        tables, log_hwe, jax.random.uniform(ks2, (k,), minval=0.1,
                                            maxval=0.9))

    lookup_l = tables.lookup[tables.cls]
    got = s_delta_pass(tab_cur, tab_prop, lookup_l, z, geno,
                       data.site_valid, interpret=True)

    cls_idx = eng._site_class(tables, data, geno)
    zc = eng._split4(z)
    same = (zc[0] == zc[1]) & (zc[1] == zc[2]) & (zc[2] == zc[3])
    diff = jnp.where(same & data.site_valid,
                     eng._table_at(tab_prop, zc[0], cls_idx)
                     - eng._table_at(tab_cur, zc[0], cls_idx), 0.0)
    want = jnp.stack([jnp.where(zc[0] == kk, diff, 0.0).sum()
                      for kk in range(k)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("autopoly,n_alleles", [(True, 4), (False, 2),
                                                (False, 4)])
def test_site_ll_pass_matches_xla(autopoly, n_alleles):
    """The one-pass cal_lkd kernel equals engine._site_loglik summed over
    loci, for both weight branches (same-z table reads, mixed-z per-slot
    frequency products)."""
    from instruct_tpu.kernels.tetra_geno_pallas import site_ll_pass

    panel = synthetic_tetra_panel(n_indv=11, n_loci=18, n_pops=3,
                                  n_alleles=n_alleles, autopoly=autopoly,
                                  missing_rate=0.1, seed=9)
    data = panel.data
    spec = ModelSpec(mode=2, ploid=4, n_pops=3, autopoly=autopoly)
    tables = eng.build_tables(spec, data)
    l, k = data.n_loci, 3
    key = jax.random.key(8)
    kf, kf2, kz, ks = jax.random.split(key, 4)
    a = data.max_alleles
    freq = jax.random.dirichlet(kf, jnp.ones(a), (k, l)).astype(
        jnp.float32)
    freq2 = jax.random.dirichlet(kf2, jnp.ones(a), (k, l)).astype(
        jnp.float32)
    z = jax.random.randint(kz, (11, 4 * l), 0, k, dtype=jnp.int8)
    z = z.at[:5].set(jnp.tile(z[:5, :l], (1, 4)).astype(jnp.int8))
    n_cand = int(tables.n_patterns_np.max())
    choice = jnp.minimum(jax.random.randint(jax.random.key(2), (11, l),
                                            0, n_cand),
                         tables.cand_nc.astype(jnp.int32) - 1)
    geno = eng._reconstruct_geno(tables, data, choice, n_cand)
    log_hwe = eng.log_hwe_table(tables, spec, freq, freq2)
    table = eng.selfing_equilibrium(
        tables, log_hwe, jax.random.uniform(ks, (k,), minval=0.1,
                                            maxval=0.9))

    got = site_ll_pass(table, tables.lookup[tables.cls],
                       tables.log_mult[tables.cls], freq, freq2, z, geno,
                       data.site_valid, autopoly=autopoly, interpret=True)
    want = eng._site_loglik(tables, spec, data, freq, freq2, z, geno,
                            table).sum(axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
