"""Fused Pallas kernel for the tetraploid latent-genotype Gibbs move.

The XLA formulation of `tetra.engine._sample_geno` (update_geno,
poly_geno.c:520-580 + choose_*, 854-1215) evaluates, per candidate
ordering c (up to 12 for the allotetraploid), a (K * G)-way fused select
into the genotype-class log-frequency table plus 4 slot-allele mixture
lookups, then streams a Gumbel-argmax.  XLA only partially fuses the
12-candidate where-chains: at the 500 x 5k benchmark panel the move
reads/writes ~50 GB of [N, L] plane traffic and costs 63 ms of the 77 ms
allotetraploid step (BASELINE.md round 4).

This kernel runs the whole move as ONE pass over [bn, bl] site blocks
with every operand VMEM-resident:

  * the [K*G, bl] table slice is loaded once per block; the per-site
    lookup table[z0, l, cls_c] is computed g-major — for each class g the
    K-way z0-select runs once and feeds all candidates' accumulators —
    so the select count is G*(K + C) per site instead of C*K*G;
  * candidate slot routing uses the STATIC precomputed planes
    (TetraTables.cand_sel/cls/mult — data-only, built once per panel);
  * the mixture values sum_k q_k freq_sys[k, l, a] enter as A (auto) or
    2A (allo) precomputed [N, L] planes — O(K*A*L) work outside the
    kernel, shared by all candidates;
  * Gumbel noise comes from the on-core PRNG (two-slot block seeding as
    in kernels/fused_step.py); tests inject explicit noise planes
    instead and check the argmax against an XLA reference bit-for-bit.

Output is the chosen candidate index [N, L]; the cheap slot/allele
reconstruction (a 12-way select + 16 value selects) stays in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-30
_NEG = -1e30


def _log(x):
    return jnp.log(jnp.maximum(x, _EPS))


def _geno_kernel(seed_ref, table_ref, z0r, z1r, z2r, z3r, d0r, d1r, d2r,
                 d3r, ncr, mixr, selr, clsr, multr, *rest, n_pops, g_max,
                 n_cand, n_alleles, autopoly, inkernel_prng, n_seed_words,
                 n_l_blocks):
    if inkernel_prng:
        gum_ref, choice_ref = None, rest[0]
        i, j = pl.program_id(0), pl.program_id(1)
        block = i * n_l_blocks + j
        if n_seed_words >= 2:
            pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ block)
        else:
            pltpu.prng_seed(seed_ref[0], block)
    else:
        gum_ref, choice_ref = rest

    z0 = z0r[:].astype(jnp.int32)
    z1 = z1r[:].astype(jnp.int32)
    z2 = z2r[:].astype(jnp.int32)
    z3 = z3r[:].astype(jnp.int32)
    # (a - b) == 0 rather than a == b: Mosaic folds an eq of two i8->i32
    # converts back into an unsupported i8 vector compare (fused_step.py)
    same = ((z0 - z1) == 0) & ((z1 - z2) == 0) & ((z2 - z3) == 0)
    dist = [d0r[:].astype(jnp.int32), d1r[:].astype(jnp.int32),
            d2r[:].astype(jnp.int32), d3r[:].astype(jnp.int32)]
    nc = ncr[:].astype(jnp.int32)
    a = n_alleles

    # mixed-z weights: log mult + sum_slots log mix_sys[allele]
    wmix = []
    for c in range(n_cand):
        sel8 = selr[c].astype(jnp.int32)
        w = _log(multr[c].astype(jnp.float32))
        for m in range(4):
            sel_m = (sel8 >> (2 * m)) & 3
            av = dist[0]
            for jj in range(1, 4):
                av = jnp.where(sel_m == jj, dist[jj], av)
            off = 0 if (autopoly or m < 2) else a
            val = mixr[off]
            for ai in range(1, a):
                val = jnp.where(av == ai, mixr[off + ai], val)
            w = w + _log(val)
        wmix.append(w)

    # same-z weights, g-major: one K-way z0-select per class feeds all
    # candidates (select count G*(K + C) per site, not C*K*G)
    cls = [clsr[c].astype(jnp.int32) for c in range(n_cand)]
    wsame = [jnp.full(z0.shape, _NEG, jnp.float32) for _ in range(n_cand)]
    for g in range(g_max):
        t = table_ref[g, :][None, :]
        for k in range(1, n_pops):
            t = jnp.where(z0 == k, table_ref[k * g_max + g, :][None, :], t)
        for c in range(n_cand):
            wsame[c] = jnp.where(cls[c] == g, t, wsame[c])

    best = jnp.full(z0.shape, _NEG, jnp.float32)
    choice = jnp.zeros(z0.shape, jnp.int32)
    for c in range(n_cand):
        w = jnp.where(same, wsame[c], wmix[c])
        if inkernel_prng:
            bits = pltpu.prng_random_bits(z0.shape)
            u = ((bits & 0x7FFFFF).astype(jnp.float32) + 0.5) * (
                1.0 / (1 << 23))
            gmb = -jnp.log(-jnp.log(u))
        else:
            gmb = gum_ref[c]
        v = jnp.where(nc > c, w + gmb, _NEG)
        take = v > best
        best = jnp.where(take, v, best)
        choice = jnp.where(take, c, choice)
    choice_ref[:] = choice


def _s_delta_kernel(tab_cur, tab_prop, lookup_ref, z0r, z1r, z2r, z3r,
                    g0r, g1r, g2r, g3r, vr, out_ref, *, n_pops, g_max,
                    n_lookup, n_max):
    i = pl.program_id(1)                     # N-block axis (minor)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    z0 = z0r[:].astype(jnp.int32)
    z1 = z1r[:].astype(jnp.int32)
    z2 = z2r[:].astype(jnp.int32)
    z3 = z3r[:].astype(jnp.int32)
    same = ((z0 - z1) == 0) & ((z1 - z2) == 0) & ((z2 - z3) == 0)
    valid = vr[:] != 0
    g0 = g0r[:].astype(jnp.int32)
    g1 = g1r[:].astype(jnp.int32)
    g2 = g2r[:].astype(jnp.int32)
    g3 = g3r[:].astype(jnp.int32)
    packed = ((g0 * n_max + g1) * n_max + g2) * n_max + g3

    # genotype-class index: V-way select into the per-locus lookup rows
    cls = jnp.broadcast_to(lookup_ref[0, :][None, :].astype(jnp.int32),
                           z0.shape)
    for v in range(1, n_lookup):
        cls = jnp.where(packed == v,
                        lookup_ref[v, :][None, :].astype(jnp.int32), cls)

    # g-major diff: one pair of K-way z0-selects per class
    dsite = jnp.zeros(z0.shape, jnp.float32)
    for g in range(g_max):
        tc = tab_cur[g, :][None, :]
        tp = tab_prop[g, :][None, :]
        for k in range(1, n_pops):
            tc = jnp.where(z0 == k, tab_cur[k * g_max + g, :][None, :], tc)
            tp = jnp.where(z0 == k, tab_prop[k * g_max + g, :][None, :],
                           tp)
        dsite = jnp.where(cls == g, tp - tc, dsite)

    dm = jnp.where(same & valid, dsite, 0.0)
    for k in range(n_pops):
        m = (z0 == k).astype(jnp.float32)
        out_ref[k:k + 1, :] += (dm * m).sum(axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def s_delta_pass(tab_cur, tab_prop, lookup_l, z, geno, site_valid, *,
                 interpret=False):
    """delta f32[K]: the per-pop S MH log-ratio columns
    sum_{sites: same-z, valid, z0==k} [tab_prop - tab_cur](z0, l, cls)
    in ONE read of the site planes (replaces _site_class + two
    _table_at select passes + the masked stack-sums of the tetraploid
    S update — ~7 ms of isolated XLA passes at 500x5k A=4).

    tab_* f32[K, L, G]; lookup_l i32[L, V] = lookup[cls_of_locus] (the
    packed-code -> class map per locus); z/geno i8/i32[N, 4L] copy-major.
    """
    k, l, g_max = tab_cur.shape
    n = site_valid.shape[0]
    v = lookup_l.shape[1]
    bn = min(256, max(8, n))
    bl = min(512, -(-l // 128) * 128)
    np_, lp = n + (-n % bn), l + (-l % bl)
    grid = (lp // bl, np_ // bn)            # N minor: accumulation

    def rows(t):
        return jnp.pad(jnp.transpose(t, (0, 2, 1)).reshape(k * g_max, l),
                       ((0, 0), (0, lp - l)))

    def pad2(x):
        return jnp.pad(x, ((0, np_ - x.shape[0]), (0, lp - x.shape[1])))

    zc = [pad2(z[:, m * l:(m + 1) * l]) for m in range(4)]
    gc = [pad2(geno[:, m * l:(m + 1) * l].astype(jnp.int8))
          for m in range(4)]
    lookup_rows = jnp.pad(lookup_l.T.astype(jnp.int16),
                          ((0, 0), (0, lp - l)))              # [V, Lp]
    # n_max from V = n_max^4
    n_max = round(v ** 0.25)

    site_blk = pl.BlockSpec((bn, bl), lambda j, i: (i, j),
                            memory_space=pltpu.VMEM)
    tab_blk = pl.BlockSpec((k * g_max, bl), lambda j, i: (0, j),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_s_delta_kernel, n_pops=k, g_max=g_max,
                          n_lookup=v, n_max=n_max),
        grid=grid,
        in_specs=[tab_blk, tab_blk,
                  pl.BlockSpec((v, bl), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM)]
        + [site_blk] * 8
        + [site_blk],
        out_specs=pl.BlockSpec((k, bl), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, lp), jnp.float32),
        interpret=interpret,
    )(rows(tab_cur), rows(tab_prop), lookup_rows, *zc, *gc,
      pad2(site_valid.astype(jnp.int8)))
    return out.sum(axis=1)


def _site_ll_kernel(tab_ref, lookup_ref, lm_ref, f1_ref, f2_ref, z0r, z1r,
                    z2r, z3r, g0r, g1r, g2r, g3r, vr, ll_ref, *, n_pops,
                    g_max, n_lookup, n_max, n_alleles, autopoly):
    j = pl.program_id(1)                     # L-block axis (minor)

    @pl.when(j == 0)
    def _init():
        ll_ref[:] = jnp.zeros_like(ll_ref)

    zc = [z0r[:].astype(jnp.int32), z1r[:].astype(jnp.int32),
          z2r[:].astype(jnp.int32), z3r[:].astype(jnp.int32)]
    same = (((zc[0] - zc[1]) == 0) & ((zc[1] - zc[2]) == 0)
            & ((zc[2] - zc[3]) == 0))
    valid = vr[:] != 0
    gc = [g0r[:].astype(jnp.int32), g1r[:].astype(jnp.int32),
          g2r[:].astype(jnp.int32), g3r[:].astype(jnp.int32)]
    packed = (((gc[0] * n_max + gc[1]) * n_max + gc[2]) * n_max + gc[3])

    cls = jnp.broadcast_to(lookup_ref[0, :][None, :].astype(jnp.int32),
                           packed.shape)
    for v in range(1, n_lookup):
        cls = jnp.where(packed == v,
                        lookup_ref[v, :][None, :].astype(jnp.int32), cls)

    # same-z branch: table[z0, l, cls] + mixed-z multiplicity, g-major
    ll_same = jnp.zeros(packed.shape, jnp.float32)
    lmult = jnp.zeros(packed.shape, jnp.float32)
    for g in range(g_max):
        t = tab_ref[g, :][None, :]
        for k in range(1, n_pops):
            t = jnp.where(zc[0] == k, tab_ref[k * g_max + g, :][None, :],
                          t)
        ll_same = jnp.where(cls == g, t, ll_same)
        lmult = jnp.where(cls == g, lm_ref[g, :][None, :], lmult)

    # mixed-z branch: log mult + sum_slots log freq_sys[z_m, l, a_m]
    a = n_alleles
    ll_mix = lmult
    for m in range(4):
        fref = f1_ref if (autopoly or m < 2) else f2_ref
        w = fref[0, :][None, :] * jnp.ones(packed.shape, jnp.float32)
        for k in range(n_pops):
            for ai in range(a):
                if k == 0 and ai == 0:
                    continue
                sel = ((zc[m] - k) == 0) & ((gc[m] - ai) == 0)
                w = jnp.where(sel, fref[k * a + ai, :][None, :], w)
        ll_mix = ll_mix + jnp.log(jnp.maximum(w, _EPS))

    site = jnp.where(same, ll_same, ll_mix)
    vf = valid.astype(jnp.float32)
    ll_ref[:, 0] += (site * vf).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("autopoly", "interpret"))
def site_ll_pass(table, lookup_l, log_mult_l, freq, freq2, z, geno,
                 site_valid, *, autopoly, interpret=False):
    """Per-individual tetraploid log-lik f32[N] in ONE read of the site
    planes — the cal_lkd pass (engine._site_loglik summed over loci):
    same-z sites read the genotype-class table at (z0, l, cls), mixed-z
    sites sum per-slot log frequencies plus the ordering multiplicity.
    Replaces ~4 ms of XLA select chains per stored-step/WAIC evaluation.

    table f32[K, L, G]; lookup_l i32[L, V]; log_mult_l f32[L, G]
    (= log_mult[cls_of_locus]); freq/freq2 f32[K, L, A]."""
    k, l, g_max = table.shape
    a = freq.shape[2]
    n = site_valid.shape[0]
    v = lookup_l.shape[1]
    bn = min(128, max(8, n))
    bl = min(512, -(-l // 128) * 128)
    np_, lp = n + (-n % bn), l + (-l % bl)
    grid = (np_ // bn, lp // bl)            # L minor: accumulation

    def pad2(x):
        return jnp.pad(x, ((0, np_ - x.shape[0]), (0, lp - x.shape[1])))

    def rows(t):
        r = jnp.transpose(t, (0, 2, 1)).reshape(-1, l)
        return jnp.pad(r, ((0, 0), (0, lp - l)))

    zc = [pad2(z[:, m * l:(m + 1) * l]) for m in range(4)]
    gc = [pad2(geno[:, m * l:(m + 1) * l].astype(jnp.int8))
          for m in range(4)]
    lookup_rows = jnp.pad(lookup_l.T.astype(jnp.int16),
                          ((0, 0), (0, lp - l)))
    lm_rows = jnp.pad(log_mult_l.T, ((0, 0), (0, lp - l)))
    n_max = round(v ** 0.25)

    site_blk = pl.BlockSpec((bn, bl), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)

    def col_blk(r):
        return pl.BlockSpec((r, bl), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_site_ll_kernel, n_pops=k, g_max=g_max,
                          n_lookup=v, n_max=n_max, n_alleles=a,
                          autopoly=autopoly),
        grid=grid,
        in_specs=[col_blk(k * g_max), col_blk(v), col_blk(g_max),
                  col_blk(k * a), col_blk(k * a)]
        + [site_blk] * 9,
        out_specs=pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        interpret=interpret,
    )(rows(table), lookup_rows, lm_rows, rows(freq),
      rows(freq2 if freq2 is not None else freq), *zc, *gc,
      pad2(site_valid.astype(jnp.int8)))
    return out[:n, 0]


@functools.partial(jax.jit,
                   static_argnames=("n_pops", "autopoly", "interpret"))
def geno_choice_pass(seed, table, z, dist, nc, mix, cand_sel, cand_cls,
                     cand_mult, *, n_pops, autopoly, interpret=False,
                     gumbel=None):
    """Chosen candidate index i32[N, L] of the latent-genotype Gibbs move.

    table f32[K, L, G]; z i8[N, 4L] copy-major; dist i8/i32[N, 4L]
    copy-major distinct planes; nc u8[N, L] valid-candidate counts;
    mix f32[A_sys, N, L] mixture planes (A rows for auto, 2A for allo:
    system-1 rows then system-2); cand_* the static planes of
    TetraTables.  ``gumbel`` f32[C, N, L] replaces the on-core PRNG for
    bit-exact testing.
    """
    k, l, g_max = table.shape
    n = nc.shape[0]
    n_cand = cand_sel.shape[0]
    n_sys = mix.shape[0]

    bn = min(128, max(8, n))
    bl = min(256, -(-l // 128) * 128)
    np_, lp = n + (-n % bn), l + (-l % bl)
    grid = (np_ // bn, lp // bl)

    def pad2(x):
        return jnp.pad(x, ((0, np_ - x.shape[0]), (0, lp - x.shape[1])))

    def pad3(x):
        return jnp.pad(x, ((0, 0), (0, np_ - x.shape[1]),
                           (0, lp - x.shape[2])))

    table_rows = jnp.pad(
        jnp.transpose(table, (0, 2, 1)).reshape(k * g_max, l),
        ((0, 0), (0, lp - l)))

    zc = [pad2(z[:, m * l:(m + 1) * l]) for m in range(4)]
    dc = [pad2(dist[:, m * l:(m + 1) * l].astype(jnp.int8))
          for m in range(4)]

    site_blk = pl.BlockSpec((bn, bl), lambda i, j, *_: (i, j),
                            memory_space=pltpu.VMEM)
    stack_blk = pl.BlockSpec((n_cand, bn, bl), lambda i, j, *_: (0, i, j),
                             memory_space=pltpu.VMEM)
    operands = [table_rows, *zc, *dc, pad2(nc.astype(jnp.int8)),
                pad3(mix), pad3(cand_sel.astype(jnp.int8)),
                pad3(cand_cls), pad3(cand_mult.astype(jnp.int8))]
    in_specs = [pl.BlockSpec((k * g_max, bl), lambda i, j, *_: (0, j),
                             memory_space=pltpu.VMEM)]
    in_specs += [site_blk] * 9
    in_specs += [pl.BlockSpec((n_sys, bn, bl), lambda i, j, *_: (0, i, j),
                              memory_space=pltpu.VMEM)]
    in_specs += [stack_blk] * 3
    if gumbel is not None:
        operands.append(pad3(gumbel))
        in_specs.append(stack_blk)

    seed_words = jnp.atleast_1d(jnp.asarray(seed, jnp.int32)).reshape(-1)
    kernel = functools.partial(
        _geno_kernel, n_pops=k, g_max=g_max, n_cand=n_cand,
        n_alleles=n_sys if autopoly else n_sys // 2, autopoly=autopoly,
        inkernel_prng=gumbel is None,
        n_seed_words=seed_words.shape[0], n_l_blocks=grid[1])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((bn, bl), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_, lp), jnp.int32),
        interpret=interpret)(seed_words, *operands)
    return out[:n, :l]
