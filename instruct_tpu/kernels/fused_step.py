"""Fused Pallas TPU kernels for the diploid step (modes 1-5).

The XLA formulation of one MCMC sweep moves ~2 GB of HBM per step at the
north-star panel size (1000 x 10k): every update kernel re-reads the site
tensors and materializes f32 [N, S] intermediates.  The sweep has exactly
three sequence points that force separate device passes:

  1. allele counts[K, L, A] from (z, geno)        -> P ~ Dir(counts + 1)
  2. given the fresh P and the old Q: Z-Gibbs sample + per-individual pop
     counts + the selfing-generation log-likelihood pair (current and
     proposed G share every intermediate)          -> G accept, Q ~ Dir
  3. given the fresh Q and G: the panel log-likelihood (cal_lkh)

Each pass is one Pallas kernel here, reading the int8 site planes once and
keeping all intermediates in VMEM/registers: ~200 MB of traffic per step
instead of ~2 GB.  Reference parity: the kernels compute the exact update
equations of update_P's count loop (mcmc.c:815-845), update_ZQ
(mcmc.c:1122-1199), update_G's likelihood ratio via log_ld_indv
(mcmc.c:1053-1091, 1726-1773) and cal_lkh (mcmc.c:1916-1942); fed the same
uniforms they reproduce the XLA path bit-for-bit (tests/test_fused_step.py).

Layout contract (see data/dataset.py): copy-major flat site tensors — the
[N, 2L] arrays are passed twice with block index maps offset by L//bl so
each grid point sees both copies of the same (individual, locus) block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2 = 0.6931471805599453
_EPS = 1e-30


def seed_words(key) -> jnp.ndarray:
    """The raw 32-bit words of a typed PRNG key, as i32[W].

    The in-kernel PRNG is seeded per block with (word 0, word 1 XOR block
    id) — two slots of `pltpu.prng_seed` — giving every (chain, step,
    block) an independent stream.  A linear ``seed + block`` offset from a
    single 31-bit word collides by birthday across long runs (ADVICE r1)
    and is never used."""
    kd = jax.random.key_data(key)
    return jax.lax.bitcast_convert_type(kd, jnp.int32).reshape(-1)


def _pad2(x, bn, bl):
    n, l = x.shape
    return jnp.pad(x, ((0, -n % bn), (0, -l % bl)))


def _log(x):
    return jnp.log(jnp.maximum(x, _EPS))


# ---------------------------------------------------------------------------
# Kernel 1: allele-count reduction  (update_P counting, mcmc.c:815-845)
# ---------------------------------------------------------------------------

def _counts_kernel(z0, z1, g0, g1, valid, cnt, *, n_pops, max_alleles):
    i = pl.program_id(1)                      # N-block axis (minor)

    @pl.when(i == 0)
    def _init():
        cnt[:] = jnp.zeros_like(cnt)

    # loads stay int8 in HBM; compute upcasts to i32 (Mosaic has no i8 cmp)
    v = valid[:] != 0
    pairs = ((z0[:].astype(jnp.int32), g0[:].astype(jnp.int32)),
             (z1[:].astype(jnp.int32), g1[:].astype(jnp.int32)))
    for zc, gc in pairs:
        for k in range(n_pops):
            zm = v & (zc == k)
            for a in range(max_alleles):
                m = (zm & (gc == a)).astype(jnp.float32)
                r = k * max_alleles + a
                cnt[r:r + 1, :] += m.sum(axis=0, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("n_pops", "max_alleles", "interpret"))
def allele_counts(z, geno, site_valid, *, n_pops, max_alleles,
                  interpret=False):
    """counts f32[K, L, A] of valid allele copies per (pop, locus, allele).

    z, geno int8[N, 2L] copy-major; site_valid bool[N, L].
    """
    n, l = site_valid.shape
    bn, bl = min(256, n), min(1024, -(-l // 128) * 128)
    zp = [_pad2(z[:, :l], bn, bl), _pad2(z[:, l:], bn, bl)]
    gp = [_pad2(geno[:, :l], bn, bl), _pad2(geno[:, l:], bn, bl)]
    vp = _pad2(site_valid.astype(jnp.int8), bn, bl)
    np_, lp = vp.shape
    grid = (lp // bl, np_ // bn)              # N axis minor: accumulation

    blk = pl.BlockSpec((bn, bl), lambda j, i: (i, j), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_counts_kernel, n_pops=n_pops,
                          max_alleles=max_alleles),
        grid=grid,
        in_specs=[blk] * 5,
        out_specs=pl.BlockSpec((n_pops * max_alleles, bl),
                               lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pops * max_alleles, lp),
                                       jnp.float32),
        interpret=interpret,
    )(*zp, *gp, vp)
    return (out[:, :l].reshape(n_pops, max_alleles, l)
            .transpose(0, 2, 1))              # [K, L, A]


# ---------------------------------------------------------------------------
# Kernel 2/3: the per-site pass — Z sample + counts + log-likelihoods
# ---------------------------------------------------------------------------

def _pass_flags(ll_kind, structure, sample):
    """(need_hom, need_zin, need_colv) — which optional operand groups the
    per-site pass consumes for the given log-likelihood family.

    When sampling, every z-conditioned family evaluates at the FRESHLY
    drawn z, still in registers — the sweep order is "Z then G/F | z" (a
    Gibbs-scan permutation of the reference's G/F-then-Z order with the
    same stationary distribution), which drops the two carried-z input
    planes from the hot pass.  Stored-step passes (sample=False) evaluate
    at the carried z planes."""
    need_hom = ll_kind in ("gen", "gendiff", "find", "fpop")
    need_zin = (not sample) and (
        (ll_kind in ("gen", "gendiff") and structure)
        or ll_kind in ("find", "fpop", "mode1"))
    need_colv = ll_kind in ("gen", "gendiff", "find")
    return need_hom, need_zin, need_colv


def _site_kernel(seed_ref, *refs, n_pops, max_alleles, sample, ll_kind,
                 n_col, structure, full_ll, n_l_blocks, block_l,
                 inkernel_prng, n_seed_words, carry_counts, packed):
    """One [bn, bl] block of the per-site sweep.

    ``ll_kind`` selects the log-likelihood family computed alongside the
    (optional) Z sampling:
      None     — sampling only
      "mode1"  — independent-copy cal_lkh at the FRESH z (mcmc.c:1869-1890)
      "gen"    — selfing-generation columns (log_ld_indv, mcmc.c:1726-1773);
                 ``structure`` picks structure- vs expectation-way;
                 ``full_ll`` False sums the full per-site formula per column
                 (the G-update pair), True is identical here
      "find"   — per-individual inbreeding F columns (log_ld_F_indv,
                 mcmc.c:1813-1847): full_ll=False sums the F-dependent
                 same-z sites only (the MH ratio terms, update_F_IND),
                 full_ll=True is cal_lkh's full where(same, joint, indep)
      "fpop"   — per-pop F (log_ld_F_pop, mcmc.c:1776-1810): full_ll=False
                 emits the per-(individual, pop) MH log-ratio sums between
                 column 0 (current) and column 1 (proposed); full_ll=True
                 is cal_lkh with f = rates[z0]

    Ref order (inputs): q, freq_rows, then either bits (one packed int8
    plane: bit0 copy-0 allele, bit1 copy-1 allele, bit2 valid; ``packed``,
    diploid-biallelic only) or geno0, geno1, valid, hom?; then
    z0_in?, z1_in?, colv (bn, n_col)?, fvals (K, n_col) in SMEM?, u0?, u1?
    Outputs: z0_out?, z1_out?, cnt (bn, K)?, cnt_la ([K*A, L] resident)?,
    ll (bn, n_out)?  The ? groups are present per the static flags.

    When sampling, the [K, L, A] allele-pop counts of the FRESH z are also
    accumulated (cnt_la) so the next step's P update needs no extra pass
    over the site tensors — the z values are already in registers here.
    cnt_la is a full-array resident output (block index constant) because
    its reduction axis (N-blocks) is the major grid axis.
    """
    need_hom, need_zin, need_colv = _pass_flags(ll_kind, structure, sample)
    need_ll = ll_kind is not None

    carry_counts = carry_counts and sample
    it = iter(refs)
    q_ref = next(it)
    freq_ref = next(it)
    g0f = g1f = None
    if packed:
        # one int8 plane carries the whole site (dataset.bits2): allele
        # bits come out as the 0/1 floats the biallelic path needs anyway,
        # hom is bit0 == bit1 — no separate geno/valid/hom loads
        si = next(it)[:].astype(jnp.int32)
        g0 = si & 1
        g1 = (si >> 1) & 1
        g0f = g0.astype(jnp.float32)
        g1f = g1.astype(jnp.float32)
        valid = (si & 4) != 0
        hom = ((g0f - g1f) == 0.0) if need_hom else None
    else:
        g0 = next(it)[:].astype(jnp.int32)
        g1 = next(it)[:].astype(jnp.int32)
        valid = next(it)[:] != 0
        hom = next(it)[:] != 0 if need_hom else None
    z0_in = next(it)[:].astype(jnp.int32) if need_zin else None
    z1_in = next(it)[:].astype(jnp.int32) if need_zin else None
    colv_ref = next(it) if need_colv else None
    fvals_ref = next(it) if ll_kind == "fpop" else None
    u0 = None if inkernel_prng else next(it)[:]
    u1 = None if inkernel_prng else next(it)[:]
    outs = list(it)
    oi = 0
    cnt_la_ref = None
    if sample:
        if carry_counts:
            z0_out, z1_out, cnt_ref, cnt_la_ref = outs[:4]
            oi = 4
        else:
            z0_out, z1_out, cnt_ref = outs[:3]
            oi = 3
    ll_ref = outs[oi] if need_ll else None

    a2 = max_alleles == 2
    i = pl.program_id(0)
    j = pl.program_id(1)
    if inkernel_prng and sample:
        # Two-slot seeding (Mosaic supports at most 2 seed words): slot 0
        # is the first key word, slot 1 the second key word XOR the block
        # id.  The key words come from threefry split/fold_in so they are
        # uniform 64-bit per (chain, step); XOR-folding the block id keeps
        # the pair uniform per (chain, step, block).  Never a linear
        # ``seed + block`` offset of one 31-bit word, which collides by
        # birthday across steps x chains x blocks (ADVICE r1).
        block = i * n_l_blocks + j
        if n_seed_words >= 2:
            pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ block)
        else:
            pltpu.prng_seed(seed_ref[0], block)

    @pl.when(j == 0)
    def _init():
        if sample:
            cnt_ref[:] = jnp.zeros_like(cnt_ref)
        if need_ll:
            ll_ref[:] = jnp.zeros_like(ll_ref)

    if carry_counts:
        @pl.when(jnp.logical_and(i == 0, j == 0))
        def _init_la():
            cnt_la_ref[:] = jnp.zeros_like(cnt_la_ref)

    # Per-copy per-pop allele probability w_k = freq[k, l, a_{nl}].
    #
    # Biallelic fast path (a2): w_k(g) = f0_k + d_k * g with d_k = f1_k -
    # f0_k, so everything the sweep needs is AFFINE in the allele
    # indicator g — the categorical CDF prefixes cum_j = sum_{k<=j} q_k
    # w_k(g) become cum_j = A_j + B_j * g with the A/B prefix planes built
    # once (shared by both copies), the mixture probability is the full
    # prefix, and w at a given z is two row selects + one fma.  Count
    # masses (z == k) fall out of the inverse-CDF indicators for free:
    # z = sum_j 1[u*tot > cum_j], so (z == k) = ind_{k-1} - ind_k.  This
    # replaces the generic path's K full [bn, bl] w planes + fresh
    # compares with ~60% fewer VPU ops per site; the generic path below
    # stays for max_alleles > 2.
    if a2:
        f0r = [freq_ref[kk * 2, :][None, :] for kk in range(n_pops)]
        dr = [freq_ref[kk * 2 + 1, :][None, :] - f0r[kk]
              for kk in range(n_pops)]
        if g0f is None:
            g0f = (g0 == 1).astype(jnp.float32)
            g1f = (g1 == 1).astype(jnp.float32)

        def sel_rows(rows, zc):
            out = rows[0]
            for kk in range(1, n_pops):
                out = jnp.where(zc == kk, rows[kk], out)
            return out

        def at_z2(zc, gf):
            return sel_rows(f0r, zc) + sel_rows(dr, zc) * gf

        need_mix = (sample
                    or (ll_kind in ("gen", "gendiff") and not structure))
        A = B = None
        if need_mix:
            qcols = [q_ref[:, kk][:, None] for kk in range(n_pops)]
            cumA, cumB = qcols[0] * f0r[0], qcols[0] * dr[0]
            A, B = [cumA], [cumB]
            for kk in range(1, n_pops):
                cumA = cumA + qcols[kk] * f0r[kk]
                cumB = cumB + qcols[kk] * dr[kk]
                A.append(cumA)
                B.append(cumB)
    else:
        def w_of(gc):
            ws = []
            for k in range(n_pops):
                w = jnp.zeros(gc.shape, jnp.float32)
                for a in range(max_alleles):
                    row = freq_ref[k * max_alleles + a, :][None, :]
                    w = jnp.where(gc == a, row, w)
                ws.append(w)
            return ws

        w0 = w_of(g0)
        w1 = w_of(g1)

    z0 = z1 = None
    ind0 = ind1 = tot0 = tot1 = z0s = z1s = None
    if sample:
        vf = valid.astype(jnp.float32)
        if a2:
            # inverse-CDF via the affine prefixes: ind_j = u*tot > cum_j
            def draw2(gf, u01):
                tot = A[-1] + B[-1] * gf
                if u01 is None:
                    bits = pltpu.prng_random_bits(tot.shape)
                    u01 = ((bits & 0x7FFFFF).astype(jnp.float32)
                           * (1.0 / (1 << 23)))
                ut = u01 * tot
                indf = [(ut > A[jj] + B[jj] * gf).astype(jnp.float32)
                        for jj in range(n_pops - 1)]
                return indf, tot

            ind0, tot0 = draw2(g0f, u0)
            ind1, tot1 = draw2(g1f, u1)

            def zsum(indf):
                if not indf:
                    return jnp.zeros(g0f.shape, jnp.float32)
                s = indf[0]
                for t in indf[1:]:
                    s = s + t
                return s

            z0s, z1s = zsum(ind0), zsum(ind1)
            z0_out[:] = z0s.astype(jnp.int8)
            z1_out[:] = z1s.astype(jnp.int8)

            # Counting straight off the draw indicators — the per-pop mass
            # planes (z == k) = ind_{k-1} - ind_k never materialize:
            # row/column sums of iv_j = ind_j * vf telescope into both the
            # per-individual pop counts and the [K*A, L] allele-pop counts
            # (update_ZQ's qq_num, mcmc.c:1180-1189; update_P's counting
            # loop, mcmc.c:815-845).
            col = pl.multiple_of(j * block_l, block_l)
            rv = vf.sum(axis=1)
            if n_pops == 1:
                cnt_ref[:, 0] += 2.0 * rv
            else:
                iv0 = [ind0[jj] * vf for jj in range(n_pops - 1)]
                iv1 = [ind1[jj] * vf for jj in range(n_pops - 1)]
                rs0 = [x.sum(axis=1) for x in iv0]
                rs1 = [x.sum(axis=1) for x in iv1]
                cnt_ref[:, 0] += 2.0 * rv - rs0[0] - rs1[0]
                for kk in range(1, n_pops - 1):
                    cnt_ref[:, kk] += ((rs0[kk - 1] - rs0[kk])
                                       + (rs1[kk - 1] - rs1[kk]))
                cnt_ref[:, n_pops - 1] += rs0[-1] + rs1[-1]
            if carry_counts:
                def colsum(x):
                    return x.sum(axis=0, keepdims=True)

                s_prev = 2.0 * colsum(vf)
                t_prev = colsum(vf * (g0f + g1f))
                for kk in range(n_pops):
                    if kk < n_pops - 1:
                        s_k = colsum(iv0[kk] + iv1[kk])
                        t_k = colsum(iv0[kk] * g0f + iv1[kk] * g1f)
                    else:
                        s_k = t_k = 0.0
                    ones = t_prev - t_k
                    cnt_la_ref[2 * kk:2 * kk + 1,
                               pl.ds(col, block_l)] += (s_prev - s_k) - ones
                    cnt_la_ref[2 * kk + 1:2 * kk + 2,
                               pl.ds(col, block_l)] += ones
                    s_prev, t_prev = s_k, t_k
        else:
            # z_c ~ Cat_k(q_k * w_c_k) by inverse-CDF (update_ZQ,
            # mcmc.c:1146)
            def draw(ws, u01):
                terms = [q_ref[:, k][:, None] * ws[k]
                         for k in range(n_pops)]
                total = terms[0]
                for t in terms[1:]:
                    total = total + t
                if u01 is None:
                    bits = pltpu.prng_random_bits(total.shape)
                    u01 = ((bits & 0x7FFFFF).astype(jnp.float32)
                           * (1.0 / (1 << 23)))
                u = u01 * total
                zc = jnp.zeros(total.shape, jnp.int32)
                cum = jnp.zeros_like(total)
                for k in range(n_pops - 1):
                    cum = cum + terms[k]
                    zc = zc + (u > cum).astype(jnp.int32)
                return zc

            z0 = draw(w0, u0)
            z1 = draw(w1, u1)
            z0_out[:] = z0.astype(jnp.int8)
            z1_out[:] = z1.astype(jnp.int8)
            m0l = [(z0 == k).astype(jnp.float32) for k in range(n_pops)]
            m1l = [(z1 == k).astype(jnp.float32) for k in range(n_pops)]

            col = pl.multiple_of(j * block_l, block_l)
            for k in range(n_pops):
                m0 = m0l[k] * vf
                m1 = m1l[k] * vf
                cnt_ref[:, k] += (m0 + m1).sum(axis=1)
                if not carry_counts:
                    continue
                # allele-pop counts of the fresh z (update_P's counting
                # loop, mcmc.c:815-845) — accumulated into the resident
                # [K*A, L] out
                for a in range(max_alleles):
                    v = ((m0 * (g0 == a).astype(jnp.float32)
                          + m1 * (g1 == a).astype(jnp.float32))
                         .sum(axis=0, keepdims=True))
                    r = k * max_alleles + a
                    cnt_la_ref[r:r + 1, pl.ds(col, block_l)] += v

    def at_z(ws, zc):
        p = ws[0]
        for k in range(1, n_pops):
            p = jnp.where(zc == k, ws[k], p)
        return p

    def at_fresh2(indf, gf):
        """w at the freshly-drawn z from the draw indicators: selecting
        row k by z is a telescoping sum row_0 + sum_j ind_j (row_{j+1} -
        row_j) since ind_j = 1[z > j]."""
        f0z, dz = f0r[0], dr[0]
        for jj in range(n_pops - 1):
            f0z = f0z + indf[jj] * (f0r[jj + 1] - f0r[jj])
            dz = dz + indf[jj] * (dr[jj + 1] - dr[jj])
        return f0z + dz * gf

    def cond_p(copy):
        """w of the given copy at its conditioning z — the fresh draw when
        sampling (indicators/registers), else the carried z plane."""
        gf = g0f if copy == 0 else g1f
        if sample:
            if a2:
                return at_fresh2(ind0 if copy == 0 else ind1, gf)
            return at_z(w0 if copy == 0 else w1, z0 if copy == 0 else z1)
        if a2:
            return at_z2(z0_in if copy == 0 else z1_in, gf)
        return at_z(w0 if copy == 0 else w1, z0_in if copy == 0 else z1_in)

    def cond_same():
        """Copies share one pop at the conditioning z."""
        if sample:
            return ((z0s - z1s) == 0.0) if a2 else ((z0 - z1) == 0)
        # (a - b) != 0 rather than a != b: see the i8 vector cmp note
        return (z0_in - z1_in) == 0

    if ll_kind == "mode1":
        # cal_lkh at z (log_ld_noselfing_indv, mcmc.c:1869-1890): the
        # freshly-drawn z when sampling, the carried z on a deferred
        # stored-step pass
        p0, p1 = cond_p(0), cond_p(1)
        # (g0 - g1) != 0 rather than g0 != g1: Mosaic folds an eq of two
        # i8->i32 converts back into an unsupported i8 vector cmp
        het_f = ((g0 - g1) != 0).astype(jnp.float32)
        site = _log(p0) + _log(p1) + het_f * _LOG2
        vf = valid.astype(jnp.float32)
        ll_ref[:, 0] += (site * vf).sum(axis=1)
        return

    if ll_kind is None:
        return

    vf = valid.astype(jnp.float32)

    if ll_kind == "gendiff":
        # Single-column MH log-ratio for the G update (update_G,
        # mcmc.c:1053-1091): sum_sites log gf(g_prop) - log gf(g_cur).
        # Factoring gf_hom = p0 (1 - (1-p0) w) and gf_het = 2 p0 p1 w
        # (genofreq, mcmc.c:1683-1703), the log p0 / log 2 p0 p1 terms
        # cancel in the ratio: het sites contribute the per-row constant
        # log(w_p / w_c), (structure-way) z-mismatched sites contribute 0,
        # and only hom same-z sites need a per-site log — ~4x fewer
        # transcendentals than differencing two "gen" columns.
        if structure:
            p0 = cond_p(0)
            m = cond_same() & valid
        else:
            if a2:
                p0 = tot0 if tot0 is not None else A[-1] + B[-1] * g0f
            else:
                p0 = q_ref[:, 0][:, None] * w0[0]
                for k in range(1, n_pops):
                    p0 = p0 + q_ref[:, k][:, None] * w0[k]
            m = valid
        mh = (m & hom).astype(jnp.float32)
        mt = (m & jnp.logical_not(hom)).astype(jnp.float32)
        wc = colv_ref[:, 0][:, None]
        wp = colv_ref[:, 1][:, None]
        q1 = 1.0 - p0
        ratio = (jnp.maximum(1.0 - q1 * wp, _EPS)
                 / jnp.maximum(1.0 - q1 * wc, _EPS))
        dh = _log(colv_ref[:, 1]) - _log(colv_ref[:, 0])     # [bn]
        ll_ref[:, 0] += ((jnp.log(ratio) * mh).sum(axis=1)
                         + dh * mt.sum(axis=1))
        return

    if ll_kind == "gen":
        # selfing-generation columns; colv = 2^{1-g} precomputed host-side
        if structure:
            p0, p1 = cond_p(0), cond_p(1)
            same = cond_same()
            hom_f = hom.astype(jnp.float32)
            indep = _log(p0) + _log(p1) + (1.0 - hom_f) * _LOG2
        elif a2:
            if tot0 is not None:
                p0, p1 = tot0, tot1
            else:
                p0 = A[-1] + B[-1] * g0f
                p1 = A[-1] + B[-1] * g1f
        else:
            p0 = q_ref[:, 0][:, None] * w0[0]
            p1 = q_ref[:, 0][:, None] * w1[0]
            for k in range(1, n_pops):
                p0 = p0 + q_ref[:, k][:, None] * w0[k]
                p1 = p1 + q_ref[:, k][:, None] * w1[k]
        for gcol in range(n_col):
            wg = colv_ref[:, gcol][:, None]
            gf = jnp.where(hom,
                           p0 * p0 + p0 * (1.0 - p0) * (1.0 - wg),
                           2.0 * p0 * p1 * wg)
            site = _log(gf)
            if structure:
                site = jnp.where(same, site, indep)
            ll_ref[:, gcol] += (site * vf).sum(axis=1)
        return

    # inbreeding F families ("find" / "fpop"): z-conditioned copy probs
    p0 = cond_p(0)
    same = cond_same()
    hom_f = hom.astype(jnp.float32)
    same_f = same.astype(jnp.float32)

    def gf_log(f, p1):
        return _log(jnp.where(hom,
                              p0 * p0 * (1.0 - f) + p0 * f,
                              2.0 * p0 * p1 * (1.0 - f)))

    def f_ratio_log(f0, f1):
        """log gf(f1) - log gf(f0) with the p0 / 2 p0 p1 factors cancelled
        (gf_hom = p0 (p0 (1-f) + f), gf_het = 2 p0 p1 (1-f)): one log of a
        quotient instead of two full gf logs."""
        num = jnp.where(hom, p0 * (1.0 - f1) + f1, 1.0 - f1)
        den = jnp.where(hom, p0 * (1.0 - f0) + f0, 1.0 - f0)
        return jnp.log(jnp.maximum(num, _EPS) / jnp.maximum(den, _EPS))

    if ll_kind == "find":
        if full_ll:
            f = colv_ref[:, 0][:, None]
            p1 = cond_p(1)
            indep = _log(p0) + _log(p1) + (1.0 - hom_f) * _LOG2
            site = jnp.where(same, gf_log(f, p1), indep)
            ll_ref[:, 0] += (site * vf).sum(axis=1)
        else:
            # single diff column over the F-dependent same-z sites
            m = same_f * vf
            d = f_ratio_log(colv_ref[:, 0][:, None],
                            colv_ref[:, 1][:, None])
            ll_ref[:, 0] += (d * m).sum(axis=1)
        return

    # "fpop": f = fvals[z0, col] at the conditioning z — scalar telescoping
    # over the copy-0 draw indicators when sampling, SMEM selects otherwise
    def f_at_z0(c):
        if sample and a2:
            f = jnp.full(p0.shape, fvals_ref[0, c])
            for kk in range(n_pops - 1):
                f = f + ind0[kk] * (fvals_ref[kk + 1, c]
                                    - fvals_ref[kk, c])
            return f
        zc = z0 if sample else z0_in
        f = jnp.full(p0.shape, fvals_ref[0, c])
        for k in range(1, n_pops):
            f = jnp.where(zc == k, fvals_ref[k, c], f)
        return f

    def z0_mass(k):
        """(z0 == k) as f32 at the conditioning z."""
        if sample and a2:
            if n_pops == 1:
                return jnp.ones(p0.shape, jnp.float32)
            if k == 0:
                return 1.0 - ind0[0]
            if k == n_pops - 1:
                return ind0[k - 1]
            return ind0[k - 1] - ind0[k]
        zc = z0 if sample else z0_in
        return (zc == k).astype(jnp.float32)

    if full_ll:
        p1 = cond_p(1)
        indep = _log(p0) + _log(p1) + (1.0 - hom_f) * _LOG2
        site = jnp.where(same, gf_log(f_at_z0(0), p1), indep)
        ll_ref[:, 0] += (site * vf).sum(axis=1)
    else:
        m = same_f * vf
        d = f_ratio_log(f_at_z0(0), f_at_z0(1)) * m
        for k in range(n_pops):
            ll_ref[:, k] += (d * z0_mass(k)).sum(axis=1)


# VMEM budget for the resident [K*A, L_padded] f32 allele-count output of
# the sampling kernels.  Above this the fused pass drops the carried counts
# and the step recounts with the L-blocked `allele_counts` kernel instead —
# one extra int8 read pass, but compilable at any panel width.
_CNT_LA_VMEM_BUDGET = 4 * 1024 * 1024


def _site_pass(seed, q, freq, geno, site_valid, hom, z_in, colv, fvals, u,
               *, sample, ll_kind, n_col, structure, full_ll, interpret,
               carry_counts=True, bits2=None):
    n, l = site_valid.shape
    k, _, a = freq.shape
    bn, bl = min(128, max(8, n)), min(1024, -(-l // 128) * 128)
    np_, lp = n + (-n % bn), l + (-l % bl)
    grid = (np_ // bn, lp // bl)              # L axis minor: accumulation
    carry_counts = (carry_counts and sample
                    and k * a * lp * 4 <= _CNT_LA_VMEM_BUDGET)

    need_hom, need_zin, need_colv = _pass_flags(ll_kind, structure, sample)
    need_ll = ll_kind is not None
    packed = bits2 is not None and a == 2

    qp = jnp.pad(q, ((0, np_ - n), (0, 0)))
    freq_rows = jnp.pad(jnp.transpose(freq, (0, 2, 1)).reshape(k * a, l),
                        ((0, 0), (0, lp - l)))

    site_blk = pl.BlockSpec((bn, bl), lambda i, j, *_: (i, j),
                            memory_space=pltpu.VMEM)
    operands = [qp, freq_rows]
    in_specs = [
        pl.BlockSpec((bn, k), lambda i, j, *_: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k * a, bl), lambda i, j, *_: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    if packed:
        # one int8 plane (dataset.bits2) replaces geno x2 + valid (+ hom)
        operands.append(_pad2(bits2, bn, bl))
        in_specs.append(site_blk)
    else:
        operands += [_pad2(geno[:, :l], bn, bl), _pad2(geno[:, l:], bn, bl),
                     _pad2(site_valid.astype(jnp.int8), bn, bl)]
        in_specs += [site_blk] * 3
        if need_hom:
            operands.append(_pad2(hom.astype(jnp.int8), bn, bl))
            in_specs.append(site_blk)
    if need_zin:
        operands += [_pad2(z_in[:, :l], bn, bl), _pad2(z_in[:, l:], bn, bl)]
        in_specs += [pl.BlockSpec((bn, bl), lambda i, j, *_: (i, j),
                                  memory_space=pltpu.VMEM)] * 2
    if need_colv:
        operands.append(jnp.pad(colv, ((0, np_ - n), (0, 0))))
        in_specs.append(pl.BlockSpec((bn, n_col), lambda i, j, *_: (i, 0),
                                     memory_space=pltpu.VMEM))
    if ll_kind == "fpop":
        operands.append(jnp.asarray(fvals, jnp.float32))     # [K, n_col]
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    inkernel_prng = u is None
    if not inkernel_prng:
        operands += [jnp.pad(u[:, :l], ((0, np_ - n), (0, lp - l)),
                             constant_values=0.5),
                     jnp.pad(u[:, l:], ((0, np_ - n), (0, lp - l)),
                             constant_values=0.5)]
        in_specs += [pl.BlockSpec((bn, bl), lambda i, j, *_: (i, j),
                                  memory_space=pltpu.VMEM)] * 2

    out_shapes, out_specs = [], []
    if sample:
        out_shapes += [jax.ShapeDtypeStruct((np_, lp), jnp.int8)] * 2
        out_specs += [pl.BlockSpec((bn, bl), lambda i, j, *_: (i, j),
                                   memory_space=pltpu.VMEM)] * 2
        out_shapes.append(jax.ShapeDtypeStruct((np_, k), jnp.float32))
        out_specs.append(pl.BlockSpec((bn, k), lambda i, j, *_: (i, 0),
                                      memory_space=pltpu.VMEM))
        if carry_counts:
            # resident allele-pop counts of the fresh z: constant block idx
            out_shapes.append(jax.ShapeDtypeStruct((k * a, lp), jnp.float32))
            out_specs.append(pl.BlockSpec((k * a, lp),
                                          lambda i, j, *_: (0, 0),
                                          memory_space=pltpu.VMEM))
    if need_ll:
        if ll_kind == "mode1" or full_ll:
            n_out = 1
        elif ll_kind == "fpop":
            n_out = k
        elif ll_kind in ("gendiff", "find"):
            n_out = 1                  # single MH log-ratio column
        else:
            n_out = n_col
        out_shapes.append(jax.ShapeDtypeStruct((np_, n_out), jnp.float32))
        out_specs.append(pl.BlockSpec((bn, n_out), lambda i, j, *_: (i, 0),
                                      memory_space=pltpu.VMEM))

    seed_words = jnp.atleast_1d(jnp.asarray(seed, jnp.int32)).reshape(-1)
    kernel = functools.partial(
        _site_kernel, n_pops=k, max_alleles=a, sample=sample,
        ll_kind=ll_kind, n_col=n_col, structure=structure, full_ll=full_ll,
        n_l_blocks=grid[1], block_l=bl, inkernel_prng=inkernel_prng,
        n_seed_words=seed_words.shape[0], carry_counts=carry_counts,
        packed=packed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=out_specs)
    outs = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shapes,
                          interpret=interpret)(seed_words, *operands)

    res = {}
    oi = 0
    if sample:
        z = jnp.concatenate([outs[0][:n, :l], outs[1][:n, :l]], axis=1)
        res["z"] = z
        res["qqnum"] = outs[2][:n]
        if carry_counts:
            res["zcounts"] = (outs[3][:, :l].reshape(k, a, l)
                              .transpose(0, 2, 1))         # [K, L, A]
            oi = 4
        else:
            res["zcounts"] = None
            oi = 3
    if need_ll:
        res["ll"] = outs[oi][:n]
    return res


@functools.partial(jax.jit, static_argnames=("structure", "interpret"))
def zq_gen_pass(seed, q, freq, geno, site_valid, hom, z_old, wg_pair, *,
                structure, interpret=False, u=None, bits2=None):
    """Sequence point 2: sample z, count per-individual pops, and compute
    the G log-likelihood at the current and proposed generation counts.

    wg_pair f32[N, 2] = 2^{1-g} for (g_cur, g_prop).
    Returns (z int8[N, 2L], qqnum f32[N, K], ll f32[N, 2],
    zcounts f32[K, L, A] — allele-pop counts of the fresh z for the next
    step's P update).
    """
    r = _site_pass(seed, q, freq, geno, site_valid, hom, z_old, wg_pair,
                   None, u, sample=True, ll_kind="gen", n_col=2,
                   structure=structure, full_ll=False, interpret=interpret,
                   bits2=bits2)
    return r["z"], r["qqnum"], r["ll"], r["zcounts"]


@functools.partial(jax.jit, static_argnames=("structure", "interpret"))
def zq_gendiff_pass(seed, q, freq, geno, site_valid, hom, z_old, wg_pair, *,
                    structure, interpret=False, u=None, bits2=None):
    """Sequence point 2, production form: sample z, count per-individual
    pops, and emit the G-update MH log-ratio directly (one column — the
    difference of :func:`zq_gen_pass`'s two, computed with ~4x fewer logs).

    Returns (z, qqnum, ll_diff f32[N], zcounts)."""
    r = _site_pass(seed, q, freq, geno, site_valid, hom, z_old, wg_pair,
                   None, u, sample=True, ll_kind="gendiff", n_col=2,
                   structure=structure, full_ll=False, interpret=interpret,
                   bits2=bits2)
    return r["z"], r["qqnum"], r["ll"][:, 0], r["zcounts"]


@functools.partial(jax.jit, static_argnames=("interpret",))
def zq_sample_pass(seed, q, freq, geno, site_valid, *, interpret=False,
                   u=None, bits2=None):
    """Sampling-only sequence point 2 (mode 1 production path — the
    cal_lkh pass is deferred to stored steps via
    :func:`panel_loglik_mode1_pass`).
    Returns (z, qqnum, zcounts)."""
    r = _site_pass(seed, q, freq, geno, site_valid, None, None, None, None,
                   u, sample=True, ll_kind=None, n_col=0,
                   structure=True, full_ll=False, interpret=interpret,
                   bits2=bits2)
    return r["z"], r["qqnum"], r["zcounts"]


@functools.partial(jax.jit, static_argnames=("interpret",))
def panel_loglik_mode1_pass(freq, q, geno, site_valid, z, *,
                            interpret=False, bits2=None):
    """cal_lkh for mode 1 (log_ld_noselfing_indv, mcmc.c:1869-1890) at the
    carried z — the deferred stored-step companion of
    :func:`zq_sample_pass`."""
    r = _site_pass(jnp.zeros((), jnp.int32), q, freq, geno, site_valid,
                   None, z, None, None, None, sample=False,
                   ll_kind="mode1", n_col=0, structure=True, full_ll=True,
                   interpret=interpret, bits2=bits2)
    return r["ll"][:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def zq_mode1_pass(seed, q, freq, geno, site_valid, *, interpret=False,
                  u=None, bits2=None):
    """Sequence point 2 for mode 1 (no selfing): sample z + counts + the
    cal_lkh log-lik at the fresh z, all in one pass.
    Returns (z, qqnum, ll f32[N], zcounts f32[K, L, A])."""
    r = _site_pass(seed, q, freq, geno, site_valid, None, None, None, None,
                   u, sample=True, ll_kind="mode1", n_col=0,
                   structure=True, full_ll=True, interpret=interpret,
                   bits2=bits2)
    return r["z"], r["qqnum"], r["ll"][:, 0], r["zcounts"]


@functools.partial(jax.jit, static_argnames=("structure", "interpret"))
def panel_loglik_pass(freq, q, geno, site_valid, hom, z, wg, *,
                      structure, interpret=False, bits2=None):
    """Sequence point 3: cal_lkh (mcmc.c:1916-1942) for modes 2/3 —
    per-individual log-lik at the fresh (q, gen, z).  wg f32[N, 1]."""
    r = _site_pass(jnp.zeros((), jnp.int32), q, freq, geno, site_valid, hom,
                   z, wg, None, None, sample=False, ll_kind="gen", n_col=1,
                   structure=structure, full_ll=True, interpret=interpret,
                   bits2=bits2)
    return r["ll"][:, 0]


@functools.partial(jax.jit, static_argnames=("pop", "interpret"))
def zq_f_pass(seed, q, freq, geno, site_valid, hom, z_old, f_pair, *,
              pop, interpret=False, u=None, bits2=None):
    """Sequence point 2 for the inbreeding modes (4/5): sample z + counts
    and the F-dependent log-likelihood terms of the MH update.

    pop=True (mode 4): ``f_pair`` f32[K, 2] = (current, proposed) per pop;
    the third return is fdiff f32[N, K] — per-individual per-pop sums of
    log L(f'_k) - log L(f_k) over same-z sites (sum over N gives the MH
    log-ratio of update_inbreedcoff_POP, mcmc.c:986-1050, corrected).

    pop=False (mode 5): ``f_pair`` f32[N, 2]; the third return is
    lldiff f32[N] — the per-individual MH log-ratio
    log L(f'_i) - log L(f_i) over same-z sites (update_F_IND,
    mcmc.c:888-910), emitted as one column with the common p0 factors
    cancelled.

    Returns (z, qqnum, fdiff_or_lldiff, zcounts).
    """
    if pop:
        r = _site_pass(seed, q, freq, geno, site_valid, hom, z_old, None,
                       f_pair, u, sample=True, ll_kind="fpop", n_col=2,
                       structure=True, full_ll=False, interpret=interpret,
                       bits2=bits2)
        return r["z"], r["qqnum"], r["ll"], r["zcounts"]
    r = _site_pass(seed, q, freq, geno, site_valid, hom, z_old, f_pair,
                   None, u, sample=True, ll_kind="find", n_col=2,
                   structure=True, full_ll=False, interpret=interpret,
                   bits2=bits2)
    return r["z"], r["qqnum"], r["ll"][:, 0], r["zcounts"]


@functools.partial(jax.jit, static_argnames=("pop", "interpret"))
def panel_loglik_f_pass(freq, geno, site_valid, hom, z, f, *, pop,
                        interpret=False, bits2=None):
    """cal_lkh for modes 4/5 (log_ld_F_pop/indv, mcmc.c:1776-1847) at the
    fresh (P, F, Z).  f is f32[K, 1] (pop=True) or f32[N, 1]."""
    n = geno.shape[0]
    k = freq.shape[0]
    dummy_q = jnp.zeros((n, k), jnp.float32)
    if pop:
        r = _site_pass(jnp.zeros((), jnp.int32), dummy_q, freq, geno,
                       site_valid, hom, z, None, f, None, sample=False,
                       ll_kind="fpop", n_col=1, structure=True,
                       full_ll=True, interpret=interpret, bits2=bits2)
    else:
        r = _site_pass(jnp.zeros((), jnp.int32), dummy_q, freq, geno,
                       site_valid, hom, z, f, None, None, sample=False,
                       ll_kind="find", n_col=1, structure=True,
                       full_ll=True, interpret=interpret, bits2=bits2)
    return r["ll"][:, 0]
