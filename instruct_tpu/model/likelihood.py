"""Fused genotype-likelihood math for the InStruct model family.

Pure functions over dense tensors; everything is written to fuse into a
handful of XLA kernels over the [N, L] site grid.  Reference parity:

  * :func:`genofreq_selfing`      — genofreq(), mcmc.c:1683-1703.
  * :func:`genofreq_inbreeding`   — genofreq_inbreedcoff(), mcmc.c:1707-1723.
  * :func:`site_loglik`           — the per-(indiv,locus) bodies of
    log_ld_indv / log_ld_F_pop / log_ld_F_indv / log_ld_noselfing_indv
    (mcmc.c:1726-1890).
  * :func:`loglik_matrix_nopop_admix` — log_ld_indv_K (mcmc.c:1893-1914),
    vectorized to all (i, K) pairs at once as a single MXU matmul.

Shape conventions: freq f32[K, L, A]; geno i32[N, L, P]; z i32[N, L, P];
q f32[N, K]; gen i32[N] or f32[N]; per-site outputs f32[N, L].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from instruct_tpu.config import ModelSpec
from instruct_tpu.data.dataset import Dataset

_LOG2 = 0.6931471805599453
_EPS = 1e-30  # guards log(0) for Dirichlet draws that underflow


def genofreq_selfing(p0, p1, hom, gen):
    """Genotype frequency after `gen` generations of selfing.

    Homozygote:   p0^ploid + p0(1-p0) (1 - 2^{1-gen})
    Heterozygote: 2 p0 p1 2^{1-gen}

    Matches the loop in genofreq() (mcmc.c:1688-1702): the reference
    accumulates sum_{i=1}^{g-1} p(1-p)/2^i which telescopes to the closed
    form above; the heterozygote branch is explicit at mcmc.c:1700.
    """
    w = jnp.exp2(1.0 - jnp.asarray(gen, dtype=p0.dtype))
    hom_freq = p0 * p0 + p0 * (1.0 - p0) * (1.0 - w)
    het_freq = 2.0 * p0 * p1 * w
    return jnp.where(hom, hom_freq, het_freq)


def genofreq_inbreeding(p0, p1, hom, f):
    """Genotype frequency under inbreeding coefficient F
    (genofreq_inbreedcoff, mcmc.c:1707-1723):
    hom p^2(1-F) + pF ; het 2 p0 p1 (1-F)."""
    hom_freq = p0 * p0 * (1.0 - f) + p0 * f
    het_freq = 2.0 * p0 * p1 * (1.0 - f)
    return jnp.where(hom, hom_freq, het_freq)


def _safe_log(x):
    return jnp.log(jnp.maximum(x, _EPS))


def gather_freq_at_z(freq, geno, z):
    """p[n, l, c] = freq[z[n,l,c], l, geno[n,l,c]].

    The ubiquitous `ptr->freq[z...][j][seqdata...]` gather
    (e.g. mcmc.c:1756, 1793, 1830).
    """
    l_idx = jnp.arange(geno.shape[1])[None, :, None]
    return freq[z, l_idx, geno]


def gather_freq_all_pops(freq, geno):
    """p[n, l, c, k] = freq[k, l, geno[n,l,c]] — per-copy allele prob under
    every candidate pop, the inner quantity of the Z-Gibbs update
    (mcmc.c:1146)."""
    # freq: [K, L, A] -> [L, A, K]; gather on allele axis.
    freq_lak = jnp.transpose(freq, (1, 2, 0))
    l_idx = jnp.arange(geno.shape[1])[None, :, None]
    return freq_lak[l_idx, geno]  # [N, L, P, K]


def mixture_copy_probs(freq, geno, q):
    """Expectation-way per-copy probability: p[n,l,c] = sum_m q[n,m] *
    freq[m, l, geno[n,l,c]] (mcmc.c:1741-1745)."""
    per_pop = gather_freq_all_pops(freq, geno)          # [N, L, P, K]
    return jnp.einsum("nlpk,nk->nlp", per_pop, q)


def site_loglik(
    spec: ModelSpec,
    data: Dataset,
    freq: jnp.ndarray,
    z: jnp.ndarray,
    q: jnp.ndarray | None,
    gen: jnp.ndarray | None,
    rates: jnp.ndarray | None,
) -> jnp.ndarray:
    """Per-site log-likelihood f32[N, L] for the admixture modes (1-5).

    Dispatches exactly like cal_lkh (mcmc.c:1916-1942):
      mode 1            -> log_ld_noselfing_indv body (mcmc.c:1869-1890)
      modes 2/3         -> log_ld_indv body (mcmc.c:1726-1773), honoring
                           spec.type_freq (expectation vs structure way)
      modes 4/5         -> log_ld_F_pop / log_ld_F_indv bodies
                           (mcmc.c:1776-1847)
    Invalid sites are forced to 0; callers sum over L.
    """
    geno = data.geno
    hom = data.hom
    het = ~hom

    if spec.mode in (2, 3) and spec.type_freq == 0:
        # Expectation way: mixture per-copy probs, no dependence on z.
        p = mixture_copy_probs(freq, geno, q)           # [N, L, P]
        g = gen[:, None].astype(p.dtype)
        site = _safe_log(genofreq_selfing(p[..., 0], p[..., 1], hom, g))
        return jnp.where(data.site_valid, site, 0.0)

    pz = gather_freq_at_z(freq, geno, z)                # [N, L, P]
    sum_log_pz = _safe_log(pz).sum(-1)
    indep = sum_log_pz + jnp.where(het, _LOG2, 0.0)     # product + het*log2
    if spec.mode == 1:
        site = indep                                    # mcmc.c:1877-1888
    else:
        same_z = jnp.all(z == z[:, :, :1], axis=-1)
        if spec.mode in (2, 3):
            g = gen[:, None].astype(pz.dtype)
            joint = _safe_log(
                genofreq_selfing(pz[..., 0], pz[..., 1], hom, g))
        else:  # modes 4/5: inbreeding coefficient
            if spec.mode == 4:
                f = rates[z[:, :, 0]]                   # F of pop z[...,0]
                # (log_ld_F_pop uses inbreed[z[i][j][0]], mcmc.c:1795)
            else:
                f = rates[:, None]                      # broadcast over loci
            joint = _safe_log(
                genofreq_inbreeding(pz[..., 0], pz[..., 1], hom, f))
        site = jnp.where(same_z, joint, indep)
    return jnp.where(data.site_valid, site, 0.0)


def per_indv_loglik(spec, data, freq, z, q, gen, rates) -> jnp.ndarray:
    """f32[N] per-individual log-lik (the `indvlkh` of cal_lkh,
    mcmc.c:1916-1942)."""
    return site_loglik(spec, data, freq, z, q, gen, rates).sum(axis=1)


def allele_count_matrix(data: Dataset) -> jnp.ndarray:
    """cnt f32[N, L*A]: per individual, per (locus, allele) slot, the number
    of valid copies carrying that allele.  Reused by mode-0 likelihood and
    the no-admixture P-count (update_P's mode==0 branch, mcmc.c:825-831)."""
    n, l, p = data.geno.shape
    a = data.allele_valid.shape[1]
    oh = jax.nn.one_hot(data.geno, a, dtype=jnp.float32)    # [N, L, P, A]
    oh = oh * data.site_valid[:, :, None, None]
    return oh.sum(axis=2).reshape(n, l * a)


def loglik_matrix_nopop_admix(data: Dataset, freq: jnp.ndarray) -> jnp.ndarray:
    """ll f32[N, K]: log-lik of each individual under a single-pop assignment
    to every k — log_ld_indv_K (mcmc.c:1893-1914) for all (i, K) as one
    matmul: ll = cnt @ log(freq)^T + het_bonus."""
    n, l, _p = data.geno.shape
    a = data.allele_valid.shape[1]
    cnt = allele_count_matrix(data)                          # [N, L*A]
    logf = _safe_log(jnp.maximum(freq, 0.0))
    logf = jnp.where(data.allele_valid[None], logf, 0.0).reshape(-1, l * a)
    ll = cnt @ logf.T                                        # [N, K]
    het_bonus = (jnp.where(~data.hom, _LOG2, 0.0)
                 * data.site_valid).sum(axis=1)
    return ll + het_bonus[:, None]
