"""Per-mode composition of update kernels into one fused MCMC step.

One call = one full sweep of the reference's step loop for the selected mode
(the bodies of mcmc_POP_no_admixture .. mcmc_INDV_inbreedcoff,
mcmc.c:90-468).  The returned function is pure `(state, key) -> state` and is
designed to be jitted once and driven by `lax.scan`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from instruct_tpu.config import ModelSpec, PriorFamily
from instruct_tpu.data.dataset import Dataset
from instruct_tpu.mcmc import updates as up
from instruct_tpu.mcmc.state import McmcState
from instruct_tpu.model import likelihood as lk


def _cal_lkh(spec: ModelSpec, data: Dataset, state: McmcState) -> McmcState:
    """cal_lkh (mcmc.c:1916-1942): per-individual and total log-lik."""
    if spec.mode == 0 and spec.ploid == 2:
        ll_matrix = lk.loglik_matrix_nopop_admix(data, state.freq)
        indv = jnp.take_along_axis(ll_matrix, state.zz[:, None], axis=1)[:, 0]
    else:
        indv = lk.per_indv_loglik(spec, data, state.freq, state.z, state.q,
                                  state.gen if spec.has_selfing else None,
                                  state.rates if state.rates.size else None)
    return state._replace(loglik_indv=indv, loglik_total=indv.sum())


def build_step(spec: ModelSpec, data: Dataset) -> Callable:
    """Return `step(state, key) -> state` for the given mode.

    Update order per mode matches the reference loops exactly:
      mode 0: P, Z, lkh                       (mcmc.c:111-115)
      mode 1: P, ZQ, alpha, lkh               (mcmc.c:150-155)
      mode 2: P, S_pop, G, ZQ, alpha, lkh     (mcmc.c:208-215)
      mode 3: P, S_ind|DPM, G, ZQ, alpha, lkh (mcmc.c:334-348)
      mode 4: P, F_pop, ZQ, alpha, lkh        (mcmc.c:263-269)
      mode 5: P, F_ind|DPM, ZQ, alpha, lkh    (mcmc.c:420-434)
    """
    if spec.ploid == 4:
        from instruct_tpu.tetra.engine import build_tetra_step
        return build_tetra_step(spec, data)
    if spec.mode not in (0, 1, 2, 3, 4, 5):
        raise ValueError(f"unknown mode {spec.mode}")

    dpm = (spec.priors.family == PriorFamily.DPM and spec.mode in (3, 5))
    normal = (spec.priors.family == PriorFamily.NORMAL
              and spec.mode in (3, 5))
    if dpm:
        from instruct_tpu.mcmc.dpm import build_dpm_update
        dpm_update = build_dpm_update(spec, data)

    def step(state: McmcState, key: jax.Array) -> McmcState:
        kp, ks, kg, kz, ka = jax.random.split(key, 5)

        freq = up.update_freq(kp, spec, data, state.z, state.zz)
        state = state._replace(freq=freq)

        if spec.mode == 0:
            zz = up.update_z_noadmix(kz, data, freq)
            return _cal_lkh(spec, data, state._replace(zz=zz))

        if spec.mode == 2:
            rates, ais = up.update_s_pop(ks, spec, state.q, state.gen,
                                         state.rates, state.ais_state)
            state = state._replace(rates=rates, ais_state=ais)
        elif spec.mode == 3:
            if dpm:
                state = dpm_update(ks, state)
            else:
                pm = state.prior_mu if normal else None
                ps2 = state.prior_sigma2 if normal else None
                rates = up.update_s_ind(ks, spec, state.gen, state.rates,
                                        pm, ps2)
                state = state._replace(rates=rates)
                if normal:
                    mu, s2 = up.update_normal_hyper(
                        jax.random.fold_in(ks, 1), rates, spec.priors)
                    state = state._replace(prior_mu=mu, prior_sigma2=s2)
        elif spec.mode == 4:
            rates, ais = up.update_f_pop(ks, spec, data, freq, state.z,
                                         state.rates, state.ais_state)
            state = state._replace(rates=rates, ais_state=ais)
        elif spec.mode == 5:
            if dpm:
                state = dpm_update(ks, state)
            else:
                pm = state.prior_mu if normal else None
                ps2 = state.prior_sigma2 if normal else None
                rates = up.update_f_ind(ks, spec, data, freq, state.z,
                                        state.rates, pm, ps2)
                state = state._replace(rates=rates)
                if normal:
                    mu, s2 = up.update_normal_hyper(
                        jax.random.fold_in(ks, 1), rates, spec.priors)
                    state = state._replace(prior_mu=mu, prior_sigma2=s2)

        if spec.has_selfing:
            gen = up.update_gen(kg, spec, data, freq, state.z, state.q,
                                state.rates, state.gen)
            state = state._replace(gen=gen)

        z, q, _ = up.update_zq(kz, spec, data, freq, state.q, state.alpha)
        state = state._replace(z=z, q=q)

        alpha = up.update_alpha(ka, spec, q, state.alpha)
        state = state._replace(alpha=alpha)

        return _cal_lkh(spec, data, state)

    return step
