"""DIC-based selection of the number of subpopulations K.

Mirrors inf_K_val (InStruct.c:536-601): sweep K in [n_small, n_large]
(default upper bound N^0.3 + 1, InStruct.c:547-548), run all chains per K,
pick the K minimising the per-K minimum DIC over chains (InStruct.c:588-592).

Two deliberate departures from the reference, per SURVEY.md §2.1:

* Selection ranks on an information criterion with a REAL complexity
  penalty.  The reference's DIC degenerates to -2 E[logL] (its "plug-in"
  term re-uses the posterior-mean log-lik, result_analysis.c:403-411), so
  it can never prefer a smaller K.  We compute the corrected DIC
  (RunResult.dic: Dbar + pD, plug-in at the posterior means) AND WAIC
  (RunResult.waic) and rank on **WAIC under the one-standard-error rule**
  (smallest K whose chain-mean WAIC is within one SE of the minimum,
  Hastie et al., ESL §7.10): mixture posteriors are singular, and when K
  exceeds the truth the redundant clusters wander — blurring the
  posterior-mean plug-in so DIC's pD collapses exactly when it must grow —
  or capture single individuals, the influential-fit regime WAIC's
  quadratic penalty undercounts; past the true K both criteria therefore
  plateau within their sampling noise instead of rising.  The 1-SE rule
  reads the plateau: measured on synthetic K=2/3 panels it recovers the
  generating K across seeds where both raw minima drift to K_max
  (tests/test_dic.py).  All columns (WAIC+SE, corrected DIC+pD,
  reference DIC) are reported per K.
* Initial S/F values from the `-i` file are re-used across every K run
  (InStruct.c:563 passes the same `initial`): per-pop rate vectors are
  sliced/cycled to each K's width.

Each K is a separate jit specialisation (freq has shape [K, L, A]); the
chains within one K run vmapped/sharded as usual, so the sweep costs
K_num compiles but each runs at full device utilisation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import numpy as np

from instruct_tpu.config import ModelSpec, Schedule
from instruct_tpu.data.dataset import Dataset
from instruct_tpu.mcmc.driver import RunResult, run_mcmc


@dataclasses.dataclass
class KSelectResult:
    best_k: int
    dic: Dict[int, np.ndarray]            # per-K, per-chain corrected DIC
    results: Dict[int, RunResult]
    dic_reference: Dict[int, np.ndarray]  # reference-formula DIC per K/chain
    p_d: Dict[int, Optional[np.ndarray]]  # effective parameter count
    gelman_rubin: Dict[int, Optional[float]]  # per-K GR of the log-lik trace
    waic: Dict[int, Optional[np.ndarray]] = None  # per-K, per-chain WAIC
    #   (the selection statistic when available)
    waic_se: Dict[int, Optional[float]] = None    # per-K WAIC standard error
    n_small: int = 1
    n_large: int = 1


def _rates_for_k(init_rates, r: int):
    """Adapt a [n_chains, R0] initial-rates matrix to a K run needing R
    values per chain: slice when wide enough, cycle columns otherwise
    (the reference reuses the same `initial` across K, InStruct.c:563)."""
    if init_rates is None or r == 0:
        return None
    init_rates = np.asarray(init_rates)
    r0 = init_rates.shape[1]
    if r0 >= r:
        return init_rates[:, :r]
    reps = -(-r // r0)
    return np.tile(init_rates, (1, reps))[:, :r]


def infer_k(
    data: Dataset,
    spec: ModelSpec,
    sched: Schedule,
    key: jax.Array,
    n_small: int = 1,
    n_large: int = 0,
    mesh=None,
    init_rates=None,
    **run_kwargs,
) -> KSelectResult:
    if n_large < 1 or n_small < 1 or n_small > n_large:
        n_small = 1
        n_large = int(data.n_indv ** 0.3) + 1  # InStruct.c:547-548
    # the corrected DIC needs the posterior-mean P for its plug-in pass
    run_kwargs.setdefault("track_freq", spec.ploid == 2)
    dic: Dict[int, np.ndarray] = {}
    dic_ref: Dict[int, np.ndarray] = {}
    waic: Dict[int, Optional[np.ndarray]] = {}
    waic_se: Dict[int, Optional[float]] = {}
    p_d: Dict[int, Optional[np.ndarray]] = {}
    gr: Dict[int, Optional[float]] = {}
    results: Dict[int, RunResult] = {}
    for k in range(n_small, n_large + 1):
        spec_k = dataclasses.replace(spec, n_pops=k)
        res = run_mcmc(data, spec_k, sched, jax.random.fold_in(key, k),
                       init_rates=_rates_for_k(init_rates,
                                               spec_k.n_rates(data.n_indv)),
                       mesh=mesh, **run_kwargs)
        results[k] = res
        dic[k] = res.dic()
        dic_ref[k] = res.dic_reference()
        waic[k] = res.waic()
        waic_se[k] = res.waic_se()
        p_d[k] = res.p_d()
        if sched.n_chains > 1:
            from instruct_tpu.diagnostics import gelman_rubin
            gr[k] = float(gelman_rubin(np.asarray(res.accum.convg_ld)))
        else:
            gr[k] = None
    # rank on the chain-mean WAIC under the one-standard-error rule when
    # every K produced one (diploid); else min-DIC over chains, as
    # inf_K_val does (InStruct.c:588-592)
    if all(w is not None for w in waic.values()):
        wmean = {k: float(w.mean()) for k, w in waic.items()}
        k_min = min(wmean, key=wmean.get)
        tol = wmean[k_min] + (waic_se[k_min] or 0.0)
        best_k = min(k for k, w in wmean.items() if w <= tol)
    else:
        best_k = min(dic, key=lambda k: dic[k].min())
    return KSelectResult(best_k=best_k, dic=dic, results=results,
                         dic_reference=dic_ref, p_d=p_d, gelman_rubin=gr,
                         waic=waic, waic_se=waic_se,
                         n_small=n_small, n_large=n_large)
