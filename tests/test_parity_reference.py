"""Golden-posterior parity against the compiled reference binary
(BASELINE.json north-star: posterior means of S and Q match within
Monte-Carlo error on the reference's example configs).

The reference's shared-stream Wichmann-Hill RNG makes bitwise parity
impossible by design (survey §2.2); parity is statistical: both samplers
target the same posterior, so long-run means must agree within MC error.
"""

import shutil
import subprocess

import jax
import numpy as np
import pytest

from instruct_tpu.config import ModelSpec, Schedule
from instruct_tpu.data.loader import read_data, write_panel
from instruct_tpu.data.synthetic import synthetic_panel
from instruct_tpu.mcmc.driver import run_mcmc

from _refbinary import (build_reference, parse_q_matrix,
                        parse_selfing_rates, run_reference)

gcc_missing = shutil.which("gcc") is None


@pytest.fixture(scope="module")
def ref_exe():
    if gcc_missing:
        pytest.skip("gcc not available")
    return build_reference()


@pytest.fixture(scope="module")
def parity_setup(tmp_path_factory, ref_exe):
    """One moderately-sized mode-2 run of the C binary + our engine."""
    tmp = tmp_path_factory.mktemp("parity")
    panel = synthetic_panel(n_indv=60, n_loci=60, n_pops=2, n_alleles=2,
                            selfing_rates=np.array([0.1, 0.75]),
                            admixture_alpha=0.05, missing_rate=0.02,
                            seed=123)
    datafile = tmp / "panel.txt"
    write_panel(panel, str(datafile))
    outfile = tmp / "ref_out.txt"
    n_iter, burnin, thin = 12000, 6000, 5
    run_reference(ref_exe, datafile, outfile, panel.n_indv, panel.n_loci,
                  2, 2, n_iter, burnin, thin, chains=1)

    # Reload through our parser so both engines see identical data.
    panel2 = read_data(str(datafile), ploid=2, log=open("/dev/null", "w"))
    spec = ModelSpec(mode=2, n_pops=2)
    sched = Schedule(n_iter=n_iter, burnin=burnin, thinning=thin,
                     n_chains=2, ckrep=100, nstep_check_empty_cluster=50)
    res = run_mcmc(panel2.data, spec, sched, jax.random.key(7))
    return panel2, outfile, res


def test_selfing_rate_parity(parity_setup):
    _, outfile, res = parity_setup
    ref_s = np.sort(parse_selfing_rates(outfile)[0])
    ours = np.sort(np.asarray(res.accum.mean.rates), axis=1)
    # Average our chains; compare sorted cluster rates.
    ours_mean = ours.mean(axis=0)
    assert ref_s.shape == ours_mean.shape
    np.testing.assert_allclose(ours_mean, ref_s, atol=0.06)


def test_q_matrix_parity(parity_setup):
    panel, outfile, res = parity_setup
    n = panel.n_indv
    ref_q = parse_q_matrix(outfile, n, 2)[0]          # [N, 2]
    ours = np.asarray(res.accum.mean.q).mean(axis=0)  # [N, 2]
    # resolve label switching: best of the two column permutations
    err_id = np.abs(ours - ref_q).mean()
    err_sw = np.abs(ours[:, ::-1] - ref_q).mean()
    assert min(err_id, err_sw) < 0.05, (err_id, err_sw)


def test_mode1_loglik_parity(ref_exe, tmp_path):
    """Admixture-only mode: posterior mean log-lik of both engines agree."""
    panel = synthetic_panel(n_indv=40, n_loci=50, n_pops=2, n_alleles=2,
                            admixture_alpha=0.05, seed=9)
    datafile = tmp_path / "p.txt"
    write_panel(panel, str(datafile))
    outfile = tmp_path / "o.txt"
    run_reference(ref_exe, datafile, outfile, 40, 50, 2, 1, 8000, 4000, 5)
    from _refbinary import parse_loglik_mean
    ref_ll = parse_loglik_mean(outfile)[0]

    panel2 = read_data(str(datafile), ploid=2, log=open("/dev/null", "w"))
    res = run_mcmc(panel2.data, ModelSpec(mode=1, n_pops=2),
                   Schedule(n_iter=8000, burnin=4000, thinning=5,
                            n_chains=1, ckrep=100,
                            nstep_check_empty_cluster=50),
                   jax.random.key(3))
    ours_ll = float(np.asarray(res.accum.mean.total_ll)[0])
    assert abs(ours_ll - ref_ll) / abs(ref_ll) < 0.02, (ours_ll, ref_ll)


def test_tetraploid_no_reference_parity_by_design():
    """Documented divergence (survey SS7: parity only where the reference is
    statistically correct): the reference's staged tetraploid selfing
    equilibrium (auto_genfreq, poly_geno.c:1803-2028) omits the
    simplex->duplex inheritance flow (a selfed iiij parent produces iijj
    with probability 1/4 via two ij gametes), so its implied transition
    matrix has a column summing to 3/4 and its genotype distribution loses
    probability mass (12.6% at s=0.6 on a biallelic locus).  Our
    gamete-enumeration matrix is column-stochastic and matches independent
    forward simulation (tests/test_tetra.py::test_equilibrium_matches_
    forward_simulation), so posterior-S parity with the binary is
    unattainable for a correct implementation and is excluded here."""
    import numpy as np
    from instruct_tpu.tetra.combinatorics import build_class_tables
    ct = build_class_tables(np.array([2]), autopoly=True)
    g = int(ct.g_count[0])
    a = ct.self_mat[0, :g, :g]
    # ours is stochastic...
    np.testing.assert_allclose(a.sum(0), 1.0, atol=1e-6)
    # ...while the reference's simplex column (derived from its live staged
    # recursion for n=2) sums to 3/4: self 1/2 + mono 1/4 + duplex 0.
    ref_simplex_column_sum = 0.5 + 0.25 + 0.0
    assert abs(ref_simplex_column_sum - 0.75) < 1e-12


def test_recoded_matrix_golden_parse(ref_exe, tmp_path):
    """Our loader's integer recode must equal the matrix the binary echoes
    (transform_data, data_interface.c:554-566) — the survey's golden parse
    anchor (survey SS7 build step 1)."""
    from _refbinary import parse_transformed_alleles
    panel = synthetic_panel(n_indv=12, n_loci=15, n_pops=2, n_alleles=3,
                            missing_rate=0.15, seed=44)
    datafile = tmp_path / "g.txt"
    write_panel(panel, str(datafile))
    res = run_reference(ref_exe, datafile, tmp_path / "go.txt", 12, 15, 2,
                        1, 40, 20, 2, extra=("-j", "5"))
    ref_mat = parse_transformed_alleles(res.stdout, 12, 15)
    panel2 = read_data(str(datafile), ploid=2, log=open("/dev/null", "w"))
    ours = panel2.data.geno3
    miss = ~np.asarray(panel2.data.site_valid)
    # missing sites: reference stores -9, ours stores 0 + mask
    np.testing.assert_array_equal(
        np.where(miss[:, :, None], -9, ours), ref_mat)


def test_mode4_inbreeding_parity(ref_exe, tmp_path):
    from _refbinary import parse_f_rates
    panel = synthetic_panel(n_indv=60, n_loci=60, n_pops=2, n_alleles=2,
                            selfing_rates=np.array([0.1, 0.8]),
                            admixture_alpha=0.05, seed=55)
    datafile = tmp_path / "f.txt"
    write_panel(panel, str(datafile))
    outfile = tmp_path / "fo.txt"
    run_reference(ref_exe, datafile, outfile, 60, 60, 2, 4, 12000, 6000, 5)
    ref_f = np.sort(parse_f_rates(outfile)[0])

    panel2 = read_data(str(datafile), ploid=2, log=open("/dev/null", "w"))
    res = run_mcmc(panel2.data, ModelSpec(mode=4, n_pops=2),
                   Schedule(n_iter=12000, burnin=6000, thinning=5,
                            n_chains=2, ckrep=100,
                            nstep_check_empty_cluster=50),
                   jax.random.key(21))
    ours = np.sort(np.asarray(res.accum.mean.rates), axis=1).mean(0)
    np.testing.assert_allclose(ours, ref_f, atol=0.08)


def test_mode0_classification_parity(ref_exe, tmp_path):
    from _refbinary import parse_classification
    panel = synthetic_panel(n_indv=40, n_loci=60, n_pops=2, n_alleles=2,
                            admixture_alpha=0.03, seed=66)
    datafile = tmp_path / "z.txt"
    write_panel(panel, str(datafile))
    outfile = tmp_path / "zo.txt"
    run_reference(ref_exe, datafile, outfile, 40, 60, 2, 0, 6000, 3000, 5)
    ref_q = parse_classification(outfile, 40, 2)
    ref_cls = ref_q.argmax(1)

    panel2 = read_data(str(datafile), ploid=2, log=open("/dev/null", "w"))
    res = run_mcmc(panel2.data, ModelSpec(mode=0, n_pops=2),
                   Schedule(n_iter=6000, burnin=3000, thinning=5,
                            n_chains=1, ckrep=100,
                            nstep_check_empty_cluster=50),
                   jax.random.key(31))
    ours_cls = np.asarray(res.accum.mean.q)[0].argmax(1)
    agree = max((ours_cls == ref_cls).mean(),
                (ours_cls == 1 - ref_cls).mean())
    assert agree >= 0.9, agree
