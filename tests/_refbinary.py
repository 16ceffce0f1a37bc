"""Helpers to build, run and parse the reference C binary for golden-parity
tests (survey §4 item 2: posterior means must match within MC error)."""

import os
import re
import shutil
import subprocess
from pathlib import Path

import numpy as np

REF_SRC = "/root/reference"
BUILD_DIR = "/tmp/refbuild"


def build_reference() -> str:
    """Compile the reference with its own makefile; cached."""
    exe = Path(BUILD_DIR) / "InStruct"
    if exe.exists():
        return str(exe)
    os.makedirs(BUILD_DIR, exist_ok=True)
    for f in Path(REF_SRC).glob("*.[ch]"):
        shutil.copy(f, BUILD_DIR)
    shutil.copy(Path(REF_SRC) / "makefile", BUILD_DIR)
    subprocess.run(["make"], cwd=BUILD_DIR, check=True,
                   capture_output=True)
    return str(exe)


def run_reference(exe, datafile, outfile, n, l, k, mode, n_iter, burnin,
                  thinning, chains=1, seeds=(1, 2, 3), extra=()):
    cmd = [exe, "-d", str(datafile), "-o", str(outfile),
           "-N", str(n), "-L", str(l), "-K", str(k), "-v", str(mode),
           "-u", str(n_iter), "-b", str(burnin), "-t", str(thinning),
           "-c", str(chains), "-pi", "0", "-r", "10", "-g", "0",
           "-s", *map(str, seeds), *extra]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    return res


def parse_selfing_rates(outfile) -> np.ndarray:
    """Cluster-sorted posterior-mean S from the report (print_S_POP_to_file
    layout, result_analysis.c:74-94).  One row per chain."""
    text = Path(outfile).read_text()
    chains = []
    for block in re.findall(
            r"The Posterior distribution of Selfing Rates:\n.*?\n((?:Cluster"
            r" \d+\t[-\d.]+\t[-\d.]+\n)+)", text):
        vals = [float(m.group(1)) for m in
                re.finditer(r"Cluster \d+\t([-\d.]+)\t", block)]
        chains.append(vals)
    return np.asarray(chains)


def parse_q_matrix(outfile, n, k) -> np.ndarray:
    """Posterior-mean Q per individual from the Distruct-format block
    (print_Q_to_file, result_analysis.c:228-273).  [chains, N, K]."""
    text = Path(outfile).read_text()
    out = []
    for block in re.findall(
            r"Inferred ancestry of individuals:\n(.*?)\n\n", text,
            re.DOTALL):
        rows = []
        for line in block.splitlines():
            m = re.match(r"\d+\t\S+\t\(\d+\)\t\d+ : ((?:\t[-\d.]+)+)", line)
            if m:
                rows.append([float(x) for x in m.group(1).split()])
        if len(rows) == n:
            out.append(rows)
    return np.asarray(out)


def parse_loglik_mean(outfile) -> np.ndarray:
    text = Path(outfile).read_text()
    return np.asarray([float(x) for x in re.findall(
        r"Posterior Mean = ([-\d.]+)", text)])


def parse_transformed_alleles(stdout_text: str, n, l, ploid=2) -> np.ndarray:
    """The recoded genotype matrix the binary echoes to stdout
    (transform_data, data_interface.c:554-566): per individual, `ploid`
    lines of `l` integer codes."""
    lines = stdout_text.split("Print the transformed allele data:\n", 1)[1]
    lines = lines.split("End the printing", 1)[0].strip().splitlines()
    mat = np.array([[int(x) for x in ln.split()] for ln in lines])
    assert mat.shape == (n * ploid, l), mat.shape
    return mat.reshape(n, ploid, l).transpose(0, 2, 1)


def parse_f_rates(outfile) -> np.ndarray:
    """Cluster-sorted posterior-mean F (print_F_POP_to_file,
    result_analysis.c:114-133)."""
    import re
    from pathlib import Path
    text = Path(outfile).read_text()
    chains = []
    for block in re.findall(
            r"The Posterior distribution of Inbreeding Coefficients:\n.*?"
            r"\n((?:Cluster \d+\t[-\d.]+\t[-\d.]+\n)+)", text):
        vals = [float(m.group(1)) for m in
                re.finditer(r"Cluster \d+\t([-\d.]+)\t", block)]
        chains.append(vals)
    return np.asarray(chains)


def parse_classification(outfile, n, k) -> np.ndarray:
    """Mode-0 membership probabilities (print_Z_to_file,
    result_analysis.c:153-191)."""
    import re
    from pathlib import Path
    text = Path(outfile).read_text()
    block = text.split("Inferred Classification of individuals:", 1)[1]
    rows = []
    for line in block.splitlines():
        m = re.match(r"\d+\t\S+\t\(\d+\)\t\d+ : ((?:\t[-\d.]+)+)", line)
        if m:
            rows.append([float(x) for x in m.group(1).split()])
    return np.asarray(rows[:n])
