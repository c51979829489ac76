"""MH on a correlated 2D Gaussian with live progress, scatter plot, and
Parquet export.

Analog of /root/reference/examples/gauss_mh.rs (plotly scatter -> matplotlib
if available, else a text summary).
"""

import os
import tempfile

import numpy as np

from mini_mcmc_tpu import MetropolisHastings, init_det
from mini_mcmc_tpu.io import save_parquet
from mini_mcmc_tpu.models import gaussian2d, isotropic_gaussian_proposal


def main():
    target = gaussian2d([2.0, 3.0], [[4.0, 2.0], [2.0, 3.0]])
    proposal = isotropic_gaussian_proposal(2.0)
    mh = MetropolisHastings(target, proposal, init_det(6, 2)).seed(42)

    sample, stats = mh.run_progress(2000, 500)
    print(stats)

    out = os.path.join(tempfile.gettempdir(), "gauss_mh.parquet")
    save_parquet(np.asarray(sample), out)
    print("saved parquet:", out)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        flat = np.asarray(sample).reshape(-1, 2)
        plt.figure(figsize=(5, 5))
        plt.scatter(flat[:, 0], flat[:, 1], s=1, alpha=0.2)
        png = os.path.join(tempfile.gettempdir(), "gauss_mh.png")
        plt.savefig(png, dpi=100)
        print("saved scatter:", png)
    except ImportError:
        flat = np.asarray(sample).reshape(-1, 2)
        print("sample mean:", flat.mean(axis=0), "cov:\n", np.cov(flat.T))


if __name__ == "__main__":
    main()
