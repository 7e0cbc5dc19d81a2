"""TPU-backend oracle tier (VERDICT r4 item 3).

`tests/` pins everything to a virtual CPU mesh so the suite runs anywhere;
this tier deliberately does NOT — it runs the production TPU code paths
(Pallas kernels, the XLA moment selector, adjugate/unrolled-Cholesky
solves, the full-capacity voxel-table fast path) against f64/exact
oracles on the real backend. Run with `python -m pytest tests_tpu/ -q`
from a machine with a TPU attached; the whole directory skips cleanly
when none is available.
"""

import numpy as np
import pytest

import jax


def _tpu_available() -> bool:
    try:
        return jax.default_backend() == "tpu" and len(jax.devices()) > 0
    except RuntimeError:
        return False


collect_ignore: list = []

if not _tpu_available():
    collect_ignore_glob = ["test_*.py"]


@pytest.fixture(scope="session", autouse=True)
def _compilation_cache():
    from rolo_tpu.runtime.platform import enable_compilation_cache

    enable_compilation_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
