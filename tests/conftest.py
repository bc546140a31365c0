"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; JAX's host-platform device
splitting lets the sharded solve paths (psum/all_gather over a Mesh) execute
and be verified on one host (SURVEY.md §4 point 4).

On-TPU lane (VERDICT r1 item 5): ``SDF_NMPC_TPU_TESTS=1 pytest -m tpu``
keeps the real TPU backend (real Mosaic lowering of the Pallas kernels, not
interpret mode) and runs only the @pytest.mark.tpu subset; the default run
pins CPU and those tests self-skip.
"""

import os

TPU_LANE = os.environ.get("SDF_NMPC_TPU_TESTS", "") == "1"

if not TPU_LANE:
    # must be set before jax import
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_LANE:
    # this environment's sitecustomize may register a TPU tunnel backend and
    # pin jax_platforms to it, overriding the env var — force CPU after
    # import too.
    jax.config.update("jax_platforms", "cpu")

    # f64 on the CPU test mesh: lets parity oracles (scipy direct-NLP solves)
    # run at full precision. The TPU path selects its own dtype via
    # cfg.solver.dtype; the TPU lane keeps x64 OFF.
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def cfg():
    from sdf_nmpc_tpu.config import default_config

    return default_config()


@pytest.fixture(scope="session")
def cfg_nosdf():
    from sdf_nmpc_tpu.config import default_config

    return default_config().replace(flags=dict(enable_sdf=False))
