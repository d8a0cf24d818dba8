"""Test configuration: force CPU with a virtual 8-device mesh.

The build machine has (at most) one real TPU chip behind a tunnel; all tests
run on the host CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without hardware (the standard JAX fake-mesh pattern).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from pathlib import Path

REFERENCE = Path("/root/reference")


@pytest.fixture(scope="session")
def cam0_dir():
    if not REFERENCE.exists():
        pytest.skip("reference dataset not available")
    return REFERENCE


@pytest.fixture(scope="session")
def cam0_problem():
    """The bundled cam0 dataset, shipped config (pinhole self-calibration)."""
    if not REFERENCE.exists():
        pytest.skip("reference dataset not available")
    from fish_eye_bundle_adjustment_tpu.config import load_settings
    from fish_eye_bundle_adjustment_tpu.io.problem import load_problem

    settings = load_settings(REFERENCE / "config.cfg", default_output_stem="cam0")
    return load_problem(REFERENCE, settings=settings)


@pytest.fixture(scope="session")
def cam0_settings(cam0_problem):
    return cam0_problem.settings
