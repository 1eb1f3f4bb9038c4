"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

The container exposes one real TPU chip via the experimental 'axon' platform;
tests must be hermetic and multi-device, so we pin JAX to CPU with 8 forced
host devices (the same mechanism the driver uses for multi-chip dry-runs).
"""

import os

TPU_TESTS = os.environ.get("RAYTRACER_TPU_TESTS", "") == "1"

if not TPU_TESTS:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax

if not TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


def pytest_addoption(parser):
    parser.addoption(
        "--run-veryslow", action="store_true", default=False,
        help="run the full-resolution 13-scene parity sweeps (tens of "
             "minutes on CPU; results are recorded in BASELINE.md)",
    )


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="on-hardware cert: set RAYTRACER_TPU_TESTS=1 and run "
               "`pytest -m tpu` on a machine with a real TPU")
    for item in items:
        if "tpu" in item.keywords and not TPU_TESTS:
            item.add_marker(skip_tpu)
    if config.getoption("--run-veryslow"):
        return
    skip = pytest.mark.skip(reason="needs --run-veryslow (stats in BASELINE.md)")
    for item in items:
        if "veryslow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def reference_inputs():
    path = os.path.join(REFERENCE, "inputs")
    if not os.path.isdir(path):
        pytest.skip("reference scenes not available")
    return path


@pytest.fixture(scope="session")
def reference_outputs():
    path = os.path.join(REFERENCE, "outputs")
    if not os.path.isdir(path):
        pytest.skip("reference golden outputs not available")
    return path
