"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware; Pallas kernels run in interpret mode there
(selected automatically by the ops layer when not on TPU).
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

# The axon sitecustomize force-prepends its TPU platform to jax_platforms at
# interpreter start; override it before any backend is initialized so tests
# run on the 8-device virtual CPU mesh.  Set SWF_TESTS_TPU=1 to run the
# suite against the real chip instead (multi-device tests will skip).
import jax  # noqa: E402

if not os.environ.get("SWF_TESTS_TPU"):
    jax.config.update("jax_platforms", "cpu")

REFERENCE_TESTS = pathlib.Path("/root/reference/tests")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_tests() -> pathlib.Path:
    if not REFERENCE_TESTS.is_dir():
        pytest.skip("reference test corpus not available")
    return REFERENCE_TESTS


@pytest.fixture(scope="session")
def artifacts_dir() -> pathlib.Path:
    out = REPO_ROOT / "tests" / "artifacts"
    out.mkdir(parents=True, exist_ok=True)
    return out
