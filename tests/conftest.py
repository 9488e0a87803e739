"""Test configuration: force the CPU backend with 8 virtual devices.

Sharding/mesh tests need multiple devices; the CI/dev machine has at most
one TPU chip (behind a high-latency tunnel), so all tests run on a
virtual 8-device CPU mesh.  Must be set before jax imports.
"""

import os

# The environment pins JAX_PLATFORMS to the tunneled TPU backend and a
# sitecustomize hook pre-imports jax, so a plain env-var default is not
# enough -- override the platform through the config API and size the
# virtual CPU mesh before the CPU client initialises.  The opt-in
# on-device smoke run (tests/test_device_smoke.py) must keep the real
# backend, so the pin is skipped when that gate is set.
if os.environ.get("RAPPAS_TPU_DEVICE_TESTS") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES


@pytest.fixture(scope="session")
def tiny_db(tmp_path_factory):
    """Build the tiny-fixture DB once per session (PhyML subprocess)."""
    from rappas_tpu.build.pipeline import BuildConfig, build_database
    wd = tmp_path_factory.mktemp("tiny_wd")
    cfg = BuildConfig(k=8, omega=1.5, states="nucl",
                      ar_binary="/root/reference/bindep/phyml_x64")
    return build_database(FIXTURES / "tiny.fasta", FIXTURES / "tiny.tree",
                          wd, cfg)
