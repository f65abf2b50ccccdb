"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is tested
on a virtual 8-device CPU topology (the driver separately dry-run-compiles
the multi-chip path via __graft_entry__.dryrun_multichip)."""

import os
import sys
from pathlib import Path

# Two lanes:
#   CPU lane (default): force CPU with 8 virtual devices — hermetic, runs
#     everything NOT marked tpu.  NOTE: the environment's sitecustomize
#     registers the TPU backend programmatically and overrides
#     JAX_PLATFORMS, so the env var alone is NOT enough — the config update
#     below is what actually pins the platform.
#   TPU lane (SLAM_PROCESS_TPU_TEST_TPU=1, run `-m tpu` on the chip): keeps
#     the ambient TPU backend and runs ONLY the tpu-marked tests — the
#     on-chip numerics sentinels (round 2's blur bf16 corruption and round
#     3's estimator-argmax bf16 flips were invisible to the CPU lane).
TPU_LANE = os.environ.get("SLAM_PROCESS_TPU_TEST_TPU") == "1"

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Portable XLA:CPU codegen (AVX2 cap): persistent-cache entries load
    # warning-free on every machine that mounts this repo across rounds.
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from slam_process_tpu.utils.cache import ensure_portable_cpu_isa

    ensure_portable_cpu_isa()

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = Path("/root/reference")
DEBUGDOC = REFERENCE / "debugDoc"
CACHE = REPO_ROOT / "tests" / "_cache"

# A small session (18.6k frames) used for fast golden tests.
SMALL_LOG = DEBUGDOC / "256-0x16-Serial Debug 2026-01-26 164520.txt"
SMALL_PARSED = DEBUGDOC / "Serial Debug 2026-01-26 164520.xlsx"
SMALL_FILTERED = DEBUGDOC / "Serial Debug 2026-01-26 164520_filtered.xlsx"
SMALL_LOG_2026_02_06 = DEBUGDOC / "Serial Debug 2026-02-06 091211.txt"
PARSED_2026_02_06 = DEBUGDOC / "Serial Debug 2026-02-06 091211.xlsx"
FILTERED_2026_02_06 = DEBUGDOC / "Serial Debug 2026-02-06 091211_filtered.xlsx"
BEAM_ANGLE = REFERENCE / "beam_angle.xlsx"


def _cached(name: str, builder):
    """Parse-once cache for golden tables (xlsx parsing is the slow part)."""
    CACHE.mkdir(parents=True, exist_ok=True)
    path = CACHE / f"{name}.npz"
    if path.exists():
        with np.load(path) as z:
            return z["data"]
    data = builder()
    np.savez_compressed(path, data=data)
    return data


@pytest.fixture(scope="session")
def small_log_bytes():
    from slam_process_tpu.io import read_hex_log

    return read_hex_log(SMALL_LOG, engine="numpy")


@pytest.fixture(scope="session")
def small_parsed_golden():
    from slam_process_tpu.io.schemas import read_parsed_table

    return _cached("parsed_164520", lambda: read_parsed_table(SMALL_PARSED))


@pytest.fixture(scope="session")
def small_filtered_golden():
    from slam_process_tpu.io.schemas import read_filtered_table

    return _cached("filtered_164520", lambda: read_filtered_table(SMALL_FILTERED))


@pytest.fixture(scope="session")
def parsed_golden_020606():
    from slam_process_tpu.io.schemas import read_parsed_table

    return _cached("parsed_091211", lambda: read_parsed_table(PARSED_2026_02_06))


@pytest.fixture(scope="session")
def filtered_golden_020606():
    from slam_process_tpu.io.schemas import read_filtered_table

    return _cached("filtered_091211", lambda: read_filtered_table(FILTERED_2026_02_06))


@pytest.fixture(scope="session")
def angle_lut64():
    from slam_process_tpu.io.angles import load_angle_lut

    return load_angle_lut(BEAM_ANGLE)


def load_reference_module(name: str, path: str):
    """Import a reference script as a module for use as a live test oracle.

    Several reference scripts mutate global matplotlib rcParams at import
    time (e.g. heatmap_gemini_v1-7.py:13-14 sets font.sans-serif and
    axes.unicode_minus), which would silently change every later render in
    the test session — snapshot and restore around the import.
    """
    import importlib.util

    import matplotlib

    saved = matplotlib.rcParams.copy()
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        dict.update(matplotlib.rcParams, saved)


def pytest_collection_modifyitems(config, items):
    """Lane routing: tpu-marked tests run only on the real chip; everything
    else runs only in the hermetic CPU lane."""
    on_tpu = jax.default_backend() == "tpu"
    skip_needs_tpu = pytest.mark.skip(
        reason="needs the real TPU backend "
               "(SLAM_PROCESS_TPU_TEST_TPU=1 pytest -m tpu)")
    skip_cpu_only = pytest.mark.skip(
        reason="CPU-lane test (the TPU lane runs the -m tpu subset only)")
    for item in items:
        if "tpu" in item.keywords:
            if not on_tpu:
                item.add_marker(skip_needs_tpu)
        elif TPU_LANE:
            item.add_marker(skip_cpu_only)
