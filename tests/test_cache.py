"""Persistent-cache fingerprinting (utils/cache.py).

The repo's cache directories outlive the machine that wrote them
(builder/driver/judge mount them across rounds); entries must be scoped so
a foreign machine can never load host-specific XLA:CPU AOT code
(MULTICHIP_r04's cpu_aot_loader SIGILL-risk warning)."""

import os

import pytest

from slam_process_tpu.utils.cache import (
    ensure_portable_cpu_isa,
    machine_fingerprint,
)


def test_tpu_fingerprint_is_host_independent():
    import jax

    fp = machine_fingerprint("tpu")
    assert fp == f"tpu-jax{jax.__version__}"


def test_cpu_fingerprint_portable_when_isa_capped(monkeypatch):
    import jax

    monkeypatch.setenv("XLA_FLAGS", "--xla_cpu_max_isa=AVX2")
    fp = machine_fingerprint("cpu")
    assert fp.startswith(f"cpu-jax{jax.__version__}-")
    assert fp.endswith("-isaAVX2")


def test_cpu_fingerprint_hashes_host_features_when_uncapped(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "")
    fp = machine_fingerprint("cpu")
    # arch + 12-hex feature hash; never the portable marker
    assert "isaAVX2" not in fp
    assert len(fp.rsplit("-", 1)[-1]) == 12


def test_ensure_portable_cpu_isa_appends_and_respects(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    assert ensure_portable_cpu_isa() is True
    assert "--xla_cpu_max_isa=AVX2" in os.environ["XLA_FLAGS"]
    # idempotent
    assert ensure_portable_cpu_isa() is True
    assert os.environ["XLA_FLAGS"].count("xla_cpu_max_isa") == 1
    # an explicit different cap is respected, not overridden
    monkeypatch.setenv("XLA_FLAGS", "--xla_cpu_max_isa=SSE4_2")
    assert ensure_portable_cpu_isa() is False
    assert os.environ["XLA_FLAGS"] == "--xla_cpu_max_isa=SSE4_2"


def test_conftest_lane_runs_capped():
    """The CPU test lane itself must be running with the portable cap
    (conftest applies it before jax initializes)."""
    import jax

    if jax.default_backend() != "cpu":   # pragma: no cover — tpu lane
        pytest.skip("cpu-lane check")
    assert "xla_cpu_max_isa=AVX2" in os.environ.get("XLA_FLAGS", "")
