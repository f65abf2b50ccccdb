"""Native hexscan vs numpy tokenizer equivalence + performance sanity."""

import time

import numpy as np
import pytest

from slam_process_tpu.io.hexlog import tokenize_hex
from tests.conftest import DEBUGDOC, SMALL_LOG

hexscan = pytest.importorskip("slam_process_tpu.runtime.hexscan")

if not hexscan.available():
    pytest.skip("no C toolchain available", allow_module_level=True)


def test_native_matches_numpy_on_log():
    data = SMALL_LOG.read_bytes()
    np.testing.assert_array_equal(hexscan.tokenize(data), tokenize_hex(data))


def test_native_edge_cases():
    cases = [
        b"", b" ", b"3", b"33", b"0x33 0XAB", b"GG zz 12",
        b"\xc2\xab 33 00 FF", b"ab\ncd\tef  ", b"123 4567 0xZZ 0x1",
    ]
    for data in cases:
        np.testing.assert_array_equal(
            hexscan.tokenize(data), tokenize_hex(data), err_msg=repr(data)
        )


def test_native_random_token_streams():
    rng = np.random.default_rng(40)
    tokens = [b"33", b"ff", b"AB", b"0x7f", b"0", b"123", b"GG", b"\xc2\xab"]
    seps = [b" ", b"\t", b"\n", b"\r\n"]
    for _ in range(10):
        data = b"".join(
            tokens[rng.integers(len(tokens))] + seps[rng.integers(len(seps))]
            for _ in range(int(rng.integers(100, 400)))
        )
        np.testing.assert_array_equal(hexscan.tokenize(data), tokenize_hex(data))


@pytest.mark.slow
def test_native_all_logs_and_speed():
    total_bytes = 0
    t_native = 0.0
    for p in sorted(DEBUGDOC.glob("*.txt")):
        data = p.read_bytes()
        total_bytes += len(data)
        t0 = time.perf_counter()
        nat = hexscan.tokenize(data)
        t_native += time.perf_counter() - t0
        np.testing.assert_array_equal(nat, tokenize_hex(data))
    rate = total_bytes / t_native / 1e6
    assert rate > 200, f"native tokenizer too slow: {rate:.0f} MB/s"
