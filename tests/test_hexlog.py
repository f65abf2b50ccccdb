"""Tokenizer unit tests + byte-level vs reference-semantics equivalence."""

import numpy as np
import pytest

from slam_process_tpu.io.hexlog import tokenize_hex, tokenize_hex_reference
from tests.conftest import DEBUGDOC


def test_basic_tokens():
    data = b"33 00 FF 74\n58 40"
    out = tokenize_hex(data)
    assert out.tolist() == [0x33, 0x00, 0xFF, 0x74, 0x58, 0x40]


def test_junk_tokens_skipped():
    # Guillemet junk (as in the shipped logs), 1/3-char tokens, non-hex.
    data = b"\xc2\xab 33 0 123 GG 7f"
    assert tokenize_hex(data).tolist() == [0x33, 0x7F]


def test_0x_prefix_accepted():
    data = b"0x33 0XAB cc"
    assert tokenize_hex(data).tolist() == [0x33, 0xAB, 0xCC]


def test_mixed_case_and_whitespace():
    data = b"  aB\tCd \r\n eF "
    assert tokenize_hex(data).tolist() == [0xAB, 0xCD, 0xEF]


def test_equivalence_random_valid_utf8():
    # Byte-level tokenization can only match the reference's
    # decode(errors='ignore') path on valid UTF-8 input, which is what real
    # logs are; random token streams (including the guillemet junk marker)
    # must agree exactly.
    rng = np.random.default_rng(0)
    tokens = [b"33", b"ff", b"AB", b"0x7f", b"0", b"123", b"GG", b"x", b"\xc2\xab"]
    seps = [b" ", b"\t", b"\n", b"\r\n", b"  "]
    for _ in range(20):
        n = int(rng.integers(200, 600))
        data = b"".join(
            tokens[rng.integers(len(tokens))] + seps[rng.integers(len(seps))]
            for _ in range(n)
        )
        np.testing.assert_array_equal(
            tokenize_hex(data), tokenize_hex_reference(data)
        )


@pytest.mark.parametrize(
    "log", sorted(p.name for p in DEBUGDOC.glob("*.txt")), ids=lambda s: s[-20:-4]
)
def test_equivalence_on_shipped_logs(log):
    data = (DEBUGDOC / log).read_bytes()
    fast = tokenize_hex(data)
    ref = tokenize_hex_reference(data)
    np.testing.assert_array_equal(fast, ref)
