"""Legacy v1/v2 decoders vs literal sequential oracles (reference semantics)."""

import numpy as np
import pytest

from slam_process_tpu.ops.decode_legacy import (
    decode_frames_v1_np,
    decode_frames_v2_np,
)


def oracle_v1(b):
    """Literal serial_hex_to_excel.py:34-87 cursor loop."""
    rows, discarded, i, n = [], 0, 0, len(b)
    while i < n:
        if i + 4 >= n:
            discarded += 1
            i += 1
            continue
        g = b[i : i + 5]
        t = [(x >> 6) & 3 for x in g]
        if t[0] != 0b01 or t[1] not in (0b00, 0b11) or any(x != 0b10 for x in t[2:]):
            discarded += 1
            i += 1
            continue
        ue = g[0] & 0x3F
        bs = 65 if t[1] == 0b11 else g[1] & 0x3F
        rss = (g[2] & 0x3F) | ((g[3] & 0x3F) << 6) | ((g[4] & 0x3F) << 12)
        rows.append((ue, bs, rss))
        i += 5
    return np.asarray(rows, np.int64).reshape(-1, 3), discarded


def oracle_v2(b):
    """Literal serial_hex_to_excel_v2.py:34-99 cursor loop."""
    rows, discarded, i, n = [], 0, 0, len(b)
    while i < n:
        if i + 5 >= n:
            discarded += 1
            i += 1
            continue
        flag, ue, bs, r0, r1, r2 = b[i : i + 6]
        if flag not in (0xCC, 0x33) or (ue >> 6) != 0b01 \
           or not (bs == 0xFF or (bs >> 6) == 0b00) \
           or any((x >> 6) != 0b10 for x in (r0, r1, r2)):
            discarded += 1
            i += 1
            continue
        rows.append((1 if flag == 0xCC else 0, ue & 0x3F, bs & 0x3F,
                     (r0 & 0x3F) | ((r1 & 0x3F) << 6) | ((r2 & 0x3F) << 12)))
        i += 6
    return np.asarray(rows, np.int64).reshape(-1, 4), discarded


def v1_frame(ue=3, bs=7, rss=12345, bs_invalid=False):
    b1 = 0xC0 | (bs & 0x3F) if bs_invalid else (bs & 0x3F)
    return [0x40 | (ue & 0x3F), b1,
            0x80 | (rss & 0x3F), 0x80 | ((rss >> 6) & 0x3F),
            0x80 | ((rss >> 12) & 0x3F)]


def v2_frame(flag=0x33, ue=3, bs=0xFF, rss=54321):
    return [flag, 0x40 | (ue & 0x3F), bs,
            0x80 | (rss & 0x3F), 0x80 | ((rss >> 6) & 0x3F),
            0x80 | ((rss >> 12) & 0x3F)]


def test_v1_basic():
    b = np.asarray(v1_frame() + v1_frame(ue=9, bs=0, bs_invalid=True),
                   dtype=np.uint8)
    res = decode_frames_v1_np(b)
    assert res.valid == 2
    assert res.frames[0].tolist() == [3, 7, 12345]
    assert res.frames[1, 1] == 65  # 11-class BS -> sentinel


def test_v2_basic():
    b = np.asarray(v2_frame() + v2_frame(flag=0xCC, bs=0x21), dtype=np.uint8)
    res = decode_frames_v2_np(b)
    assert res.valid == 2
    assert res.frames[0].tolist() == [0, 3, 0x3F, 54321]
    assert res.frames[1, 0] == 1 and res.frames[1, 2] == 0x21


@pytest.mark.parametrize("fmt", ["v1", "v2"])
def test_fuzz_vs_oracle(fmt):
    rng = np.random.default_rng(50)
    decode = decode_frames_v1_np if fmt == "v1" else decode_frames_v2_np
    oracle = oracle_v1 if fmt == "v1" else oracle_v2
    mk = v1_frame if fmt == "v1" else v2_frame
    for _ in range(40):
        chunks = []
        for _ in range(rng.integers(1, 30)):
            if rng.random() < 0.5:
                if fmt == "v1":
                    chunks.extend(mk(ue=int(rng.integers(64)),
                                     bs=int(rng.integers(64)),
                                     rss=int(rng.integers(1 << 18)),
                                     bs_invalid=bool(rng.random() < 0.3)))
                else:
                    chunks.extend(mk(flag=[0x33, 0xCC][rng.integers(2)],
                                     ue=int(rng.integers(64)),
                                     bs=int([0xFF, rng.integers(64)][rng.integers(2)]),
                                     rss=int(rng.integers(1 << 18))))
            else:
                chunks.extend(rng.integers(0, 256, rng.integers(1, 15)).tolist())
        b = np.asarray(chunks, dtype=np.uint8)
        ref_frames, ref_disc = oracle(b.tolist())
        res = decode(b)
        np.testing.assert_array_equal(res.frames, ref_frames)
        assert res.valid == len(ref_frames)
        assert res.discarded == ref_disc


def _read_mixed_xlsx(path):
    """Independent reader: stdlib zipfile + ElementTree (verify skill rule)."""
    import zipfile
    import xml.etree.ElementTree as ET

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as zf:
        root = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    rows = []
    for row in root.iter(f"{ns}row"):
        cells = []
        for c in row.iter(f"{ns}c"):
            t = c.find(f"{ns}is/{ns}t")
            v = c.find(f"{ns}v")
            cells.append(t.text if t is not None
                         else (v.text if v is not None else None))
        rows.append(cells)
    return rows


def test_v1_cli_export_reference_columns(tmp_path):
    """CLI v1 export carries the reference's full 8-column layout with raw
    hex strings (serial_hex_to_excel.py:83-118)."""
    from slam_process_tpu.pipeline.cli import main
    from slam_process_tpu.ops.decode_legacy import V1_COLUMNS

    b = v1_frame(ue=3, bs=7, rss=12345) + v1_frame(ue=9, bs=1, bs_invalid=True)
    log = tmp_path / "v1.txt"
    log.write_text(" ".join(f"{x:02X}" for x in b))
    out = tmp_path / "v1.xlsx"
    assert main(["decode", str(log), str(out), "--format", "v1"]) == 0

    rows = _read_mixed_xlsx(out)
    assert rows[0] == V1_COLUMNS
    assert rows[1] == ["0x43", "3", "0x07", "7", "0xB9", "0x80", "0x83",
                       "12345"]
    assert rows[2][2] == "0xC1" and rows[2][3] == "65"


def test_v2_cli_export_reference_columns(tmp_path):
    from slam_process_tpu.pipeline.cli import main
    from slam_process_tpu.ops.decode_legacy import V2_COLUMNS

    b = v2_frame(flag=0xCC, ue=5, bs=0x21, rss=54321)
    log = tmp_path / "v2.txt"
    log.write_text(" ".join(f"{x:02X}" for x in b))
    out = tmp_path / "v2.xlsx"
    assert main(["decode", str(log), str(out), "--format", "v2"]) == 0

    rows = _read_mixed_xlsx(out)
    assert rows[0] == V2_COLUMNS
    assert rows[1][:4] == ["1", "5", "33", "54321"]
    assert rows[1][4:] == ["0x45", "0x21", "0xB1", "0x90", "0x8D"]
