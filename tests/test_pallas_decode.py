"""Pallas streaming-decode kernel vs the numpy decoder (interpret mode)."""

import numpy as np

from slam_process_tpu.ops.decode import decode_frames_np, frame_capacity
from slam_process_tpu.ops.pallas_decode import decode_frames_pallas


def test_pallas_decode_real_log(small_log_bytes):
    ref = decode_frames_np(small_log_bytes)
    cap = frame_capacity(len(small_log_bytes))
    frames, count = decode_frames_pallas(small_log_bytes, cap,
                                         rows_per_chunk=64, interpret=True)
    assert int(count) == ref.valid
    np.testing.assert_array_equal(np.asarray(frames)[: ref.valid], ref.frames)


def test_pallas_decode_chunk_straddle():
    from tests.test_decode import make_frame

    rng = np.random.default_rng(31)
    chunks = []
    for _ in range(400):
        if rng.random() < 0.7:
            chunks.extend(make_frame(ue=int(rng.integers(64)),
                                     clk=int(rng.integers(1 << 30)),
                                     rss=int(rng.integers(1 << 18))))
        else:
            chunks.extend(rng.integers(0, 256, rng.integers(1, 20)).tolist())
    raw = np.asarray(chunks, dtype=np.uint8)
    ref = decode_frames_np(raw)
    frames, count = decode_frames_pallas(raw, frame_capacity(len(raw)),
                                         rows_per_chunk=8, interpret=True)
    assert int(count) == ref.valid
    np.testing.assert_array_equal(np.asarray(frames)[: ref.valid], ref.frames)


def test_pallas_decode_no_stale_slot_reads():
    """Deliberate stale-read probe for the double-buffered ingest (SURVEY
    §5.2): every chunk carries frames whose UE encodes the chunk index, so
    a kernel step consuming the OTHER slot's previous contents (a missed
    DMA wait) would emit frames with the wrong UE for their position."""
    from tests.test_decode import make_frame

    rows_per_chunk = 8
    chunk_bytes = rows_per_chunk * 128
    n_chunks = 32
    raw = np.zeros(n_chunks * chunk_bytes, dtype=np.uint8)
    expected = {}
    for c in range(n_chunks):
        # Three frames per chunk, placed clear of the chunk edges.
        for j in range(3):
            off = c * chunk_bytes + 17 + j * 200
            f = make_frame(ue=c % 64, clk=c * 61_000 + j, rss=c + 1)
            raw[off : off + 11] = f
            expected[off] = c % 64

    ref = decode_frames_np(raw)
    assert ref.valid == 3 * n_chunks
    frames, count = decode_frames_pallas(raw, frame_capacity(len(raw)),
                                         rows_per_chunk=rows_per_chunk,
                                         interpret=True)
    assert int(count) == ref.valid
    got = np.asarray(frames)[: ref.valid]
    np.testing.assert_array_equal(got, ref.frames)
    # Positional cross-check: UE must match the chunk each frame sits in.
    starts = sorted(expected)
    np.testing.assert_array_equal(got[:, 1],
                                  np.asarray([expected[s] for s in starts]))
