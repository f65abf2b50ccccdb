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
