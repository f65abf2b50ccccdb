"""Streaming replay == offline pipeline, byte-for-byte, at any chunk size."""

import numpy as np
import pytest

from slam_process_tpu.ops.correct import correct_frames_np
from slam_process_tpu.ops.decode import decode_frames_np
from slam_process_tpu.ops.scene import intensity_grid_np
from slam_process_tpu.parallel.streaming import StreamingSession, replay_log


@pytest.mark.parametrize("chunk", [997, 8192, 1 << 16])
def test_streaming_equals_offline(small_log_bytes, chunk):
    s = replay_log(small_log_bytes, chunk_bytes=chunk)

    off_dec = decode_frames_np(small_log_bytes)
    assert s.n_frames == off_dec.valid
    off_cor = correct_frames_np(off_dec.frames)
    np.testing.assert_array_equal(s.filtered, off_cor.filtered)

    off_grid = intensity_grid_np(
        off_cor.filtered[:, 0], off_cor.filtered[:, 1], off_cor.filtered[:, 2]
    )
    grid = s.intensity()
    np.testing.assert_array_equal(grid.counts, off_grid.counts)
    np.testing.assert_allclose(np.nan_to_num(grid.mean),
                               np.nan_to_num(off_grid.mean), atol=1e-9)
    assert grid.fill_value == pytest.approx(off_grid.fill_value)


def test_streaming_frame_straddles_chunks():
    from tests.test_decode import make_frame

    frames = [make_frame(ue=u, clk=1000 + 900 * u) for u in range(8)]
    raw = np.asarray(sum(frames, []), dtype=np.uint8)
    # Feed in pathological 3-byte chunks: every frame straddles chunks.
    s = StreamingSession()
    for off in range(0, len(raw), 3):
        s.feed(raw[off : off + 3])
    s.finalize()
    assert s.n_frames == 8


def test_streaming_incremental_render(small_log_bytes, angle_lut64):
    s = replay_log(small_log_bytes, chunk_bytes=1 << 15, render_every=4,
                   angle_lut=angle_lut64)
    rendered = s.render(angle_lut64)
    assert rendered.rgba.shape[2] == 4
    assert np.isfinite(rendered.blurred).any()


def test_streaming_junk_only_chunks():
    s = StreamingSession()
    s.feed(b"\x00\x01\x02" * 100)
    s.feed(b"")
    s.finalize()
    assert s.n_frames == 0
    assert s.filtered.shape == (0, 4)
