"""Device-resident streaming replay: chunked == offline exact parity.

Counterpart of tests/test_streaming.py for the on-device state machine
(parallel/streaming_device.py): decode counts, filtered rows, and the
intensity accumulators must match the offline host pipeline at every chunk
size, including the log_transform scene config.
"""

import numpy as np
import pytest

from slam_process_tpu.config import PipelineConfig, SceneConfig


@pytest.fixture(scope="module")
def offline(small_log_bytes):
    from slam_process_tpu.ops.correct import correct_frames_np
    from slam_process_tpu.ops.decode import decode_frames_np

    dec = decode_frames_np(small_log_bytes)
    res = correct_frames_np(dec.frames)
    return dec, res


@pytest.mark.parametrize("chunk_bytes", [4097, 1 << 16, 1 << 20])
def test_device_streaming_matches_offline(small_log_bytes, offline, chunk_bytes):
    from slam_process_tpu.parallel.streaming_device import replay_log_device

    dec, res = offline
    s = replay_log_device(small_log_bytes, chunk_bytes=chunk_bytes,
                          collect_filtered=True)
    assert not s.overflow
    assert s.n_frames == dec.valid
    assert s.n_kept == len(res.filtered)
    np.testing.assert_array_equal(s.filtered, res.filtered)

    from slam_process_tpu.ops.scene import intensity_grid_np

    grid = intensity_grid_np(
        res.filtered[:, 0], res.filtered[:, 1], res.filtered[:, 2],
        cfg=SceneConfig(keep_nan=True, fill_with_min=False),
    )
    ours = s.intensity()
    np.testing.assert_array_equal(ours.counts, grid.counts)
    np.testing.assert_allclose(ours.mean, grid.mean, rtol=1e-5, atol=1e-2,
                               equal_nan=True)


def test_device_streaming_group_count_matches_offline(small_log_bytes, offline):
    from slam_process_tpu.ops.correct import detect_groups_np
    from slam_process_tpu.parallel.streaming_device import replay_log_device

    dec, _ = offline
    n_groups = int(detect_groups_np(dec.frames[:, 1])[-1]) + 1
    s = replay_log_device(small_log_bytes, chunk_bytes=1 << 16)
    assert s.n_groups == n_groups


def test_device_streaming_log_transform(small_log_bytes, offline):
    """SceneConfig.log_transform folds ln(RSS) with the RSS<=0 drop rule."""
    from slam_process_tpu.ops.scene import intensity_grid_np
    from slam_process_tpu.parallel.streaming_device import replay_log_device

    _, res = offline
    cfg = PipelineConfig(scene=SceneConfig(log_transform=True))
    s = replay_log_device(small_log_bytes, chunk_bytes=1 << 16, config=cfg)
    grid = intensity_grid_np(
        res.filtered[:, 0], res.filtered[:, 1], res.filtered[:, 2],
        cfg=SceneConfig(log_transform=True),
    )
    ours = s.intensity()
    np.testing.assert_array_equal(ours.counts, grid.counts)
    np.testing.assert_allclose(ours.mean, grid.mean, rtol=1e-5, atol=1e-5,
                               equal_nan=True)


def test_device_streaming_pallas_decoder_matches_xla(small_log_bytes, offline):
    """The double-buffered Pallas ingest kernel wired into the stream path."""
    from slam_process_tpu.parallel.streaming_device import replay_log_device

    dec, res = offline
    # One window only (pallas interpret mode is slow on CPU).
    raw = small_log_bytes[: 1 << 16]
    from slam_process_tpu.ops.correct import correct_frames_np
    from slam_process_tpu.ops.decode import decode_frames_np

    sub_dec = decode_frames_np(raw)
    s = replay_log_device(raw, chunk_bytes=1 << 16, decoder="pallas",
                          collect_filtered=True)
    assert s.n_frames == sub_dec.valid
    sub_res = correct_frames_np(sub_dec.frames)
    np.testing.assert_array_equal(s.filtered, sub_res.filtered)


def test_host_streaming_log_transform(small_log_bytes, offline):
    """The host state machine honors log_transform too (advisor finding)."""
    from slam_process_tpu.ops.scene import intensity_grid_np
    from slam_process_tpu.parallel.streaming import replay_log

    _, res = offline
    cfg = PipelineConfig(scene=SceneConfig(log_transform=True))
    s = replay_log(small_log_bytes, chunk_bytes=1 << 16, config=cfg)
    grid = intensity_grid_np(
        res.filtered[:, 0], res.filtered[:, 1], res.filtered[:, 2],
        cfg=SceneConfig(log_transform=True),
    )
    ours = s.intensity()
    np.testing.assert_array_equal(ours.counts, grid.counts)
    np.testing.assert_allclose(ours.mean, grid.mean, rtol=1e-12, atol=0,
                               equal_nan=True)
