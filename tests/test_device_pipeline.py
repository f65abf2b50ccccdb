"""End-to-end device pipeline vs host path equivalence."""

import numpy as np

from slam_process_tpu.config import RenderConfig, SceneConfig
from slam_process_tpu.ops.correct import correct_frames_np
from slam_process_tpu.ops.decode import decode_frames_np
from slam_process_tpu.ops.raster import rasterize
from slam_process_tpu.ops.scene import fill_grid, intensity_grid_np
from slam_process_tpu.pipeline.device import run_session_on_device


def test_device_pipeline_matches_host(small_log_bytes):
    out = run_session_on_device(small_log_bytes)

    ref_dec = decode_frames_np(small_log_bytes)
    n = int(out.n_frames)
    assert n == ref_dec.valid
    # Masked-row layout: pack via the validity mask (order-preserving).
    fv = np.asarray(out.frame_valid).astype(bool)
    assert int(fv.sum()) == n
    np.testing.assert_array_equal(np.asarray(out.frames)[fv], ref_dec.frames)

    ref_cor = correct_frames_np(ref_dec.frames)
    np.testing.assert_array_equal(np.asarray(out.keep)[fv], ref_cor.keep)
    np.testing.assert_array_equal(
        np.asarray(out.corrected_bs)[fv][ref_cor.keep],
        ref_cor.filtered[:, 1],
    )
    assert int(out.n_kept) == len(ref_cor.filtered)

    cfg = SceneConfig(keep_nan=True, fill_with_min=False)
    ref_grid = intensity_grid_np(
        ref_cor.filtered[:, 0], ref_cor.filtered[:, 1], ref_cor.filtered[:, 2],
        cfg=cfg,
    )
    np.testing.assert_array_equal(np.asarray(out.counts), ref_grid.counts)
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(out.mean_grid)),
        np.nan_to_num(ref_grid.mean),
        rtol=3e-5, atol=3e-4,
    )

    # Raster parity within the pixel budget.
    matrix = fill_grid(ref_grid, cfg).T
    ref_rgba, _ = rasterize(matrix, blur_sigma=1.0, use_log=True, as_u8=False)
    ours = np.asarray(out.rgba, dtype=np.float64)
    oa = ref_rgba * ref_rgba[..., 3:4]
    ua = ours * ours[..., 3:4]
    assert np.max(np.abs(oa - ua)) <= 1e-3


def test_session_device_engine_matches_host():
    import numpy as np

    from slam_process_tpu.pipeline.session import Session
    from tests.conftest import SMALL_LOG_2026_02_06

    h = Session.from_log(SMALL_LOG_2026_02_06)
    h.correct()
    d = Session.from_log(SMALL_LOG_2026_02_06, engine="device")
    np.testing.assert_array_equal(h.frames, d.frames)
    np.testing.assert_array_equal(h.filtered, d.filtered)
    np.testing.assert_array_equal(h.corrected_bs, d.corrected_bs)
