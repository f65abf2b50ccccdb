from slam_process_tpu.ops.decode import (  # noqa: F401
    frame_start_mask,
    decode_frames_np,
    decode_frames_jax,
    decode_rows_jax,
)
