from slam_process_tpu.pipeline.session import Session  # noqa: F401
