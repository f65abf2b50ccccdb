from slam_process_tpu.models.registry import run_estimator  # noqa: F401
