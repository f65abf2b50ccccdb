from slam_process_tpu.render.figures import save_heatmap_figure, angle_edges  # noqa: F401
from slam_process_tpu.render.heatmap import render_intensity  # noqa: F401
