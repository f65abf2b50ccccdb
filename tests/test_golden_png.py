"""Golden-PNG parity: our v1 estimation render vs the shipped pic/ files.

The 10 PNGs in /root/reference/pic/ were produced by heatmap_gemini_v1.py
(filtered xlsx -> pivot -> NN-OMP(max 3) -> RBF contourf -> LoS marker,
dpi 300).  Our render must reproduce them at the full-figure pixel level:
identical canvas size, and only antialiasing-edge pixels (contour/marker
boundaries, driven by f32-vs-f64 interpolation jitter) may deviate.
"""

from pathlib import Path

import numpy as np
import pytest

from tests.conftest import BEAM_ANGLE, DEBUGDOC

PIC = Path("/root/reference/pic")


def _render(session_stem: str, out_path):
    from slam_process_tpu.models import run_estimator
    from slam_process_tpu.pipeline.session import Session

    s = Session.from_filtered_xlsx(DEBUGDOC / f"{session_stem}_filtered.xlsx")
    run_estimator("nn_omp_v1", s, BEAM_ANGLE, out_path)


@pytest.mark.parametrize("stem", ["2026-01-27 115200"])
def test_golden_pic_parity(tmp_path, stem):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = tmp_path / "ours.png"
    _render(f"Serial Debug {stem}", out)
    ours = plt.imread(out)
    gold = plt.imread(PIC / f"{stem}.png")
    assert ours.shape == gold.shape, "figure canvas must match exactly"
    d = np.abs(ours.astype(np.float64) - gold.astype(np.float64))
    assert d.mean() < 1e-4
    assert (d > 1e-3).mean() < 0.005  # only antialiasing edges may move


# Sessions whose golden render is reproducible from the SHIPPED data+code.
# The other 8 pic/ renders predate the current _filtered artifacts: the
# shipped heatmap_gemini_v1.py itself raises KeyError('Column not found:
# RSS') on the shipped 2026-01-26/27 _filtered files (their RSS column is
# named RSS值), several goldens contain NLoS X-markers that the shipped v1
# has commented out, and e.g. the 164520 golden shows an entirely different
# intensity field (LoS at (-1.6, -28.6) vs (1.4, 7.0) from today's data).
# Verified 2026-08-16 by running the reference module against the shipped
# artifacts.  We assert strict parity where the reference is internally
# consistent and structural parity (same canvas, same pipeline) elsewhere.
REPRODUCIBLE = {"2026-01-27 115200", "2026-02-04 115200"}


@pytest.mark.slow
@pytest.mark.parametrize(
    "stem",
    [p.stem for p in sorted(PIC.glob("*.png"))],
)
def test_golden_pic_parity_all(tmp_path, stem):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    src = DEBUGDOC / f"Serial Debug {stem}_filtered.xlsx"
    if not src.exists():
        pytest.skip("no filtered artifact for this golden render")
    out = tmp_path / "ours.png"
    _render(f"Serial Debug {stem}", out)
    ours = plt.imread(out)
    gold = plt.imread(PIC / f"{stem}.png")
    assert ours.shape == gold.shape, "figure canvas must match exactly"
    if stem in REPRODUCIBLE:
        d = np.abs(ours.astype(np.float64) - gold.astype(np.float64))
        assert d.mean() < 2e-4
        assert (d > 1e-3).mean() < 0.01


@pytest.mark.parametrize(
    "stem", [
        "Serial Debug 2026-01-26 164520",
        pytest.param("Serial Debug 2026-01-26 165358", marks=pytest.mark.slow),
        pytest.param("Serial Debug 2026-01-26 170305", marks=pytest.mark.slow),
    ],
)
def test_excel_heatmap_golden_structure(tmp_path, stem):
    """debugDoc/heatmap_outputs goldens (excel_heatmap renders).

    These were rendered with a LINEAR color scale (colorbar label 线性刻度)
    even though the shipped excel_heatmap.py forces logscale default-on —
    another artifact-vintage drift — and with a Windows CJK font that shifts
    the Agg layout by a few pixels.  Exact pixel parity is therefore not
    attainable in this environment; we assert identical canvas size and
    strong structural similarity of the drawn heatmap region.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from slam_process_tpu.config import RenderConfig, SceneConfig
    from slam_process_tpu.pipeline.session import Session

    s = Session.from_filtered_xlsx(DEBUGDOC / f"{stem}_filtered.xlsx")
    out = tmp_path / "eh.png"
    s.render_heatmap(
        BEAM_ANGLE, out,
        SceneConfig(keep_nan=True, fill_with_min=False),
        RenderConfig(blur_sigma=1.0, use_log=False, dpi=150),
        source="filtered",
        title=f"BS-UE 波束对平均RSSI热力图 ({stem}_filtered.xlsx)",
    )
    ours = plt.imread(out)
    gold = plt.imread(
        DEBUGDOC / "heatmap_outputs" / f"{stem}_filtered_heatmap.png"
    )
    assert ours.shape == gold.shape
    o = ours[120:1050, 150:1150, :3].mean(axis=2)
    g = gold[120:1050, 150:1150, :3].mean(axis=2)
    # The golden's Windows CJK font shifts the axes box by a few pixels;
    # take the best correlation over small x/y offsets.
    r = max(
        np.corrcoef(
            o[10:-10, 10:-10].ravel(),
            np.roll(np.roll(g, dy, axis=0), dx, axis=1)[10:-10, 10:-10].ravel(),
        )[0, 1]
        for dx in range(-6, 7, 2)
        for dy in range(-6, 7, 2)
    )
    assert r > 0.95, f"structural similarity too low: r={r:.4f}"
