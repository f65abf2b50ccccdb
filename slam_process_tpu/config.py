"""Typed configuration for every stage of the engine.

The reference scatters its hyper-parameters across three styles (argparse,
positional argv, edit-the-constants classes and hard-coded Windows paths —
see reference bs_beam_correction.py:23-25, heatmap_gemini_v1-2.py:18-33,
heatmap_gemini_v1-7.py:657-699).  Here every tunable lives in one frozen
dataclass tree so a pipeline run is fully described by a single object.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Wire-format constants for the 11-byte v3 frame format.

    Reference: serial_hex_to_excel_v3.py:41-103.  The frame is
    [FLAG 0xCC/0x33][UE 00xxxxxx][BS 11xxxxxx][CLK x5 01xxxxxx little-endian
    6-bit limbs][RSS x3 10xxxxxx -> 18-bit little-endian].
    """

    frame_len: int = 11
    flag_true: int = 0xCC   # FLAG column value 1 (baseline marker)
    flag_false: int = 0x33  # FLAG column value 0 (normal frame)
    # Interior tag classes are structural to the wire format (the >=11-byte
    # spacing theorem depends on them) and are fixed in ops/decode.py's
    # _OFFSET_TAGS rather than configurable here.


@dataclasses.dataclass(frozen=True)
class CorrectConfig:
    """CLK-based BS-beam reconstruction constants.

    Reference: bs_beam_correction.py:23-25 (CYCLE/TOL/MOD_BASE) and the
    correction rule at :64-76 — corrected = (bs_b + round(d/CYCLE)) % MOD
    accepted iff |d - round(d/CYCLE)*CYCLE| <= TOL, min-residual baseline.
    """

    cycle: int = 61_000
    tol: int = 500
    mod_base: int = 64


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Intensity-matrix assembly (the pivot_data equivalent).

    Reference: heatmap_gemini_v1-7.py:108-160 (ln-transform before the
    groupby mean, fillna with the global min of the aggregated table) and
    excel_heatmap.py:272-300 (plain mean pivot, NaN kept for empty cells).
    """

    n_beams: int = 64
    log_transform: bool = False       # v1-7 pre-log: drop RSS<=0, RSS := ln(RSS)
    fill_with_min: bool = True        # fillna(global min of cell means)
    keep_nan: bool = False            # excel_heatmap keeps NaN (masked render)
    flag_filter: Optional[int] = None  # excel_heatmap_v2 keeps only FLAG==1


@dataclasses.dataclass(frozen=True)
class DictionaryConfig:
    """Gaussian-beam dictionary for the sparse estimators.

    Reference: heatmap_gemini_v1-7.py:177-198 — sigma = beam_width/2.355
    (FWHM), linspace grid at grid_res with >=10 points per axis.
    """

    grid_res: float = 0.1
    beam_width: float = 1.4
    min_grid_points: int = 10
    # v1 uses np.arange (end-exclusive) grids; v1-4+ use linspace with a
    # >=10-point floor.  "linspace" | "arange"
    grid_kind: str = "linspace"


@dataclasses.dataclass(frozen=True)
class OmpConfig:
    """NN-OMP estimation loop (reference heatmap_gemini_v1-7.py:200-268)."""

    max_paths: int = 20
    min_power_ratio: float = 3e-4
    # Bounded inner iterations for the jittable NNLS active-set solve.
    nnls_max_iter: int = 64


@dataclasses.dataclass(frozen=True)
class SmSicConfig:
    """SM-SIC masked successive cancellation (heatmap_gemini_v3.py:132-214)."""

    max_paths: int = 3
    proximity_mask_radius: float = 2.0
    cross_mask_width: float = 5.0
    nlos_mask_radius: float = 1.0
    stop_ratio: float = 0.1
    beam_width: float = 10.0
    grid_res: float = 0.5


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    """AdvancedPathClassifier thresholds (heatmap_gemini_v1-7.py:284-305,
    driver values :692-699)."""

    sidelobe_width_aoa: float = 5.0
    sidelobe_width_aod: float = 5.0
    nlos_power_thresh_db: float = 0.01
    nlos_angle_separation: float = 15.0
    sidelobe_power_ratio_db: float = 0.15


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Heatmap raster settings.

    Reference: excel_heatmap.py:360-461 (pcolormesh path: blur sigma,
    shifted LogNorm, viridis, NaN transparent) and
    heatmap_gemini_v1-7.py:539-652 (RBF -> 100x100 contourf, dpi 300).
    """

    colormap: str = "viridis"
    use_log: bool = True
    blur_sigma: float = 1.0
    vmin: Optional[float] = None
    vmax: Optional[float] = None
    grid_size: Tuple[int, int] = (100, 100)   # RBF background resample
    contour_levels: int = 50
    dpi: int = 150
    rbf_smooth: float = 0.1


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end session pipeline."""

    decode: DecodeConfig = dataclasses.field(default_factory=DecodeConfig)
    correct: CorrectConfig = dataclasses.field(default_factory=CorrectConfig)
    scene: SceneConfig = dataclasses.field(default_factory=SceneConfig)
    dictionary: DictionaryConfig = dataclasses.field(default_factory=DictionaryConfig)
    omp: OmpConfig = dataclasses.field(default_factory=OmpConfig)
    sm_sic: SmSicConfig = dataclasses.field(default_factory=SmSicConfig)
    classifier: ClassifierConfig = dataclasses.field(default_factory=ClassifierConfig)
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
