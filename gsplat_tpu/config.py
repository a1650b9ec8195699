"""Central configuration tree for the TPU gaussian-splatting framework.

Every magic constant scattered through the reference becomes a named field here
(reference: gaussians_selection.js:6-11 Z_NEAR/Z_FAR/NO_SELECTION, js:387 hit
radius, js:709 frustum margin, js:784 2-sigma fragment cutoff, k_means.py:46/202
defaults, region_growing.py:272-278 thresholds, deep_learning_segmentation.py:117
confidence threshold).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Spherical-harmonics DC constant (reference: gaussians_selection.js:566-569).
SH_C0 = 0.28209479177387814

# Sentinel label for "no selection" / unlabeled (reference: gaussians_selection.js:6).
NO_SELECTION = -999999

# Label written by the majority-vote labeler for never-visible gaussians
# (reference: deep_learning_segmentation.py:297-308 uses -1).
UNLABELED = -1


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Near/far planes (reference: gaussians_selection.js:10-11)."""

    z_near: float = 0.2
    z_far: float = 200.0


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Rasterization semantics shared by the NumPy oracle and the TPU kernels.

    The oracle (gsplat_tpu/ref) defines full-precision semantics; the viewer's
    u8 quantization (gaussians_selection.js:549-576) is an export detail.
    """

    tile_size: int = 32
    # Minimum alpha for a gaussian to contribute to a pixel. 1/255 matches the
    # quantization floor of the reference's u8 alpha path.
    alpha_min: float = 1.0 / 255.0
    # Alpha is clamped below 1 so (1 - alpha) never hits exact zero in grads.
    alpha_max: float = 0.999
    # Cutoff radius in "sigmas": alpha < alpha_min is guaranteed outside
    # sqrt(2*ln(opacity/alpha_min)) <= sqrt(2*ln 255) ~= 3.33 sigma, the
    # full-precision analogue of the reference's 2-sigma fragment discard
    # (gaussians_selection.js:783-784) which operates post-u8-quantization.
    sigma_cutoff: float = 3.33
    # Low-pass dilation added to the 2D covariance diagonal (anti-aliasing;
    # ensures every splat covers >= ~1px). 0.3 is the standard 3DGS value.
    cov2d_blur: float = 0.3
    # Early-termination level: once a whole tile's transmittance is below
    # this, remaining chunks are skipped in both kernels (image error bound
    # <= this value per channel). 0.0 = exact mode (no skipping).
    early_stop_eps: float = 1e-5
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class TileConfig:
    """Static-shape budgets for the tile-binning pass (TPU needs fixed shapes)."""

    # Instance chunk length processed per Pallas grid step; also the alignment
    # of each tile's instance range. Multiple of 8 (f32 sublane tile). 64
    # measured best on v5e at 32x32 tiles: halves per-tile padding waste vs
    # 128 while grid-step overhead stays amortized (32 regresses).
    chunk: int = 64
    # Windows processed per Pallas grid step (grouped so consecutive windows
    # of one tile share a grid step and ONE wpg*chunk-row DMA). MEASURED A
    # DUD on v5e (scripts/profile_window_overhead.py): the ~0.3us/window
    # overhead is the per-window scalar reads + @pl.when branches, which
    # grouping retains — all-dead grids cost the same at wpg 1/2/4, live
    # kernels time identically, and the per-tile window rounding inflates
    # the grad-row table ~13%. Default 1; the knob stays for other chips.
    wpg: int = 1
    # Instance budget as a multiple of N (number of gaussians). The binning
    # pass reports overflow; callers can re-run with a bigger budget.
    budget_factor: float = 4.0


@dataclasses.dataclass(frozen=True)
class InteractConfig:
    """Selection / editing behavior (reference: gaussians_selection.js L4)."""

    hit_radius_px: float = 10.0   # js:387
    displacement_step: float = 0.1  # js:1465
    max_label_slots: int = 100    # js:27-28, 675-677, 907-908
    highlight_mix: float = 0.5    # js:795-797
    custom_color_mix: float = 0.6  # js:773-780


@dataclasses.dataclass(frozen=True)
class KMeansConfig:
    """Defaults mirror 3D_clustering/k_means.py:46, 202, 210."""

    k: int = 10
    tol: float = 1e-4
    max_iter: int = 10
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class RegionGrowingConfig:
    """Defaults mirror 3D_clustering/region_growing.py:272-278."""

    normals_k: int = 2000
    neighbors_k: int = 10
    residual_threshold: float = 0.1
    angle_threshold: float = 0.05  # radians
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class VoteConfig:
    """Majority-vote labeler (reference: deep_learning_segmentation.py)."""

    confidence_threshold: float = 0.5  # py:117 (YOLO)
    num_classes: int = 151  # ADE20K classes + unlabeled


@dataclasses.dataclass(frozen=True)
class Config:
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    raster: RasterConfig = dataclasses.field(default_factory=RasterConfig)
    tiles: TileConfig = dataclasses.field(default_factory=TileConfig)
    interact: InteractConfig = dataclasses.field(default_factory=InteractConfig)
    kmeans: KMeansConfig = dataclasses.field(default_factory=KMeansConfig)
    region_growing: RegionGrowingConfig = dataclasses.field(
        default_factory=RegionGrowingConfig)
    vote: VoteConfig = dataclasses.field(default_factory=VoteConfig)


DEFAULT = Config()
