"""TPU-native differentiable 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
GloireLINVANI/3D_Gaussian_Splatting_Project: differentiable splat rendering
(forward + backward TPU kernels), per-gaussian label channels with
selection/displacement/visibility/recolor editing, majority-vote labeling over
camera rigs, k-means / region-growing clustering, and IoU evaluation — sharded
over device meshes (gaussians over chips, image tiles over hosts).
"""

from gsplat_tpu.config import Config, DEFAULT, NO_SELECTION, SH_C0, UNLABELED
from gsplat_tpu.scene import GaussianScene

__version__ = "0.1.0"
