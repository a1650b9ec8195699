"""TPU-native differentiable 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
GloireLINVANI/3D_Gaussian_Splatting_Project: differentiable splat rendering
(forward + backward TPU kernels), per-gaussian label channels with
selection/displacement/visibility/recolor editing, majority-vote labeling over
camera rigs, k-means / region-growing clustering, and IoU evaluation — sharded
over device meshes (gaussians over chips, image tiles over hosts).
"""

import os as _os

# Environments with an early-registering PJRT plugin (the axon remote-TPU
# sitecustomize here) can override the JAX_PLATFORMS env var before user
# code runs; re-assert the user's explicit choice so
# ``JAX_PLATFORMS=cpu python ...`` behaves as documented.
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# Persistent XLA compilation cache: the binning sort alone costs ~18s of
# compile and the full train step ~60s; cache them once per machine. Done at
# import so every entry point (bench, CLIs, viewer, tests, user scripts)
# benefits; opt out with GSPLAT_COMPILE_CACHE=0.
from gsplat_tpu.utils.compile_cache import enable as _enable_compile_cache

try:
    _enable_compile_cache()
except Exception:  # read-only filesystems etc. — caching is best-effort
    pass

from gsplat_tpu.config import Config, DEFAULT, NO_SELECTION, SH_C0, UNLABELED
from gsplat_tpu.scene import GaussianScene

__version__ = "0.3.0"
