"""ngpd_tpu — TPU-native normal-guided point-cloud denoising framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Ruubje/Normal-Guided-Pointcloud-Denoiser (reference mounted read-only at
/root/reference): per-point normal estimation, normal-voting-tensor
feature classification (face / edge / corner), class-specific
normal-guided vertex updates iterated to convergence, Chamfer-style
evaluation, and a learned patch->normal regression track.

Design (TPU-first, not a port):
  * Dense fixed-k ``(N, k)`` neighbor indices in HBM replace the
    reference's ragged CSR ``Selection`` (Selector.py:41-134) — gathers +
    masked axis-1 reductions replace torch_scatter.
  * Closed-form batched symmetric 3x3 eigendecomposition replaces
    ``torch.linalg.eigh`` (Decompositionor.py:169,300).
  * The denoise iteration is one jitted ``lax.scan`` body with per-class
    ``where`` dispatch (classes are data, not Python control flow),
    replacing Processor.denoise()'s per-class index loops
    (Processor.py:119-139).
  * Scale-out is ``jax.sharding.Mesh`` + shard_map over the point axis,
    which the reference (single CUDA GPU) does not have at all.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401

# Light re-exports of the primary user surface.
from .core.cloud import PointCloud  # noqa: F401
from .core.pipeline import denoise, denoise_until_minimum_error  # noqa: F401
from .io.obj import load_obj, save_obj  # noqa: F401
