"""SIU3R-TPU: a TPU-native (JAX/XLA/Pallas) framework for simultaneous scene
understanding and 3D reconstruction.

Re-implements the capabilities of the SIU3R reference (WU-CVGL/SIU3R):
feed-forward two-/multi-view reconstruction producing pixel-aligned 3D
Gaussians plus semantic / instance / panoptic / text-referred segmentation
lifted onto those Gaussians — designed TPU-first (SPMD meshes, functional
transforms, Pallas kernels for the hot ops).
"""

__version__ = "0.1.0"

from siu3r_tpu.gaussians import Gaussians  # noqa: F401
