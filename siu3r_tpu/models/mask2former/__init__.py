from siu3r_tpu.models.mask2former.model import VideoMask2Former  # noqa: F401
