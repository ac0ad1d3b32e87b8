from siu3r_tpu.models.heads.dpt import DPTHead, postprocess_pts3d  # noqa: F401
