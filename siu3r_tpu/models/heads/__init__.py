from siu3r_tpu.models.heads.dpt import (  # noqa: F401
    DPTHead,
    MultiResDPTGSHead,
    postprocess_pts3d,
)
from siu3r_tpu.models.heads.linear import LinearGS, LinearPts3d  # noqa: F401


def head_factory(head_type: str, output_mode: str, *, dec_depth: int = 12,
                 out_nchan: int = 3, patch_size: int = 16):
    """Build a prediction head (reference heads/__init__.py:13-41)."""
    if head_type == "linear" and output_mode == "pts3d":
        return LinearPts3d(patch_size=patch_size)
    if head_type == "dpt" and output_mode == "pts3d":
        return DPTHead(num_channels=3, head_type="regression")
    if head_type == "dpt" and output_mode == "gs_params":
        return DPTHead(num_channels=out_nchan, head_type="regression")
    if head_type == "dpt_gs" and output_mode == "gs_params":
        return DPTHead(num_channels=out_nchan, head_type="gs_params")
    if head_type == "multi_res_dpt_gs" and output_mode == "gs_params":
        return MultiResDPTGSHead(num_channels=out_nchan)
    raise NotImplementedError(f"unexpected {head_type=} {output_mode=}")
