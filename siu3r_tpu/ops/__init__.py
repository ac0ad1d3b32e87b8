from siu3r_tpu.ops.rope import rope2d, rope2d_cos_sin  # noqa: F401
from siu3r_tpu.ops.attention import multi_head_attention  # noqa: F401
