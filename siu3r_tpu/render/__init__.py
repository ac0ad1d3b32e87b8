from siu3r_tpu.render.rasterizer import rasterize  # noqa: F401
from siu3r_tpu.render.projection import project_gaussians  # noqa: F401
