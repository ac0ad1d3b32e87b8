from siu3r_tpu.io.ply import export_ply, read_ply  # noqa: F401
