from dip_admm_tpu.ops import phantoms, radon, tv, linalg  # noqa: F401
