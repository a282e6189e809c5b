from dip_admm_tpu.core import admm, node_solver  # noqa: F401
