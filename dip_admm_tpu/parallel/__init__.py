from dip_admm_tpu.parallel import mesh, admm_sharded  # noqa: F401
