from dip_admm_tpu.runners import experiment  # noqa: F401
