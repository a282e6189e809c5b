from dip_admm_tpu.data import loader  # noqa: F401
