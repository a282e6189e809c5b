from dip_admm_tpu.utils import imaging  # noqa: F401
