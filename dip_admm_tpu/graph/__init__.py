from dip_admm_tpu.graph import precisions, topology  # noqa: F401
