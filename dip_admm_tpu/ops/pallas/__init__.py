from dip_admm_tpu.ops.pallas import consensus  # noqa: F401
