from dip_admm_tpu.solvers import centralized, pdhg_consensus, graph_problem  # noqa: F401
