"""Experiment orchestration (block-7 parity).

``run_one_strategy`` mirrors ``/root/reference/block_7_main_ver3.py:30-329``:
build the per-pixel graph for a strategy, run decentralized ADMM, and emit
the full artifact set; ``run_all_strategies`` mirrors the ver0 orchestrator
(``block_7_main_ver0.py:192-204``) running mst / chain / knn back-to-back.

Unlike the reference (one hard-coded ``main()``), runs are parameterized by
``ProblemConfig`` and can execute on a device mesh (``mesh=`` sharded over
graph nodes) or a single chip.
"""

from __future__ import annotations

import dataclasses
import os
from datetime import datetime
from typing import Optional

import numpy as np

from dip_admm_tpu.config import ProblemConfig
from dip_admm_tpu.core import admm
from dip_admm_tpu.data import loader
from dip_admm_tpu.graph import topology
from dip_admm_tpu.utils import artifacts
from dip_admm_tpu.utils.imaging import psnr


def run_one_strategy(
    cfg: ProblemConfig,
    out_root: str,
    strategy: Optional[str] = None,
    k: Optional[int] = None,
    mesh=None,
    problem: Optional[loader.Problem] = None,
    write_artifacts: bool = True,
    mode: Optional[str] = None,
    per_node_phantoms: bool = False,
    snapshot_every: Optional[int] = None,
):
    """Run decentralized ADMM for one graph strategy; returns
    (x [P, n] numpy, history dict numpy, summary dict).

    ``snapshot_every`` writes per-node reconstruction snapshots every K
    outer iterations (single-device path; ref block_6 ver2:269-281)."""
    if strategy is not None or k is not None:
        g = cfg.graph
        g = dataclasses.replace(
            g,
            strategy=strategy if strategy is not None else g.strategy,
            k=k if k is not None else g.k,
        )
        cfg = dataclasses.replace(cfg, graph=g)

    tag = (
        f"{cfg.graph.strategy}_k{cfg.graph.k}"
        if cfg.graph.strategy == "knn"
        else cfg.graph.strategy
    )
    out_dir = os.path.join(out_root, tag)

    if problem is None:
        problem = loader.build_problem(
            cfg, mode=mode, per_node_phantoms=per_node_phantoms
        )
    elif problem.cfg.graph != cfg.graph:
        problem = loader.rebuild_graph(problem, cfg.graph)

    if mesh is not None:
        from dip_admm_tpu.parallel import admm_sharded

        res = admm_sharded.run_admm_sharded(problem, cfg.admm, mesh=mesh)
    elif snapshot_every is not None:
        res = admm.run_admm_snapshots(
            problem, cfg.admm,
            snapshot_dir=os.path.join(out_dir, "snapshots"),
            snapshot_every=snapshot_every,
        )
    else:
        res = admm.run_admm(problem, cfg.admm)

    n_iters = int(res.n_iters)
    x = np.asarray(res.x)
    hist = {kk: np.asarray(v) for kk, v in res.history.items()}
    N = problem.N
    x_true = np.asarray(problem.x_true)
    m_per_node = np.asarray(
        problem.angle_valid.sum(axis=1) * cfg.geometry.n_det
    )

    summary = {
        "tag": tag,
        "n_iters": n_iters,
        "final_primal": float(hist["primal"][n_iters - 1]),
        "final_dual": float(hist["dual"][n_iters - 1]),
        "mean_psnr": float(
            np.mean(
                [psnr(x[i], x_true, data_range=x_true.max()) for i in range(len(x))]
            )
        ),
        "graph": topology.union_summary(problem.keep),
        "out_dir": out_dir,
    }

    if write_artifacts:
        artifacts.save_run_parameters(out_dir, cfg, extra=summary["graph"])
        artifacts.save_union_graph(
            problem.adj, os.path.join(out_dir, "union_figs"), tag
        )
        artifacts.save_recons(x, N, out_dir, tag)
        artifacts.save_history_artifacts(
            hist, n_iters, out_dir, tag, m_per_node=m_per_node, N=N
        )
        artifacts.flush_async()

    return x, hist, summary


def run_all_strategies(
    cfg: ProblemConfig, out_root: Optional[str] = None, mesh=None,
    mode: Optional[str] = None, per_node_phantoms: bool = False,
):
    """mst, chain, knn back-to-back on the same data
    (ref ``block_7_main_ver0.py:192-204``); the problem operators/sinograms
    are shared, only the graph layer is rebuilt per strategy."""
    if out_root is None:
        out_root = f"Recon_Out_ADMM_{datetime.now().strftime('%Y%m%d_%H%M%S')}"
    problem = loader.build_problem(
        cfg, mode=mode, per_node_phantoms=per_node_phantoms
    )
    results = {}
    for strategy in ("mst", "chain", "knn"):
        x, hist, summary = run_one_strategy(
            cfg, out_root, strategy=strategy, mesh=mesh, problem=problem
        )
        results[strategy] = summary
    return results


def evaluate_strategies(cfg: ProblemConfig, mesh=None) -> dict:
    """Strategy comparison on final residuals and mean PSNR — the acceptance
    driver sketched by ``/root/reference/test_final_integration.py:35-50``."""
    out = {}
    problem = loader.build_problem(cfg)
    for strategy in ("mst", "chain", "knn"):
        _, _, summary = run_one_strategy(
            cfg, out_root="/tmp/dip_admm_eval", strategy=strategy, mesh=mesh,
            problem=problem, write_artifacts=False,
        )
        out[strategy] = {
            "final_primal": summary["final_primal"],
            "final_dual": summary["final_dual"],
            "mean_psnr": summary["mean_psnr"],
        }
    return out
