"""Orchestration smoke tests: the full block-7 artifact set on a tiny run."""

import json
import os

import numpy as np
import pytest

from dip_admm_tpu.config import (
    AdmmConfig,
    GeometryConfig,
    GraphConfig,
    NodeSolverConfig,
    ProblemConfig,
)
from dip_admm_tpu.runners import cli, experiment


def tiny_cfg():
    return ProblemConfig(
        geometry=GeometryConfig(N=12, num_nodes=3, angles_total=12),
        graph=GraphConfig(strategy="knn", k=1, seed=123),
        admm=AdmmConfig(
            lam_tv=0.02, rho=2.0, max_iters=4, eps_pri=1e-9, eps_dual=1e-9,
            node=NodeSolverConfig(max_inner=30, check_every=15),
        ),
        phantom="const",
    )


def test_run_one_strategy_artifacts(tmp_path):
    x, hist, summary = experiment.run_one_strategy(
        tiny_cfg(), str(tmp_path), strategy="knn", k=1
    )
    assert x.shape == (3, 144)
    assert summary["n_iters"] == 4
    out = tmp_path / "knn_k1"
    files = {p.name for p in out.rglob("*")}
    # Parameter dump, reconstructions, residual curves, MSE plots, graphs.
    assert "run_parameters.txt" in files
    for want in (
        "knn_k1_node_0.npy", "knn_k1_node_0.png",
        "knn_k1_residuals.png", "knn_k1_primal_hist.npy",
        "knn_k1_obj_per_node.npy", "knn_k1_pri_per_node.png",
        "knn_k1_sino_mse_per_node.npy", "knn_k1_img_mse_total.npy",
        "knn_k1_g_norm_per_node.png",
        "knn_k1_inner_iters_per_node.npy", "knn_k1_accept_code_per_node.npy",
        "knn_k1_rho_hist.npy",
        "pixel_union_graph_knn_k1.png", "pixel_union_degree_knn_k1.png",
    ):
        assert want in files, f"missing artifact {want}"
    # Normalizations match the reference definitions: per-m_i and per-N^2.
    sino_mse = np.load(out / "knn_k1_sino_mse_per_node.npy")
    raw = hist["mse_sino_per_node"][:4]
    m_i = 4 * 12  # angles_per_node * det
    np.testing.assert_allclose(sino_mse, raw / m_i, rtol=1e-6)


def test_run_all_strategies(tmp_path):
    results = experiment.run_all_strategies(tiny_cfg(), str(tmp_path))
    assert set(results) == {"mst", "chain", "knn"}
    for summary in results.values():
        assert summary["graph"]["connected"]
        assert np.isfinite(summary["final_primal"])


def test_cli_main(tmp_path, capsys):
    cli.main([
        "--N", "12", "--nodes", "3", "--angles", "12", "--strategy", "knn",
        "--k", "1", "--max-iters", "3", "--max-inner", "20",
        "--eps-pri", "1e-9", "--eps-dual", "1e-9",
        "--out", str(tmp_path),
    ])
    out = json.loads(capsys.readouterr().out)
    assert "knn" in out
    assert out["knn"]["n_iters"] == 3


def test_run_one_strategy_checkpointing(tmp_path):
    # Segmented run with periodic async checkpoints matches the straight
    # run exactly, and --resume continues an interrupted run to the same
    # final state.
    import dataclasses

    from dip_admm_tpu.data import serialization

    cfg = tiny_cfg()
    x_ref, _, _ = experiment.run_one_strategy(
        cfg, str(tmp_path / "ref"), write_artifacts=False
    )
    x_ck, _, summary = experiment.run_one_strategy(
        cfg, str(tmp_path / "ck"), write_artifacts=False, checkpoint_every=2
    )
    np.testing.assert_allclose(x_ck, x_ref, rtol=1e-6, atol=1e-6)
    ckpt = os.path.join(summary["out_dir"], "checkpoint.npz")
    assert os.path.exists(ckpt)
    state, _ = serialization.load_checkpoint(ckpt)
    assert int(state.k) == 4

    # Interrupt at 2 iterations (max_iters=2 run), then resume to 4.
    cfg2 = dataclasses.replace(
        cfg, admm=dataclasses.replace(cfg.admm, max_iters=2)
    )
    _, _, s2 = experiment.run_one_strategy(
        cfg2, str(tmp_path / "part"), write_artifacts=False,
        checkpoint_every=2,
    )
    x_res, _, _ = experiment.run_one_strategy(
        cfg, str(tmp_path / "res"), write_artifacts=False,
        checkpoint_every=2,
        resume=os.path.join(s2["out_dir"], "checkpoint.npz"),
    )
    np.testing.assert_allclose(x_res, x_ref, rtol=1e-6, atol=1e-6)


def test_cli_node_solver_flags(tmp_path, capsys):
    """--algorithm/--eps0/--check-every/--plateau-tol reach the node config."""
    args = cli.build_parser().parse_args([
        "--algorithm", "pcv", "--eps0", "1.5", "--check-every", "5",
        "--plateau-tol", "0.0",
    ])
    cfg = cli.config_from_args(args)
    assert cfg.admm.node.algorithm == "pcv"
    assert cfg.admm.node.eps0 == 1.5
    assert cfg.admm.node.check_every == 5
    assert cfg.admm.node.plateau_tol == 0.0


def test_cli_recommended_preset():
    args = cli.build_parser().parse_args(["--recommended"])
    cfg = cli.config_from_args(args)
    assert cfg.admm.relax_alpha == 1.8
    assert cfg.admm.node.algorithm == "fcv"
    # Explicit flags win over the preset.
    args = cli.build_parser().parse_args(
        ["--recommended", "--relax-alpha", "1.5", "--algorithm", "ppdhg"]
    )
    cfg = cli.config_from_args(args)
    assert cfg.admm.relax_alpha == 1.5
    assert cfg.admm.node.algorithm == "ppdhg"


def test_cli_pdhg_consensus_solver(tmp_path, capsys):
    cli.main([
        "--N", "12", "--nodes", "3", "--angles", "12",
        "--solver", "pdhg-consensus", "--pdhg-outer", "3",
        "--out", str(tmp_path),
    ])
    out = json.loads(capsys.readouterr().out)
    s = out["pdhg-consensus"]
    assert s["solver"] == "pdhg-consensus"
    assert np.isfinite(s["mean_node_psnr"]) and np.isfinite(s["agg_psnr"])
    files = {p.name for p in (tmp_path / "pdhg_consensus").rglob("*")}
    assert "pdhg_nodes_node_0.png" in files
    assert "img_mse_agg.npy" in files


def test_cli_centralized_solvers(tmp_path, capsys):
    cli.main([
        "--N", "12", "--nodes", "3", "--angles", "12",
        "--solver", "centralized", "--out", str(tmp_path),
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["centralized"]["psnr"] > 10.0
    cli.main([
        "--N", "12", "--nodes", "3", "--angles", "12",
        "--solver", "centralized-tv", "--max-inner", "50",
        "--out", str(tmp_path),
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["centralized-tv"]["psnr"] > 10.0


def test_recommended_preset_sets_operating_point():
    """--recommended = fcv + relax 1.8 + 15-inner budget (RESULTS.md round-5
    operating points); explicit flags always win over the preset."""
    from dip_admm_tpu.runners import cli

    # Round-5 preset: circulant-metric inner solver + relax 1.8 + 15-inner
    # budget, checked once at the cap (the Lanczos-certified step converges
    # the node solves in ~15 iterations at the round-4 25-inner PSNR).
    cfg = cli.config_from_args(cli.build_parser().parse_args(
        ["--N", "16", "--nodes", "2", "--recommended"]))
    assert cfg.admm.node.algorithm == "fcv"
    assert cfg.admm.relax_alpha == 1.8
    assert cfg.admm.node.max_inner == 15
    assert cfg.admm.node.check_every == 15
    assert cfg.admm.node.eps_rel == 0.0

    cfg = cli.config_from_args(cli.build_parser().parse_args(
        ["--N", "16", "--nodes", "2"]))
    assert cfg.admm.node.max_inner == 200
    assert cfg.admm.node.algorithm == "cv"
    assert cfg.admm.node.check_every == 10

    cfg = cli.config_from_args(cli.build_parser().parse_args(
        ["--N", "16", "--nodes", "2", "--recommended", "--max-inner", "80",
         "--algorithm", "ppdhg", "--relax-alpha", "1.5"]))
    assert cfg.admm.node.max_inner == 80
    assert cfg.admm.node.algorithm == "ppdhg"
    assert cfg.admm.relax_alpha == 1.5

    # Explicit flags always win over the preset (None = unset, so an
    # explicit 0 sticks — ADVICE r3).
    cfg = cli.config_from_args(cli.build_parser().parse_args(
        ["--N", "512", "--nodes", "2", "--recommended",
         "--eps-rel", "0.02"]))
    assert cfg.admm.node.eps_rel == 0.02
    cfg = cli.config_from_args(cli.build_parser().parse_args(
        ["--N", "512", "--nodes", "2", "--recommended", "--eps-rel", "0"]))
    assert cfg.admm.node.eps_rel == 0.0
    cfg = cli.config_from_args(cli.build_parser().parse_args(
        ["--N", "512", "--nodes", "2", "--recommended",
         "--check-every", "5"]))
    assert cfg.admm.node.check_every == 5


def test_cli_per_node_phantoms(tmp_path, capsys):
    """Build-mode parity through the runner (ref block_2_load_odl_data.py:
    134-137): each node measures its own randomized phantom."""
    cli.main([
        "--N", "12", "--nodes", "3", "--angles", "12", "--strategy", "knn",
        "--k", "1", "--max-iters", "2", "--max-inner", "10",
        "--eps-pri", "1e-9", "--eps-dual", "1e-9",
        "--per-node-phantoms", "--out", str(tmp_path),
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["knn"]["n_iters"] == 2


def test_cli_save_and_load_problem(tmp_path, capsys):
    import json

    pb = str(tmp_path / "prob.npz")
    cli.main([
        "--N", "16", "--nodes", "3", "--angles", "12", "--max-iters", "2",
        "--max-inner", "10", "--save-problem", pb,
        "--out", str(tmp_path / "a"),
    ])
    out_a = json.loads(capsys.readouterr().out)
    assert (tmp_path / "prob.npz").exists()
    # Reload: identical data -> identical trajectory; solver flags still
    # come from the CLI (different max-iters applies).
    cli.main([
        "--N", "16", "--nodes", "3", "--angles", "12", "--max-iters", "2",
        "--max-inner", "10", "--load-problem", pb,
        "--out", str(tmp_path / "b"),
    ])
    out_b = json.loads(capsys.readouterr().out)
    assert out_b["knn"]["final_primal"] == out_a["knn"]["final_primal"]
    assert out_b["knn"]["mean_psnr"] == out_a["knn"]["mean_psnr"]


def test_bench_scaling_virtual_smoke():
    """The hardware-ready scaling script (VERDICT r4 #8) must run its full
    layout sweep — node mesh + node x pixel leg — unmodified on the virtual
    mesh, so the first real-hardware round spends zero time on plumbing.
    Subprocess: the script pins its own jax platform config."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "bench_scaling.py"),
         "--virtual", "--N", "16", "--nodes", "4", "--outers", "2",
         "--reps", "1", "--row-block", "8", "--mode", "fft_skew"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "(4, 2)" in out.stdout  # the node x pixel leg was swept
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith(("1x", "2x", "4x"))]
    assert len(lines) == 4, out.stdout
