"""Parallel/distributed helper tests + scheduler parity vs torch."""

import numpy as np
import pytest
import jax

from hmd_ego_pose_tpu.parallel.distributed import (
    initialize,
    make_global_batch,
    process_local_batch_slice,
)
from hmd_ego_pose_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from hmd_ego_pose_tpu.train.plateau import ReduceLROnPlateau


def test_initialize_is_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize() is False


def test_process_local_batch_slice_single_process():
    assert process_local_batch_slice(32) == slice(0, 32)


def test_make_global_batch_sharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh()
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    g = make_global_batch(mesh, batch)
    assert g["x"].shape == (8, 4)
    assert not g["x"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])


def test_mesh_shardings():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    b = batch_sharding(mesh)
    r = replicated_sharding(mesh)
    assert not b.is_fully_replicated
    assert r.is_fully_replicated


def test_plateau_matches_torch_scheduler():
    """Exact trace parity with torch.optim.lr_scheduler.ReduceLROnPlateau."""
    torch = pytest.importorskip("torch")

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1e-3)
    t_sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=3, threshold=1e-4,
        threshold_mode="rel", cooldown=0, min_lr=1e-7,
    )
    ours = ReduceLROnPlateau(1e-3, factor=0.5, patience=3, threshold=1e-4, min_lr=1e-7)

    rng = np.random.RandomState(0)
    metrics = list(10.0 - np.linspace(0, 3, 10)) + [7.0] * 12 + list(rng.uniform(5, 9, 20))
    for m in metrics:
        t_sched.step(m)
        ours_lr = ours.step(m)
        torch_lr = opt.param_groups[0]["lr"]
        assert ours_lr == pytest.approx(torch_lr), (m, ours_lr, torch_lr)


def test_dryrun_multichip_inprocess():
    """Driver multi-chip dryrun runs in-process when devices are available."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_bootstraps_subprocess(monkeypatch):
    """With too few devices, dryrun re-execs with a forced virtual CPU mesh."""
    import __graft_entry__ as g

    calls = {}

    class _Result:
        returncode = 0

    def fake_run(cmd, cwd=None, env=None):
        calls["cmd"], calls["cwd"], calls["env"] = cmd, cwd, env
        return _Result()

    monkeypatch.setattr(g.subprocess, "run", fake_run)
    monkeypatch.setattr(jax, "devices", lambda: jax.devices("cpu")[:1])
    g.dryrun_multichip(4)

    env = calls["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=4" in env["XLA_FLAGS"]
    # must not carry a stale device-count flag from the parent env
    assert env["XLA_FLAGS"].count("xla_force_host_platform_device_count") == 1
    assert "_dryrun_multichip_impl(4)" in calls["cmd"][-1]
