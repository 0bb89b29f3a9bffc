"""End-to-end trainer smoke test on the synthetic dataset (slow: CPU compile)."""

import os

import numpy as np
import pytest
import jax

from hmd_ego_pose_tpu.config import Config, DataConfig, EvalConfig, ModelConfig, TrainConfig
from hmd_ego_pose_tpu.data.colibri import ColibriDataset
from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri
from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from hmd_ego_pose_tpu.train.trainer import Trainer
from hmd_ego_pose_tpu.utils.logging import MetricLogger


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("syn_trainer")
    return generate_synthetic_colibri(str(root), num_frames=8, image_size=(256, 256))


@pytest.fixture(scope="module")
def synthetic_root_16(tmp_path_factory):
    # the mesh test needs batch_size 8 (divisible by 8 devices), which needs
    # >= 8 TRAIN frames (0.6 of the set): 16 frames -> 9-10 train
    root = tmp_path_factory.mktemp("syn_trainer16")
    return generate_synthetic_colibri(str(root), num_frames=16, image_size=(256, 256))


def test_trainer_one_epoch(synthetic_root, tmp_path, monkeypatch):
    cfg = Config(
        model=ModelConfig(phi=0, image_size=128),
        train=TrainConfig(
            batch_size=2, learning_rate=1e-4, epochs=1, oversample=1,
            freeze_backbone=False, checkpoint_dir=str(tmp_path / "ckpt"),
        ),
        data=DataConfig(dataset="syn_colibri", fold=0, use_6dof_augmentation=False,
                        use_colorspace_augmentation=False, num_workers=1),
        eval=EvalConfig(score_threshold=0.0, max_detections=4),
    )
    train_ds = ColibriDataset(synthetic_root, fold=0, partition="train")
    val_ds = ColibriDataset(synthetic_root, fold=0, partition="val")

    # a 1-epoch random-init model produces no true positives (metric = inf,
    # correctly no checkpoint); stub the eval so the best-checkpoint path runs
    from hmd_ego_pose_tpu.eval.evaluator import EvalResult
    import hmd_ego_pose_tpu.train.trainer as trainer_mod

    monkeypatch.setattr(
        trainer_mod, "evaluate_model",
        lambda *a, **k: EvalResult(mixed_point_distance_mean_mm=42.0, mean_ap=0.5),
    )

    logger = MetricLogger(log_dir=str(tmp_path / "runs"), stdout=False)
    trainer = Trainer(cfg, train_ds, val_ds, logger=logger)
    best = trainer.fit(epochs=1, max_eval_images=2)

    # a checkpoint was written (score_threshold 0 guarantees detections)
    assert best is not None and os.path.exists(best)
    params, bn_state, meta = restore_checkpoint(best)
    assert "epoch" in meta and meta["epoch"] == 0
    # restored tree matches the live one structurally and numerically
    live = jax.device_get(trainer.state.params)
    flat_live = jax.tree.leaves(live)
    flat_restored = jax.tree.leaves(params)
    assert len(flat_live) == len(flat_restored)
    for a, b in zip(flat_live, flat_restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # metrics were logged
    assert os.path.exists(logger.jsonl_path)
    assert sum(1 for _ in open(logger.jsonl_path)) >= 2


def test_resume_from_checkpoint_continues_training(synthetic_root, tmp_path, monkeypatch):
    """Checkpoint -> restore -> further training: the resume path the
    reference left as dead code (train.py:132-146) must actually work."""
    from hmd_ego_pose_tpu.eval.evaluator import EvalResult
    import hmd_ego_pose_tpu.train.trainer as trainer_mod

    monkeypatch.setattr(
        trainer_mod, "evaluate_model",
        lambda *a, **k: EvalResult(mixed_point_distance_mean_mm=42.0),
    )

    cfg = Config(
        model=ModelConfig(phi=0, image_size=128),
        train=TrainConfig(batch_size=2, learning_rate=1e-4, epochs=1, oversample=1,
                          freeze_backbone=False, checkpoint_dir=str(tmp_path / "ckpt")),
        data=DataConfig(use_6dof_augmentation=False, use_colorspace_augmentation=False,
                        num_workers=1),
    )
    train_ds = ColibriDataset(synthetic_root, fold=0, partition="train")
    val_ds = ColibriDataset(synthetic_root, fold=0, partition="val")

    logger = MetricLogger(log_dir=str(tmp_path / "runs"), stdout=False)
    t1 = Trainer(cfg, train_ds, val_ds, logger=logger)
    best = t1.fit(epochs=1)
    assert best is not None

    params, bn_state, meta = restore_checkpoint(best)
    # restored weights equal the trained ones
    a = jax.tree.leaves(jax.device_get(t1.state.params))
    b = jax.tree.leaves(params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # resume: a new trainer from the restored weights trains further
    t2 = Trainer(cfg, train_ds, val_ds, logger=logger, params=params, bn_state=bn_state)
    t2.fit(epochs=1)
    moved = [
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(jax.tree.leaves(jax.device_get(t2.state.params)), b)
    ]
    assert max(moved) > 0  # parameters kept training after the restore


def test_trainer_mesh_device_resident_epoch_runner(synthetic_root_16, tmp_path, monkeypatch):
    """Multi-chip DP composes with the TPU-native training path (VERDICT r2 #1):
    under an 8-device mesh the trainer must still take the HBM-resident
    dataset + whole-epoch-scan path; round 2 gated it on ``mesh is None``."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from hmd_ego_pose_tpu.eval.evaluator import EvalResult
    from hmd_ego_pose_tpu.parallel.mesh import make_mesh
    import hmd_ego_pose_tpu.train.trainer as trainer_mod

    monkeypatch.setattr(
        trainer_mod, "evaluate_model",
        lambda *a, **k: EvalResult(mixed_point_distance_mean_mm=42.0),
    )
    cfg = Config(
        model=ModelConfig(phi=0, image_size=128),
        # oversample 4 -> a 4-step epoch; max_steps_per_dispatch 2 exercises
        # CHUNKED dispatch under the mesh (slice + device_put per chunk)
        train=TrainConfig(batch_size=8, learning_rate=1e-4, epochs=1, oversample=4,
                          max_steps_per_dispatch=2,
                          freeze_backbone=False, checkpoint_dir=str(tmp_path / "ckpt")),
        data=DataConfig(num_workers=1),  # device augment + resident stay ON
    )
    train_ds = ColibriDataset(synthetic_root_16, fold=0, partition="train")
    val_ds = ColibriDataset(synthetic_root_16, fold=0, partition="val")
    mesh = make_mesh()
    trainer = Trainer(cfg, train_ds, val_ds, mesh=mesh,
                      logger=MetricLogger(stdout=False))

    # the device-resident epoch-scan path must be ACTIVE under the mesh
    assert trainer.epoch_runner is not None
    assert trainer._device_data is not None
    assert trainer._device_data.frames.sharding.is_fully_replicated

    metrics = trainer.train_epoch(0, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated across the mesh after the sharded epoch
    leaf = jax.tree.leaves(trainer.state.params)[0]
    assert leaf.sharding.is_fully_replicated
    assert int(trainer.state.step) == metrics["steps"]


def test_resume_restores_optimizer_moments(synthetic_root, tmp_path, monkeypatch):
    """last.npz carries the optimizer leaves + step counter; a resumed
    Trainer continues with the SAME Adam moments instead of re-warming them
    (shift-based runs previously reset the moments every restart)."""
    from hmd_ego_pose_tpu.eval.evaluator import EvalResult
    from hmd_ego_pose_tpu.train.checkpoint import restore_opt_leaves
    import hmd_ego_pose_tpu.train.trainer as trainer_mod

    monkeypatch.setattr(
        trainer_mod, "evaluate_model",
        lambda *a, **k: EvalResult(mixed_point_distance_mean_mm=42.0),
    )
    cfg = Config(
        model=ModelConfig(phi=0, image_size=128),
        train=TrainConfig(batch_size=2, learning_rate=2e-4, epochs=1, oversample=1,
                          freeze_backbone=False, checkpoint_dir=str(tmp_path / "ckpt")),
        data=DataConfig(use_6dof_augmentation=False, use_colorspace_augmentation=False,
                        num_workers=1),
    )
    train_ds = ColibriDataset(synthetic_root, fold=0, partition="train")
    t1 = Trainer(cfg, train_ds, train_ds, logger=MetricLogger(stdout=False))
    t1.fit(epochs=1)

    last = os.path.join(cfg.train.checkpoint_dir, "last.npz")
    params, bn, meta = restore_checkpoint(last)
    leaves = restore_opt_leaves(last)
    assert leaves is not None and meta["train_step"] == t1._steps_done > 0

    t2 = Trainer(cfg, train_ds, train_ds, logger=MetricLogger(stdout=False),
                 params=params, bn_state=bn, opt_leaves=leaves,
                 start_step=meta["train_step"])
    # moments match bit-for-bit and the step counter continues
    a = jax.tree.leaves(jax.device_get(t1.state.opt_state))
    b = jax.tree.leaves(jax.device_get(t2.state.opt_state))
    assert len(a) == len(b)
    diffs = [
        float(np.max(np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64))))
        for x, y in zip(a, b) if np.asarray(x).dtype != np.int32
    ]
    # every leaf except the re-injected learning rate is identical; the lr
    # leaf equals config lr in both trainers here, so ALL must match
    assert max(diffs) == 0.0
    assert int(t2.state.step) == meta["train_step"]
    # and it keeps training from there
    t2.fit(epochs=1)
    assert t2._steps_done == 2 * meta["train_step"]

    # a mismatched optimizer is rejected loudly (SGD has fewer leaves than
    # Adam's mu+nu moments)
    import dataclasses

    bad_cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, fine_tune=True))
    with pytest.raises(ValueError, match="optimizer state mismatch"):
        Trainer(bad_cfg, train_ds, train_ds, logger=MetricLogger(stdout=False),
                params=params, bn_state=bn, opt_leaves=leaves)


def test_plan_epoch_chunks():
    from hmd_ego_pose_tpu.train.step import plan_epoch_chunks

    # short epochs stay a single dispatch; <=0 disables chunking
    assert plan_epoch_chunks(120, 160) == [120]
    assert plan_epoch_chunks(160, 160) == [160]
    assert plan_epoch_chunks(375, 0) == [375]
    # 187 = 11*17 has no divisor in the bounded search window -> near-equal
    assert plan_epoch_chunks(187, 160) == [94, 93]
    # run D's crashing shape: 375 steps -> equal 125-step chunks (ONE program)
    assert plan_epoch_chunks(375, 160) == [125, 125, 125]
    # prime step counts fall back to a near-equal split: sums to n, every
    # chunk within the cap, at most two distinct lengths (two compiles max)
    for n in (373, 521, 997):
        chunks = plan_epoch_chunks(n, 160)
        assert sum(chunks) == n
        assert max(chunks) <= 160
        assert len(set(chunks)) <= 2


def test_chunked_epoch_matches_unchunked(synthetic_root, tmp_path, monkeypatch):
    """Chunked epoch dispatch is semantics-preserving: same per-step keys and
    indices, so params and epoch-mean metrics must match the single-program
    path (the relay crashes on over-long scans; see plan_epoch_chunks)."""
    import jax.numpy as jnp

    def make(ckpt, max_chunk):
        cfg = Config(
            model=ModelConfig(phi=0, image_size=128),
            train=TrainConfig(batch_size=2, learning_rate=1e-4, epochs=1,
                              oversample=1, freeze_backbone=False,
                              checkpoint_dir=str(tmp_path / ckpt),
                              max_steps_per_dispatch=max_chunk),
            data=DataConfig(num_workers=1),  # device augment + resident ON
        )
        train_ds = ColibriDataset(synthetic_root, fold=0, partition="train")
        val_ds = ColibriDataset(synthetic_root, fold=0, partition="val")
        return Trainer(cfg, train_ds, val_ds, logger=MetricLogger(stdout=False))

    t_whole = make("ck_a", 0)   # one program for the whole epoch
    t_chunk = make("ck_b", 1)   # one dispatch per step
    assert t_whole.epoch_runner is not None and t_chunk.epoch_runner is not None

    m_whole = t_whole.train_epoch(0, jax.random.PRNGKey(7))
    m_chunk = t_chunk.train_epoch(0, jax.random.PRNGKey(7))
    assert m_whole["steps"] == m_chunk["steps"] >= 2

    for k in ("loss", "classification_loss", "hand_loss"):
        np.testing.assert_allclose(
            float(m_whole[k]), float(m_chunk[k]), rtol=1e-5,
            err_msg=f"epoch-mean {k} diverged under chunking",
        )
    for a, b in zip(jax.tree.leaves(t_whole.state.params),
                    jax.tree.leaves(t_chunk.state.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), rtol=1e-5, atol=1e-7)


def test_windowed_device_resident_epoch(synthetic_root, tmp_path):
    """Datasets over the HBM budget stay TPU-native: the trainer keeps a host
    cache and uploads one random frame window per epoch segment instead of
    falling back to the per-step host pipeline."""
    train_ds = ColibriDataset(synthetic_root, fold=0, partition="train")
    val_ds = ColibriDataset(synthetic_root, fold=0, partition="val")

    # budget sized for a 2-frame window (256^2 rgb+mask ~262KB/frame)
    from hmd_ego_pose_tpu.data.device_dataset import build_host_cache

    per_frame = build_host_cache(train_ds).bytes_per_frame()
    cfg = Config(
        model=ModelConfig(phi=0, image_size=128),
        train=TrainConfig(batch_size=2, learning_rate=1e-4, epochs=1,
                          oversample=2, freeze_backbone=False,
                          checkpoint_dir=str(tmp_path / "ckpt")),
        data=DataConfig(num_workers=1,
                        device_resident_budget_bytes=2 * per_frame + 1024),
    )
    trainer = Trainer(cfg, train_ds, val_ds, logger=MetricLogger(stdout=False))

    assert trainer._host_cache is not None      # windowed mode engaged
    assert trainer._device_data is None         # nothing resident yet
    assert trainer._window_frames == 2
    assert trainer.epoch_runner is not None     # still the TPU-native path

    n_train = len(train_ds)
    metrics = trainer.train_epoch(0, jax.random.PRNGKey(0))
    # every full 2-frame window contributes (2*oversample)//B steps
    expected = sum(
        (w * cfg.train.oversample) // cfg.train.batch_size
        for w in [2] * (n_train // 2) + ([n_train % 2] if n_train % 2 else [])
    )
    assert metrics["steps"] == expected
    assert np.isfinite(float(metrics["loss"]))
    assert int(trainer.state.step) == expected
    assert trainer._device_data is not None     # last window still resident
    assert trainer._device_data.frames.shape[0] <= 2


def test_tiny_budget_falls_back_to_host_pipeline(synthetic_root, tmp_path):
    """A budget below one batch of frames cannot run windowed — the exact
    host pipeline takes over."""
    train_ds = ColibriDataset(synthetic_root, fold=0, partition="train")
    cfg = Config(
        model=ModelConfig(phi=0, image_size=128),
        train=TrainConfig(batch_size=2, checkpoint_dir=str(tmp_path / "ckpt")),
        data=DataConfig(num_workers=1, device_resident_budget_bytes=1000),
    )
    trainer = Trainer(cfg, train_ds, train_ds, logger=MetricLogger(stdout=False))
    assert trainer.epoch_runner is None
    assert trainer._host_cache is None


def test_trainer_mesh_rejects_indivisible_batch(synthetic_root, tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from hmd_ego_pose_tpu.parallel.mesh import make_mesh

    cfg = Config(
        model=ModelConfig(phi=0, image_size=128),
        train=TrainConfig(batch_size=6, checkpoint_dir=str(tmp_path / "ckpt")),
        data=DataConfig(num_workers=1),
    )
    ds = ColibriDataset(synthetic_root, fold=0, partition="train")
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(cfg, ds, ds, mesh=make_mesh())


def test_checkpoint_orbax_backend(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    tree = {"a": {"b": np.arange(6.0).reshape(2, 3)}, "c": [np.ones(4), np.zeros(2)]}
    bn = {"m": np.full(3, 2.0)}
    path = save_checkpoint(str(tmp_path), "ck", tree, bn, {"epoch": 3}, backend="orbax")
    assert os.path.isdir(path)
    params, bn2, meta = restore_checkpoint(path)
    np.testing.assert_array_equal(params["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(params["c"][1], np.zeros(2))
    np.testing.assert_array_equal(bn2["m"], bn["m"])
    assert meta == {"epoch": 3}


def test_checkpoint_roundtrip_nested(tmp_path):
    tree = {
        "a": {"b": [np.arange(3.0), np.ones((2, 2))], "c": np.float32(2.5)},
        "d": [{"e": np.zeros(1)}],
    }
    bn = {"x": [np.ones(4)]}
    path = save_checkpoint(str(tmp_path), "test", tree, bn, {"k": 1})
    params, bn2, meta = restore_checkpoint(path)
    np.testing.assert_array_equal(params["a"]["b"][0], np.arange(3.0))
    np.testing.assert_array_equal(params["a"]["b"][1], np.ones((2, 2)))
    np.testing.assert_array_equal(bn2["x"][0], np.ones(4))
    assert meta == {"k": 1}
