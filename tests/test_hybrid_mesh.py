"""Multi-slice (DCN-hybrid) mesh layout.

The reference is single-device (SURVEY.md §2.4); multi-slice scale-out is
mesh-native here: make_mesh(slices=S) arranges the "data" axis as
slices x per-slice-chips with the slice factor OUTERMOST, so DP
collectives reduce over in-slice ICI first and only per-slice partials
cross DCN. Axis names stay ("data", "model") — every existing
P("data")/P("model") annotation works on a hybrid mesh unchanged.
"""
import jax
import numpy as np
import pytest

from audio_classification_tpu.parallel.mesh import make_mesh


def test_hybrid_mesh_shape_and_axes():
    mesh = make_mesh(8, model_axis=2, slices=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    assert mesh.axis_names == ("data", "model")


def test_hybrid_mesh_slice_major_data_axis():
    """Data-axis rows group by slice: rows [0, S0) are slice 0's chips."""
    mesh = make_mesh(8, model_axis=2, slices=2)
    devs = list(jax.devices())[:8]
    grid = np.asarray(mesh.devices)
    assert grid.shape == (4, 2)
    # slice 0 = devices 0..3 occupies the first 2 data rows, slice 1 the rest
    assert {d.id for d in grid[:2].ravel()} == {d.id for d in devs[:4]}
    assert {d.id for d in grid[2:].ravel()} == {d.id for d in devs[4:]}
    # TP pairs never straddle the slice boundary
    for row in grid:
        in_slice0 = [d.id < devs[4].id for d in row]
        assert all(in_slice0) or not any(in_slice0)


def test_hybrid_mesh_validation():
    with pytest.raises(ValueError, match="divide"):
        make_mesh(8, model_axis=1, slices=3)
    # a TP axis that would have to straddle slices fails the divisibility
    # gate (model_axis * slices > n), so TP can never cross DCN
    with pytest.raises(ValueError, match="divide"):
        make_mesh(8, model_axis=8, slices=2)


def test_existing_shardings_work_on_hybrid_mesh():
    """One sharded train step on a hybrid mesh == the plain-mesh step.

    On a homogeneous device list the hybrid arrangement preserves device
    order, so the same seed must produce the same loss — the point is that
    the trainer's P("data")/P("model") specs bind to the hybrid mesh
    without edits.
    """
    from audio_classification_tpu.models.convtasnet import ConvTasNetConfig
    from audio_classification_tpu.train.trainer import SeparatorTrainer

    cfg = ConvTasNetConfig(n_src=2, enc_dim=32, enc_kernel=16, bottleneck=16,
                           hidden=32, n_blocks=1, n_repeats=1)
    rng = np.random.default_rng(0)
    refs = rng.standard_normal((4, 2, 4000)).astype(np.float32) * 0.3
    mix = refs.sum(axis=1)
    mask = np.ones((4, 4000), np.float32)

    losses = []
    for slices in (1, 2):
        mesh = make_mesh(8, model_axis=2, slices=slices)
        tr = SeparatorTrainer(cfg, mesh=mesh, lr=1e-3, seed=0)
        losses.append(float(tr.train_step(mix, refs, mask)))
    assert np.isfinite(losses[0])
    assert abs(losses[0] - losses[1]) < 1e-5, losses


def test_cli_slices_flag_plumbs_to_config():
    from audio_classification_tpu.cli.offline_overlap_3src import (
        config_from_args, parse_args)

    args = parse_args(["--input-wavs", "a.wav", "--target-wav", "t.wav",
                       "--slices", "2", "--data-parallel", "4",
                       "--model-parallel", "2"])
    cfg = config_from_args(args)
    assert cfg.slices == 2 and cfg.data_parallel == 4 and cfg.model_parallel == 2
