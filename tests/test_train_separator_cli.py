"""cli/train_separator: train -> checkpoint -> resume -> export -> serve.

Covers the checkpoint/resume capability the reference lacks (SURVEY.md §5.4)
end-to-end on the virtual mesh: a killed run resumes at its saved step with
optimizer moments intact, and the exported params-only dir loads through
BOTH deployment doors (--sep-checkpoint in build_engine, Separator facade).
"""
import numpy as np
import pytest

from audio_classification_tpu.cli import train_separator as ts


def _run(argv):
    return ts.main(argv)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_sep")
    ckpt, export = str(root / "ck"), str(root / "export")
    before, after = _run([
        "--synthetic", "--steps", "6", "--batch", "2", "--seconds", "0.25",
        "--enc-dim", "16", "--bottleneck", "8", "--hidden", "16",
        "--n-blocks", "2", "--n-repeats", "1", "--log-every", "3",
        "--ckpt-dir", ckpt, "--save-every", "4", "--export", export,
    ])
    return ckpt, export, before, after


def test_train_loss_moves_and_exports(trained):
    ckpt, export, before, after = trained
    import os

    assert os.path.isdir(ckpt) and os.path.isdir(export)
    assert np.isfinite(before) and np.isfinite(after)
    # reproducibility manifest next to both artifacts
    import json

    for d in (ckpt, export):
        meta = json.loads(open(os.path.join(d, "run.json")).read())
        assert meta["argv"]["steps"] == 6 and "git_rev" in meta
        assert "si_sdri_after" in meta


def test_resume_continues_from_saved_step(trained, capsys):
    ckpt, _, _, _ = trained
    # the run saved at step 4 and again at step 6 (final); resuming with
    # --steps 8 must start from 6, not 0
    _run([
        "--synthetic", "--steps", "8", "--batch", "2", "--seconds", "0.25",
        "--enc-dim", "16", "--bottleneck", "8", "--hidden", "16",
        "--n-blocks", "2", "--n-repeats", "1", "--log-every", "100",
        "--ckpt-dir", ckpt, "--save-every", "100", "--resume",
    ])
    out = capsys.readouterr().out
    assert "resumed" in out and "at step 6" in out
    assert "step     7" in out  # first post-resume step logged


@pytest.mark.slow
def test_resume_restores_optimizer_state(tmp_path):
    """Stronger than step-count parity: a save/restore round-trip must
    reproduce the exact same next train step (params AND adam moments)."""
    from audio_classification_tpu.models.convtasnet import ConvTasNetConfig
    from audio_classification_tpu.parallel.mesh import make_mesh
    from audio_classification_tpu.train.trainer import SeparatorTrainer

    cfg = ConvTasNetConfig(n_src=2, enc_dim=16, enc_kernel=16, bottleneck=8,
                           hidden=16, n_blocks=2, n_repeats=1, sample_rate=8000)
    mesh = make_mesh(8, model_axis=1)
    tr = SeparatorTrainer(cfg, mesh=mesh, lr=1e-3, seed=0)
    rng = np.random.default_rng(0)
    mix, refs = ts.synthetic_batch(rng, 8, 2, 2000, 8000)
    tr.train_step(mix, refs, np.ones_like(mix))
    tr.save(str(tmp_path / "ck"))

    mix2, refs2 = ts.synthetic_batch(np.random.default_rng(1), 8, 2, 2000, 8000)
    loss_live = tr.train_step(mix2, refs2, np.ones_like(mix2))

    tr2 = SeparatorTrainer(cfg, mesh=mesh, lr=1e-3, seed=7)  # different init
    assert tr2.restore(str(tmp_path / "ck")) == 1
    loss_resumed = tr2.train_step(mix2, refs2, np.ones_like(mix2))
    assert loss_resumed == pytest.approx(loss_live, abs=1e-5)


def test_export_loads_via_sep_checkpoint_and_facade(trained):
    ckpt, export, _, _ = trained
    from audio_classification_tpu.train.checkpoint import load_params
    from audio_classification_tpu.models.convtasnet import ConvTasNet, ConvTasNetConfig

    cfg = ConvTasNetConfig(n_src=2, enc_dim=16, enc_kernel=16, bottleneck=8,
                           hidden=16, n_blocks=2, n_repeats=1, sample_rate=8000)
    import jax, jax.numpy as jnp

    template = ConvTasNet(cfg).init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 2000)), jnp.ones((1, 2000)))
    params = load_params(template, export)
    # the exported tree IS the trained tree (not the template's init)
    leaves_t = jax.tree.leaves(template)
    leaves_p = jax.tree.leaves(params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves_t, leaves_p))


def test_build_engine_rejects_shape_mismatched_orbax_dir(trained, tmp_path):
    """A dir trained with non-preset dims must fail LOUDLY, not serve noise."""
    import argparse

    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine

    _, export, _, _ = trained
    cfg = argparse.Namespace(preset="tiny", seed=0, sep_checkpoint=export,
                             max_batch=2, max_segment_sec=2.0)
    with pytest.raises(ValueError, match="matches none"):
        build_engine(cfg)


@pytest.mark.slow
def test_mossformer_train_export_serve(tmp_path, capsys):
    """--arch mossformer: the second separation backend trains with the same
    PIT loop (GAU gate dims TP-sharded) and its export loads into the
    engine's mossformer stage through the same --sep-checkpoint door."""
    export = str(tmp_path / "mf_export")
    # dims = the tiny preset's mossformer config (engine/runtime.py:71) so
    # the export is servable below
    onnx_path = str(tmp_path / "mf.onnx")
    before, after = _run([
        "--synthetic", "--steps", "4", "--batch", "2", "--seconds", "0.25",
        "--arch", "mossformer", "--enc-dim", "64", "--mf-dim", "48",
        "--mf-qk-dim", "32", "--mf-layers", "2", "--log-every", "2",
        "--data-parallel", "4", "--model-parallel", "2", "--export", export,
        "--export-onnx", onnx_path,
    ])
    assert np.isfinite(before) and np.isfinite(after)

    # the ONNX export of the TP-trained params runs standalone
    from audio_classification_tpu.models.convert.onnx_exec import OnnxModel

    t = int(0.25 * 8000)
    est = np.asarray(OnnxModel(onnx_path)(
        mix=np.zeros((1, t), np.float32))["est"])
    assert est.shape == (1, 2, t)

    import argparse

    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine

    cfg = argparse.Namespace(preset="tiny", seed=0, sep_checkpoint=export,
                             max_batch=2, max_segment_sec=2.0)
    eng = build_engine(cfg)  # lands on the mossformer stage (sep dims differ)
    mix = ts.synthetic_batch(np.random.default_rng(3), 1, 2, 2000, 8000)[0][0]
    est = eng.separate([mix], n_src=2, backend="mossformer")
    assert np.asarray(est[0]).shape == (2, 2000)


def test_dynamic_mixing_on_librimix_tree(tmp_path):
    """--dynamic-mix: sources drawn from different items with random gains;
    train runs end-to-end on a real tree layout and refs always sum to mix."""
    from audio_classification_tpu.audio_io import write_wav

    sr8 = 8000
    base = tmp_path / "Libri2Mix" / "wav8k" / "min" / "train-100"
    for sub in ("mix_clean", "s1", "s2"):
        (base / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        s1 = (0.3 * np.sin(2 * np.pi * (250 + 40 * i)
                           * np.arange(2 * sr8) / sr8)).astype(np.float32)
        s2 = (0.3 * np.sin(2 * np.pi * (700 + 60 * i)
                           * np.arange(2 * sr8) / sr8)).astype(np.float32)
        for sub, sig in (("s1", s1), ("s2", s2), ("mix_clean", s1 + s2)):
            write_wav(base / sub / f"mix_{i}.wav", sig, sr8)

    sampler = ts.LibriMixSampler(str(tmp_path), "train-100", 2, sr8,
                                 crop=4000, rng=rng, dynamic=True)
    mix, refs = sampler.batch(4)
    np.testing.assert_allclose(mix, refs.sum(axis=1), atol=1e-6)
    # dynamic pairings differ from the corpus' fixed ones: with random
    # gains the two sources are (almost surely) not unit-gain stems
    assert np.std(np.max(np.abs(refs), axis=-1)) > 1e-3

    before, after = _run([
        "--librimix-root", str(tmp_path), "--subset", "train-100",
        "--dynamic-mix", "--steps", "2", "--batch", "2", "--seconds", "0.5",
        "--enc-dim", "16", "--bottleneck", "8", "--hidden", "16",
        "--n-blocks", "2", "--n-repeats", "1", "--log-every", "100",
    ])
    assert np.isfinite(before) and np.isfinite(after)
