"""Training subsystem: losses + generic trainer over every model family."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_classification_tpu.models.asr.ctc import ctc_loss
from audio_classification_tpu.models.osd import OSDConfig, OSDNet
from audio_classification_tpu.models.speaker import SpeakerEmbedder, SpeakerEmbedderConfig
from audio_classification_tpu.parallel.mesh import make_mesh
from audio_classification_tpu.train.losses import aam_softmax_loss, frame_bce_loss
from audio_classification_tpu.train.trainer import ModuleTrainer


def test_frame_bce_loss_basics():
    probs = jnp.asarray([[0.9, 0.1, 0.5]])
    labels = jnp.asarray([[1.0, 0.0, 1.0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    full = float(frame_bce_loss(probs, labels, jnp.ones_like(mask)))
    masked = float(frame_bce_loss(probs, labels, mask))
    assert masked < full  # the bad 0.5 prediction is masked out
    near_perfect = float(frame_bce_loss(jnp.asarray([[0.99, 0.01]]),
                                        jnp.asarray([[1.0, 0.0]]),
                                        jnp.ones((1, 2))))
    assert near_perfect < 0.05


def test_aam_softmax_margin_increases_loss():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    # noisy alignment (cos ~0.8) so the margin shift is measurable
    e = w[jnp.asarray([0, 1, 2])] + 0.6 * noise
    labels = jnp.asarray([0, 1, 2])
    l0 = float(aam_softmax_loss(e, labels, w, margin=0.0))
    lm = float(aam_softmax_loss(e, labels, w, margin=0.5))
    assert lm > l0
    assert l0 < 1.0


def test_osd_module_trainer_learns():
    cfg = OSDConfig(dim=32, heads=2, layers=1)
    model = OSDNet(cfg)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((8, 40, 80)).astype(np.float32)
    # synthetic labels: "overlap" iff mean energy of frame group positive
    lab_frames = (feats.mean(-1)[:, ::4] > 0).astype(np.float32)[..., None]
    labels = np.repeat(lab_frames, 2, axis=-1)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats[:1]))

    def loss_fn(apply_fn, p, batch):
        probs = apply_fn(p, batch["feats"])
        return frame_bce_loss(probs, batch["labels"], jnp.ones(probs.shape[:2]))

    trainer = ModuleTrainer(model, params, loss_fn, mesh=make_mesh(8, model_axis=1), lr=3e-3)
    batch = {"feats": jnp.asarray(feats), "labels": jnp.asarray(labels)}
    losses = [trainer.train_step(batch) for _ in range(10)]
    assert losses[-1] < losses[0]


def test_ctc_loss_trainable_direction():
    # logits shaped toward the labels must score better than random logits
    b, t, v = 2, 12, 5
    labels = jnp.asarray([[1, 2, 3, 0], [2, 2, 0, 0]], jnp.int32)
    label_lengths = jnp.asarray([3, 2])
    mask = jnp.ones((b, t))
    rng = np.random.default_rng(0)
    rand = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    l_rand = float(ctc_loss(rand, mask, labels, label_lengths))
    # construct easy logits: spell out the labels with blanks between
    easy = np.full((b, t, v), -5.0, np.float32)
    seqs = [[1, 0, 2, 0, 3, 0], [2, 0, 2, 0, 0, 0]]
    for bi, seq in enumerate(seqs):
        for ti in range(t):
            easy[bi, ti, seq[ti % len(seq)] if ti < len(seq) else 0] = 5.0
    l_easy = float(ctc_loss(jnp.asarray(easy), mask, labels, label_lengths))
    assert l_easy < l_rand


@pytest.mark.slow
def test_speaker_embedder_aam_trains():
    cfg = SpeakerEmbedderConfig(channels=(4, 8), embed_dim=16)
    model = SpeakerEmbedder(cfg)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((8, 40, 80)).astype(np.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=8))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats[:1]))
    w0 = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    # train embedder params against fixed class centers
    def loss_fn(apply_fn, p, batch):
        emb = apply_fn(p, batch["feats"])
        return aam_softmax_loss(emb, batch["labels"], w0, margin=0.1)

    trainer = ModuleTrainer(model, params, loss_fn, mesh=make_mesh(4, model_axis=1), lr=1e-3)
    batch = {"feats": jnp.asarray(feats), "labels": labels}
    losses = [trainer.train_step(batch) for _ in range(6)]
    assert losses[-1] < losses[0]
