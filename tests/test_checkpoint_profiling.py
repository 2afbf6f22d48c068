"""Checkpoint save/load roundtrip + profiling utilities."""
import numpy as np
import jax
import pytest

from audio_classification_tpu.engine import ModelPack, StageEngine, BucketSpec, tiny_preset
from audio_classification_tpu.train.checkpoint import load_model_pack, save_model_pack
from audio_classification_tpu.utils.profiling import StageTimer, trace


def test_model_pack_checkpoint_roundtrip(tmp_path):
    pack = ModelPack(tiny_preset(), seed=0)
    save_model_pack(pack, str(tmp_path / "ckpt"))

    pack2 = ModelPack(tiny_preset(), seed=123)  # different init
    before = np.asarray(jax.tree_util.tree_leaves(pack2.params["sep3"])[0])
    load_model_pack(pack2, str(tmp_path / "ckpt"))
    after_leaves = jax.tree_util.tree_leaves(pack2.params["sep3"])
    ref_leaves = jax.tree_util.tree_leaves(pack.params["sep3"])
    for a, b in zip(after_leaves, ref_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # engine built from restored params must produce identical output
    spec = BucketSpec(lengths=(4000, 8000), max_batch=2)
    e1 = StageEngine(pack, spec)
    e2 = StageEngine(pack2, spec)
    x = np.random.default_rng(0).standard_normal(4000).astype(np.float32) * 0.1
    np.testing.assert_allclose(e1.separate([x])[0], e2.separate([x])[0], atol=1e-6)


def test_stage_timer_compile_execute_split():
    t = StageTimer()
    import time as _t

    with t.time("sep", tag=(8, 4000)):
        _t.sleep(0.01)
    with t.time("sep", tag=(8, 4000)):
        _t.sleep(0.01)
    with t.time("sep", tag=(8, 8000)):  # new shape -> compile again
        _t.sleep(0.01)
    s = t.summary()["sep"]
    assert s["calls"] == 3
    assert s["compile_sec"] > 0 and s["execute_sec"] > 0
    assert s["compile_sec"] > s["execute_sec"]  # 2 first-calls vs 1 warm


def test_trace_noop_and_real(tmp_path):
    with trace(""):
        pass
    with trace(str(tmp_path / "prof")):
        import jax.numpy as jnp

        jax.block_until_ready(jnp.ones(8) * 2)
    assert any((tmp_path / "prof").rglob("*")), "profiler wrote no files"


def test_stabilize_pallas_cache_keys_idempotent():
    """The Mosaic location-strip patch installs once and stays installed.

    (The actual payload stability is TPU-lowering-only; verified on
    hardware — see runtime/device.stabilize_pallas_cache_keys docstring.)
    """
    from jax._src import tpu_custom_call as tcc

    from audio_classification_tpu.runtime.device import (
        stabilize_pallas_cache_keys,
    )

    assert stabilize_pallas_cache_keys() is True
    wrapped = tcc._lower_mosaic_module_to_asm
    assert stabilize_pallas_cache_keys() is True  # no double-wrap
    assert tcc._lower_mosaic_module_to_asm is wrapped
    assert getattr(tcc, "_act_strip_debuginfo", False)
