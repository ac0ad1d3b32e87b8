"""Training checkpoint/resume with optimizer state (SURVEY §5.4; the
reference resumes Lightning ckpts incl. optimizer state via trainer.fit's
ckpt_path, run.py:50-52,101)."""

import jax
import numpy as np
import pytest

from siu3r_tpu.checkpoint_io import restore_train_state, save_train_state

from test_train import fake_batch, tiny_root_cfg



pytestmark = pytest.mark.slow  # compiles the full model / train step
def test_save_restore_roundtrip(tmp_path):
    from siu3r_tpu.pipeline import Pipeline

    cfg = tiny_root_cfg()
    pipe = Pipeline(cfg, steps_per_epoch=10)
    batch = fake_batch(b=1)
    state = pipe.init_state(jax.random.PRNGKey(0), batch)
    state, _ = pipe.train_step(state, batch, jax.random.PRNGKey(1))

    save_train_state(tmp_path / "ckpt", state, epoch=3, global_step=42)
    template = pipe.init_state(jax.random.PRNGKey(7), batch)
    restored, epoch, gstep = restore_train_state(tmp_path / "ckpt", template)
    assert (epoch, gstep) == (3, 42)

    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments round-trip exactly (flat-leaf storage avoids the
    # NamedTuple->dict field reordering orbax would otherwise introduce)
    sl = jax.tree.leaves(state.opt_state)
    rl = jax.tree.leaves(restored.opt_state)
    assert len(sl) == len(rl)
    for a, b in zip(sl, rl):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)

    # the restored state continues training identically to the original
    s1, l1 = pipe.train_step(state, batch, jax.random.PRNGKey(2))
    s2, l2 = pipe.train_step(restored, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        float(l1["total"]), float(l2["total"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_zero1_save_restore_roundtrip(tmp_path):
    """ZeRO-1 sharded optimizer state survives a checkpoint round trip: the
    fingerprint (built from shard-shaped leaves) matches a fresh zero1
    template, leaves restore exactly, and a replicated-template restore is
    rejected (different structure)."""
    from siu3r_tpu.parallel import create_mesh
    from siu3r_tpu.pipeline import Pipeline, TrainState

    cfg = tiny_root_cfg()
    pipe = Pipeline(cfg, steps_per_epoch=10)
    mesh = create_mesh(8)
    batch = fake_batch(b=1)
    state = pipe.init_state(jax.random.PRNGKey(0), batch, zero1_mesh=mesh)

    save_train_state(tmp_path / "zckpt", state, epoch=1, global_step=7)
    template = pipe.init_state(jax.random.PRNGKey(9), batch, zero1_mesh=mesh)
    restored, epoch, gstep = restore_train_state(tmp_path / "zckpt", template)
    assert (epoch, gstep) == (1, 7)
    for a, b in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restoring into a REPLICATED-optimizer template must error loudly
    plain_template = pipe.init_state(jax.random.PRNGKey(9), batch)
    with pytest.raises(Exception):
        restore_train_state(tmp_path / "zckpt", plain_template)
