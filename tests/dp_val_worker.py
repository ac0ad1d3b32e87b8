"""Worker for the 2-process distributed-validation test (run by
tests/test_distributed_val.py, one subprocess per rank).

Drives the REAL multi-process deployment path the reference uses for
validation (reference src/run.py:84-97 process-group bootstrap; rank-0
evaluation behind barriers, src/pipeline.py:315-326):

  initialize_distributed -> global 8-device mesh (4 CPU devices/process) ->
  replicated params + data-sharded batch -> make_dp_eval_step ->
  all-gather of the sharded outputs -> ONLY process 0 computes metrics ->
  global barrier.

Usage: python dp_val_worker.py <coordinator> <num_procs> <pid> <out_dir>
"""

import os
import sys

# `python tests/dp_val_worker.py` puts tests/ on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator, num_procs, pid, out_dir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from siu3r_tpu.parallel import (  # noqa: E402
    create_mesh,
    initialize_distributed,
    replicate,
    shard_batch,
)

initialize_distributed(
    coordinator_address=coordinator, num_processes=num_procs, process_id=pid
)
assert jax.process_index() == pid
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 4 * num_procs, jax.device_count()

from siu3r_tpu.config import bind_scannet_classes, load_config  # noqa: E402
from siu3r_tpu.pipeline import Pipeline, TrainState  # noqa: E402

TINY = [
    "pipeline.model.image_size=[32,32]",
    "pipeline.model.croco.enc_depth=2",
    "pipeline.model.croco.dec_depth=2",
    "pipeline.model.croco.enc_embed_dim=64",
    "pipeline.model.croco.dec_embed_dim=48",
    "pipeline.model.croco.enc_num_heads=4",
    "pipeline.model.croco.dec_num_heads=4",
    "pipeline.model.mask2former.num_queries=8",
    "pipeline.model.mask2former.hidden_dim=32",
    "pipeline.model.mask2former.num_attention_heads=4",
    "pipeline.model.mask2former.dim_feedforward=64",
    "pipeline.model.mask2former.decoder_layers=2",
    "pipeline.model.mask2former.encoder_layers=1",
    "pipeline.model.mask2former.encoder_feedforward_dim=64",
    "pipeline.model.mask2former.feature_size=32",
]
cfg = bind_scannet_classes(load_config(os.devnull, TINY))
pipe = Pipeline(cfg, lpips_enabled=False)

# deterministic global batch: every process builds the SAME value; device_put
# with the global sharding keeps only this process's addressable shards
B, V, H, W = 8, 2, 32, 32
n_tgt = V + 1
rng = np.random.RandomState(0)
intr = np.array([[40 / 32, 0, 0.5], [0, 40 / 32, 0.5], [0, 0, 1]], np.float32)
exts = np.stack([np.eye(4, dtype=np.float32)] * n_tgt)
for i in range(n_tgt):
    exts[i, 0, 3] = 0.05 * i
batch = {
    "context_views_images": jnp.asarray(rng.rand(B, V, H, W, 3), jnp.float32),
    "context_views_intrinsics": jnp.asarray(
        np.broadcast_to(intr, (B, V, 3, 3)).copy()
    ),
    "target_views_images": jnp.asarray(rng.rand(B, n_tgt, H, W, 3), jnp.float32),
    "target_views_intrinsics": jnp.asarray(
        np.broadcast_to(intr, (B, n_tgt, 3, 3)).copy()
    ),
    "target_views_extrinsics": jnp.asarray(
        np.broadcast_to(exts, (B, n_tgt, 4, 4)).copy()
    ),
}

mesh = create_mesh()  # all 8 GLOBAL devices on the data axis
init_batch = jax.tree.map(lambda x: x[:1], batch)
state = pipe.init_state(jax.random.PRNGKey(0), init_batch)
state = TrainState(
    params=replicate(state.params, mesh),
    batch_stats=replicate(state.batch_stats, mesh),
    opt_state=None,
    step=0,
)
sharded = shard_batch(batch, mesh)

eval_step = pipe.make_dp_eval_step(mesh)
out, render, qc = eval_step(state, sharded)

# host-side gather of the data-sharded outputs (the reference's shared-
# filesystem round trip, src/pipeline.py:315-326) ...
from jax.experimental import multihost_utils  # noqa: E402

color = multihost_utils.process_allgather(render.color, tiled=True)
seg = multihost_utils.process_allgather(out.post["segmentation"], tiled=True)

# ... then ONLY process 0 evaluates (rank-0 protocol)
if jax.process_index() == 0:
    from siu3r_tpu.eval.metrics import psnr

    assert color.shape == (B, n_tgt, H, W, 3), color.shape
    assert seg.shape[0] == B, seg.shape
    assert np.isfinite(np.asarray(color)).all()
    val = float(np.mean([
        psnr(color[i], np.asarray(batch["target_views_images"][i]))
        for i in range(B)
    ]))
    with open(os.path.join(out_dir, "metrics.txt"), "w") as f:
        f.write(f"psnr={val}\n")

# all ranks meet the barrier before exit (reference trainer.strategy.barrier)
multihost_utils.sync_global_devices("validation_done")
print(f"WORKER_OK pid={pid}")
