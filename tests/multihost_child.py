"""Child process for tests/test_multihost.py — NOT a test module.

Runs ONE FSDP train step of the tiny composite model over an 8-device
(data=2, fsdp=2, tensor=2) mesh and prints the loss/grad-norm. In
distributed mode (UFVIDEO_NUM_PROCESSES=2 in the env) the 8 devices are
globally assembled from 2 processes × 4 virtual CPU devices and this
process feeds only its process-local half of the global batch — the real
multi-host code path (maybe_initialize_distributed → create_mesh →
shard_order_for_process-style slicing → make_train_step's
make_array_from_process_local_data). In single mode it runs the identical
step in one process, producing the reference loss.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    import numpy as np
    import jax.numpy as jnp

    from ufvideo_tpu.configs import tiny_config
    from ufvideo_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
    from ufvideo_tpu.models.ufvideo import UFVideoModel
    from ufvideo_tpu.parallel.mesh import (
        create_mesh,
        maybe_initialize_distributed,
    )
    from ufvideo_tpu.splicing import plan_splice
    from ufvideo_tpu.train.train_step import (
        Batch,
        make_optimizer,
        make_train_step,
    )

    distributed = maybe_initialize_distributed()
    pid = jax.process_index()
    pcount = jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    cfg = tiny_config()
    model = UFVideoModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = create_mesh(dp=2, fsdp=2, tp=2)

    # deterministic global batch of 4 samples
    b = 4
    t = cfg.budget.num_frames
    img = cfg.vision.image_size
    ids = [[5, VIDEO_TOKEN_INDEX, 6, 7, 8]] * b
    labels = [[IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 7, 8]] * b
    plan = plan_splice(
        ids,
        num_video_tokens=cfg.num_video_tokens,
        region_token_counts=[[]] * b,
        region_token_id=-1,
        max_seq_len=cfg.budget.max_seq_len,
        labels=labels,
    )
    rng = np.random.RandomState(0)
    pixels = rng.randn(b, t, img, img, 3).astype(np.float32) * 0.1
    batch_global = Batch(
        pixels=pixels,
        text_ids=np.asarray(plan.text_ids),
        src_kind=np.asarray(plan.src_kind),
        src_idx=np.asarray(plan.src_idx),
        seq_lens=np.asarray(plan.seq_lens),
        labels=np.asarray(plan.labels),
    )
    # process-contiguous local rows, matching shard_order_for_process
    local = b // pcount
    batch = jax.tree.map(
        lambda a: a[pid * local : (pid + 1) * local], batch_global
    )

    optimizer = make_optimizer(total_steps=10)
    init, step, shard_state = make_train_step(model, optimizer, mesh)
    with mesh:
        state = shard_state(init(jax.random.PRNGKey(1), params))
        state, metrics = step(state, batch)
        state, metrics2 = step(state, batch)
    print(
        f"RESULT pid={pid} distributed={distributed} "
        f"loss={float(metrics['loss']):.8f} "
        f"loss2={float(metrics2['loss']):.8f} "
        f"gnorm={float(metrics['grad_norm']):.8f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
