"""Pipeline-parallel training end-to-end through the Trainer: 2 optimizer
steps on a (data=2, pipe=2) mesh with the stacked LLM layer params
sharded over the pipe axis, checkpoint save, resume — and loss parity with
the dense (non-pipelined) trainer on the same batches.

This is the launcher-level counterpart of tests/test_pipeline.py's
numerics: --pp is a scripts/train.py flag, so the whole Trainer chain
(pipeline_rules shardings → make_train_step → orbax save/restore of
stage-sharded arrays) must work, not just pipeline_backbone."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ufvideo_tpu.configs import tiny_config
from ufvideo_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from ufvideo_tpu.models.ufvideo import UFVideoModel
from ufvideo_tpu.parallel.mesh import create_mesh
from ufvideo_tpu.parallel.partition import partition_specs, pipeline_rules
from ufvideo_tpu.splicing import plan_splice
from ufvideo_tpu.train.train_step import Batch
from ufvideo_tpu.train.trainer import TrainConfig, Trainer

pytestmark = pytest.mark.slow  # two full train-step compiles


def _batches(cfg, b, n):
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
    rng = np.random.RandomState(7)
    t, img = cfg.budget.num_frames, cfg.vision.image_size
    out = []
    for _ in range(n):
        out.append(Batch(
            pixels=jnp.asarray(
                rng.randn(b, t, img, img, 3).astype(np.float32) * 0.1
            ),
            text_ids=jnp.asarray(plan.text_ids),
            src_kind=jnp.asarray(plan.src_kind),
            src_idx=jnp.asarray(plan.src_idx),
            seq_lens=jnp.asarray(plan.seq_lens),
            labels=jnp.asarray(plan.labels),
        ))
    return out


def _losses_from_log(path):
    import json

    with open(path) as f:
        return [json.loads(l)["loss"] for l in f]


def test_pp_trainer_two_steps_resume_and_dense_parity(tmp_path):
    cfg = tiny_config()
    b = 4
    batches = _batches(cfg, b, 2)
    tc = dict(total_steps=2, global_batch_size=b, save_steps=2,
              learning_rate=1e-3, group_by_modality_length=False)

    # dense reference on the plain (data, fsdp, tensor) mesh
    dense_mesh = create_mesh(dp=2, fsdp=2, tp=2)
    dense_model = UFVideoModel(cfg)
    dense_tr = Trainer(
        dense_model, cfg, TrainConfig(output_dir=str(tmp_path / "dense"), **tc),
        mesh=dense_mesh,
    )
    dstate = dense_tr.init_state(dense_model.init_params(jax.random.PRNGKey(0)))
    dstate = dense_tr.train(dstate, iter(batches))
    dense_losses = _losses_from_log(tmp_path / "dense" / "train_log.jsonl")

    # pipelined run: same math on a (data=2, pipe=2) mesh — the exact
    # object scripts/train.py --pp 2 builds (per-microbatch rows must
    # divide the data axes: 4 samples / 2 microbatches over data*fsdp=2)
    mesh = create_mesh(dp=2, fsdp=1, tp=1, pp=2, devices=jax.devices()[:4])
    assert dict(mesh.shape) == {"data": 2, "pipe": 2, "fsdp": 1, "tensor": 1}
    model = UFVideoModel(cfg, pp=(mesh, "pipe", 2, ("data", "fsdp")))
    trainer = Trainer(
        model, cfg, TrainConfig(output_dir=str(tmp_path / "pp"), **tc),
        mesh=mesh, rules=pipeline_rules(),
    )
    state = trainer.init_state(model.init_params(jax.random.PRNGKey(0)))

    # the stacked layer params really are stage-sharded over pipe
    spec = partition_specs(state.params, pipeline_rules())
    qkv_spec = spec["llm"]["layers"]["self_attn_qkv_proj"]["kernel"]
    assert tuple(qkv_spec) == ("pipe", None, None)
    arr = state.params["llm"]["layers"]["self_attn_qkv_proj"]["kernel"]
    assert arr.sharding.spec[0] == "pipe"

    state = trainer.train(state, iter(batches))
    assert int(state.step) == 2
    pp_losses = _losses_from_log(tmp_path / "pp" / "train_log.jsonl")

    # pure re-schedule: same losses as the dense trainer (fp32 CPU)
    np.testing.assert_allclose(pp_losses, dense_losses, rtol=2e-5)

    # checkpoint of stage-sharded params restores and resumes
    assert os.path.isdir(tmp_path / "pp" / "checkpoint-2")
    resumed = trainer.maybe_resume(
        trainer.init_state(model.init_params(jax.random.PRNGKey(0)))
    )
    assert int(resumed.step) == 2
    np.testing.assert_allclose(
        np.asarray(resumed.params["llm"]["norm"]["scale"]),
        np.asarray(state.params["llm"]["norm"]["scale"]),
    )
    # ...and can take a further pipelined step
    resumed, metrics = trainer.step_fn(resumed, batches[0])
    assert np.isfinite(float(metrics["loss"]))
    assert int(resumed.step) == 3
