"""Training pipeline: label masking, collation, seg loss step, trainer IO."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded by -m 'not slow'

from ufvideo_tpu.configs import tiny_config
from ufvideo_tpu.constants import IGNORE_INDEX
from ufvideo_tpu.models.sam2 import SAM2
from ufvideo_tpu.models.ufvideo import UFVideoModel
from ufvideo_tpu.tokenization import byte_tokenizer_with_ids
from ufvideo_tpu.train.data import Collator, TrainSample, preprocess_conversation
from ufvideo_tpu.train.seg_step import SegBatch, select_seg_hidden, segmentation_loss_fn


@pytest.fixture(scope="module")
def tok_ids():
    return byte_tokenizer_with_ids()


def test_preprocess_conversation_masks_instructions(tok_ids):
    tok, ids = tok_ids
    conv = [
        {"from": "human", "value": "<video>\nWhat is it?"},
        {"from": "gpt", "value": "A cat."},
        {"from": "human", "value": "Color?"},
        {"from": "gpt", "value": "Black."},
    ]
    input_ids, labels = preprocess_conversation(conv, tok, "<video>")
    assert len(input_ids) == len(labels)
    assert -201 in input_ids  # video sentinel survived
    # every prompt/system token is masked; answer tokens are not
    answer_bytes = "A cat.".encode()
    kept = [t for t, l in zip(input_ids, labels) if l != IGNORE_INDEX]
    assert len(kept) > 0
    # first answer's bytes appear among unmasked labels
    assert answer_bytes[0] in kept
    # the video sentinel itself must be masked
    for t, l in zip(input_ids, labels):
        if t == -201:
            assert l == IGNORE_INDEX
    # instruction prefix fully masked
    first_unmasked = next(
        i for i, l in enumerate(labels) if l != IGNORE_INDEX
    )
    assert first_unmasked > input_ids.index(-201)


def test_select_seg_hidden():
    hidden = jnp.arange(2 * 6 * 3, dtype=jnp.float32).reshape(2, 6, 3)
    labels = jnp.array(
        [[-100, -100, 9, -100, 9, -100], [-100, -100, -100, -100, -100, -100]]
    )
    picked, valid = select_seg_hidden(hidden, labels, seg_token_id=9, max_objects=2)
    # next-label positions: sample 0 → t=1 and t=3
    np.testing.assert_allclose(picked[0, 0], hidden[0, 1])
    np.testing.assert_allclose(picked[0, 1], hidden[0, 3])
    assert valid[0].tolist() == [True, True]
    assert valid[1].tolist() == [False, False]


def test_collate_and_seg_loss_step(tok_ids):
    tok, ids = tok_ids
    cfg = tiny_config()
    model = UFVideoModel(cfg)
    sam = SAM2(cfg.sam, dtype=cfg.compute_dtype, param_dtype=cfg.param_dtype)
    cfg = cfg.replace(seg_token_id=ids.seg, region_token_id=ids.region)
    model.cfg = cfg

    params = model.init_params(jax.random.PRNGKey(0))
    params["sam"] = sam.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, cfg.sam.hiera.image_size, cfg.sam.hiera.image_size, 3)),
    )["params"]

    conv = [
        {"from": "human", "value": "<video>\nSegment the cat."},
        {"from": "gpt", "value": "It is [SEG]."},
    ]
    input_ids, labels = preprocess_conversation(conv, tok, "<video>")
    v = cfg.vision.image_size
    ss = cfg.sam.hiera.image_size
    rng = np.random.RandomState(0)
    sample = TrainSample(
        input_ids=input_ids,
        labels=labels,
        video=rng.randn(cfg.budget.num_frames, v, v, 3).astype(np.float32),
        images_sam=rng.randn(
            cfg.budget.num_frames_sam, ss, ss, 3
        ).astype(np.float32),
        gt_masks=(rng.rand(1, cfg.budget.num_frames_sam, 40, 60) > 0.5).astype(
            np.float32
        ),
    )
    collator = Collator(cfg, ids.region, ids.seg, loss_mask_size=32)
    batch_np = collator([sample, sample])
    batch = SegBatch(
        **{k: jnp.asarray(val) for k, val in batch_np.items()}
    )
    loss, metrics = segmentation_loss_fn(model, sam, params, batch)
    assert np.isfinite(float(loss))
    assert float(metrics["mask_loss"]) > 0  # [SEG] present → mask loss active
    assert float(metrics["ce_loss"]) > 0


def test_trainer_checkpoint_rotation(tmp_path):
    from ufvideo_tpu.train.trainer import TrainConfig, Trainer
    from ufvideo_tpu.train.train_step import TrainState

    cfg = tiny_config()
    model = UFVideoModel(cfg)
    tc = TrainConfig(
        output_dir=str(tmp_path), save_total_limit=2, total_steps=10
    )
    trainer = Trainer(model, cfg, tc)
    params = {"w": jnp.zeros((4,))}
    state = TrainState(jnp.asarray(5), params, trainer.optimizer.init(params))
    trainer.save(state)
    state = TrainState(jnp.asarray(6), params, state.opt_state)
    trainer.save(state)
    state = TrainState(jnp.asarray(7), params, state.opt_state)
    trainer.save(state)
    import os

    ckpts = sorted(d for d in os.listdir(tmp_path) if d.startswith("checkpoint-"))
    assert ckpts == ["checkpoint-6", "checkpoint-7"]

    restored = trainer.maybe_resume(state)
    assert int(restored.step) == 7


def test_trainer_adapter_save_writes_reference_bins(tmp_path):
    """tune_adapters_only checkpoints carry the reference's
    mm_projector.bin/region_encoder.bin next to the orbax artifact
    (videorefer_trainer.py:343-385 format)."""
    import os

    from ufvideo_tpu.train.trainer import TrainConfig, Trainer
    from ufvideo_tpu.train.train_step import TrainState

    cfg = tiny_config()
    model = UFVideoModel(cfg)
    tc = TrainConfig(
        output_dir=str(tmp_path), total_steps=10, tune_adapters_only=True
    )
    trainer = Trainer(model, cfg, tc)
    params = model.init_params(jax.random.PRNGKey(0))
    state = TrainState(
        jnp.asarray(3), params, None  # opt state unused by save()
    )
    trainer.save(state)
    ckpt = os.path.join(tmp_path, "checkpoint-3")
    assert os.path.exists(os.path.join(ckpt, "mm_projector.bin"))
    assert os.path.exists(os.path.join(ckpt, "region_encoder.bin"))

    from ufvideo_tpu.checkpoints import load_adapter_weights
    from ufvideo_tpu.weights import convert_stc_projector

    proj = convert_stc_projector(
        load_adapter_weights(os.path.join(ckpt, "mm_projector.bin")),
        depth=cfg.projector.depth, mlp_depth=cfg.projector.mlp_depth,
    )
    ref = jax.tree.map(np.asarray, params["projector"])
    got_leaves = jax.tree.leaves(proj)
    ref_leaves = jax.tree.leaves(ref)
    assert len(got_leaves) == len(ref_leaves)
    for g, r in zip(got_leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(g), r, atol=1e-6)


def test_trainer_adapter_resume_merges_weights(tmp_path):
    """maybe_resume on a tune_adapters_only run restores the adapter
    subtrees from the adapter-only artifact (full-state template against a
    two-subtree checkpoint used to crash orbax)."""
    import os

    from ufvideo_tpu.train.trainer import TrainConfig, Trainer
    from ufvideo_tpu.train.train_step import TrainState

    cfg = tiny_config()
    model = UFVideoModel(cfg)
    tc = TrainConfig(
        output_dir=str(tmp_path), total_steps=10, tune_adapters_only=True
    )
    trainer = Trainer(model, cfg, tc)
    params = model.init_params(jax.random.PRNGKey(0))
    state = TrainState(jnp.asarray(3), params, None)
    trainer.save(state)

    fresh = model.init_params(jax.random.PRNGKey(1))
    fresh_state = TrainState(jnp.asarray(0), fresh, None)
    resumed = trainer.maybe_resume(fresh_state)
    # adapters come from the checkpoint, the rest stays fresh
    for g, r in zip(
        jax.tree.leaves(resumed.params["projector"]),
        jax.tree.leaves(params["projector"]),
    ):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-6)
    for g, r in zip(
        jax.tree.leaves(resumed.params["llm"]),
        jax.tree.leaves(fresh["llm"]),
    ):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r))
