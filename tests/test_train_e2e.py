"""End-to-end training: synthetic dataset on disk → dataset/collator →
prefetch loader → pjit seg train step → checkpoint. Tiny config, CPU."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded by -m 'not slow'
from PIL import Image

from ufvideo_tpu import rle
from ufvideo_tpu.configs import tiny_config
from ufvideo_tpu.models.sam2 import SAM2
from ufvideo_tpu.api import model_init
from ufvideo_tpu.train.data import Collator, SupervisedVideoDataset
from ufvideo_tpu.train.prefetch import PrefetchLoader, device_prefetch
from ufvideo_tpu.train.seg_step import SegBatch, make_seg_loss_fn
from ufvideo_tpu.train.trainer import TrainConfig, Trainer, build_sample_order


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    records = []
    for vi in range(4):
        vdir = root / f"vid{vi}"
        vdir.mkdir()
        for fi in range(6):
            Image.fromarray(
                rng.randint(0, 255, (40, 56, 3), np.uint8)
            ).save(vdir / f"{fi:03d}.jpg")
        mask = np.zeros((40, 56), np.uint8)
        mask[8:24, 10:30] = 1
        ann = {"0": {"segmentation": rle.encode(mask)}}
        records.append(
            {
                "id": vi,
                "video": f"vid{vi}",
                "annotation": [ann],
                "conversations": [
                    {"from": "human", "value": "<video>\nSegment the box."},
                    {"from": "gpt", "value": "Sure, it is [SEG]."},
                ],
            }
        )
    with open(root / "data.json", "w") as f:
        json.dump(records, f)
    return root


def _micro_config():
    """Even smaller than tiny: the grad-of-everything train step is the
    single biggest compile in the suite, and this host has one CPU core."""
    import dataclasses

    cfg = tiny_config()
    return cfg.replace(
        vision=dataclasses.replace(cfg.vision, num_layers=2),
        llm=dataclasses.replace(cfg.llm, num_layers=1),
        budget=dataclasses.replace(
            cfg.budget, num_frames=2, num_frames_sam=1, max_seq_len=96
        ),
        sam=dataclasses.replace(
            cfg.sam,
            hiera=dataclasses.replace(cfg.sam.hiera, image_size=64),
            sam_image_embedding_size=4,
            mem_attn_rope_feat_sizes=(4, 4),
        ),
    )


def test_training_two_steps(synthetic_root, tmp_path):
    runtime, _, tokenizer = model_init(None, cfg=_micro_config())
    cfg = runtime.cfg

    dataset = SupervisedVideoDataset(
        [str(synthetic_root / "data.json")], tokenizer, cfg,
        video_root=str(synthetic_root),
    )
    assert len(dataset) == 4
    sample = dataset[0]
    assert sample.video.shape[0] == cfg.budget.num_frames
    assert sample.images_sam is not None and sample.gt_masks is not None

    collator = Collator(cfg, runtime.ids.region, runtime.ids.seg, loss_mask_size=32)
    tc = TrainConfig(
        output_dir=str(tmp_path / "ckpt"),
        global_batch_size=2,
        total_steps=2,
        save_steps=2,
        learning_rate=1e-4,
    )
    sam = SAM2(cfg.sam, dtype=cfg.compute_dtype, param_dtype=cfg.param_dtype)
    trainer = Trainer(
        runtime.model, cfg, tc, loss_fn=make_seg_loss_fn(sam)
    )

    order = build_sample_order(dataset, tc)
    loader = PrefetchLoader(
        order,
        dataset.__getitem__,
        lambda s: SegBatch(**{k: jnp.asarray(v) for k, v in collator(s).items()}),
        batch_size=2,
    )
    vis_before = np.asarray(
        runtime.params["vision"]["position_embedding"]
    ).copy()
    llm_before = np.asarray(
        runtime.params["llm"]["norm"]["scale"]
    ).copy()
    state = trainer.init_state(runtime.params)
    state = trainer.train(state, device_prefetch(loader, lambda b: b), max_steps=2)
    assert int(state.step) == 2

    # freezing policy: vision stays put, llm moves (train.py:861-916)
    np.testing.assert_array_equal(
        np.asarray(state.params["vision"]["position_embedding"]), vis_before
    )
    assert not np.allclose(
        np.asarray(state.params["llm"]["norm"]["scale"]), llm_before
    )
    assert os.path.isdir(tmp_path / "ckpt" / "checkpoint-2")

    # metrics logged with finite losses
    log = [
        json.loads(l)
        for l in open(tmp_path / "ckpt" / "train_log.jsonl")
    ]
    assert len(log) == 2
    assert np.isfinite(log[-1]["loss"]) and log[-1]["mask_loss"] > 0

    # resume picks up the saved step
    resumed = trainer.maybe_resume(state)
    assert int(resumed.step) == 2
