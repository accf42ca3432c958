"""Splice planning + composite model end-to-end on the tiny config."""

import jax
import jax.numpy as jnp
import numpy as np

from ufvideo_tpu.configs import tiny_config
from ufvideo_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from ufvideo_tpu.models.generate import greedy_generate
from ufvideo_tpu.models.ufvideo import UFVideoModel
from ufvideo_tpu.splicing import (
    KIND_PAD,
    KIND_REGION,
    KIND_TEXT,
    KIND_VIDEO,
    apply_splice,
    plan_splice,
)


def test_plan_splice_layout():
    ids = [[7, VIDEO_TOKEN_INDEX, 8, 9, 100, 10]]  # 100 = <region>
    labels = [[-100, -100, -100, 9, -100, 10]]
    plan = plan_splice(
        ids,
        num_video_tokens=3,
        region_token_counts=[[2]],
        region_token_id=100,
        max_seq_len=16,
        labels=labels,
        region_stride=4,
    )
    k = plan.src_kind[0]
    assert list(k[:9]) == [
        KIND_TEXT, KIND_VIDEO, KIND_VIDEO, KIND_VIDEO, KIND_TEXT, KIND_TEXT,
        KIND_REGION, KIND_REGION, KIND_TEXT,
    ]
    assert all(kk == KIND_PAD for kk in k[9:])
    assert plan.seq_lens[0] == 9
    # region indices stride into the flattened [R, rt] stream
    assert list(plan.src_idx[0][6:8]) == [0, 1]
    # labels: inserted positions IGNORE, text labels carried
    lab = plan.labels[0]
    assert lab[0] == -100 and lab[4] == -100 and lab[5] == 9 and lab[8] == 10
    assert lab[1] == IGNORE_INDEX and lab[6] == IGNORE_INDEX
    # sentinel positions map to -1; text positions map to spliced slots
    assert plan.text_pos_map[0][0] == 0
    assert plan.text_pos_map[0][1] == -1
    assert plan.text_pos_map[0][5] == 8


def test_apply_splice_selects_sources():
    b, t, v, r, d, s = 1, 4, 2, 3, 5, 8
    text = jnp.arange(b * t * d, dtype=jnp.float32).reshape(b, t, d)
    video = 100 + jnp.arange(b * v * d, dtype=jnp.float32).reshape(b, v, d)
    region = 500 + jnp.arange(b * r * d, dtype=jnp.float32).reshape(b, r, d)
    kind = jnp.array([[0, 1, 1, 2, 0, 3, 3, 3]])
    idx = jnp.array([[2, 0, 1, 1, 3, 0, 0, 0]])
    out = apply_splice(text, video, region, kind, idx)
    np.testing.assert_allclose(out[0, 0], text[0, 2])
    np.testing.assert_allclose(out[0, 1], video[0, 0])
    np.testing.assert_allclose(out[0, 2], video[0, 1])
    np.testing.assert_allclose(out[0, 3], region[0, 1])
    np.testing.assert_allclose(out[0, 4], text[0, 3])
    np.testing.assert_allclose(out[0, 5], jnp.zeros(d))


def test_composite_end_to_end_tiny():
    cfg = tiny_config()
    model = UFVideoModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    b = 1
    t = cfg.budget.num_frames
    pix = jax.random.normal(
        jax.random.PRNGKey(1),
        (b, t, cfg.vision.image_size, cfg.vision.image_size, 3),
    )
    video_feats = model.encode_video(params, pix)
    v = cfg.num_video_tokens
    assert video_feats.shape == (b, v, cfg.llm.hidden_size)

    ids = [[5, VIDEO_TOKEN_INDEX, 6, 7, 8]]
    plan = plan_splice(
        ids,
        num_video_tokens=v,
        region_token_counts=[[]],
        region_token_id=-999,
        max_seq_len=cfg.budget.max_seq_len,
    )
    embeds = model.splice_embeds(
        params,
        jnp.asarray(plan.text_ids),
        jnp.asarray(plan.src_kind),
        jnp.asarray(plan.src_idx),
        video_feats,
        None,
    )
    assert embeds.shape == (b, cfg.budget.max_seq_len, cfg.llm.hidden_size)

    res = greedy_generate(
        model.llm,
        params["llm"],
        embeds,
        jnp.asarray(plan.seq_lens),
        max_new_tokens=4,
        stop_ids=(cfg.llm.eos_token_id,),
        cache_max_len=cfg.budget.max_seq_len + 8,
    )
    assert res.tokens.shape == (b, 4)
    assert res.hidden.shape == (b, 4, cfg.llm.hidden_size)
    assert int(res.gen_lens[0]) >= 1
