"""LoRA: adapter training, PEFT-format checkpointing, and round-trip parity
with the merge-at-load path (reference: train.py:829-841 LoraConfig,
videorefer_trainer.py:386-407 adapter + non_lora_trainables artifacts,
model/__init__.py:82-106 merge-and-unload)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded by -m 'not slow'

from ufvideo_tpu.configs import Qwen2Config, tiny_config
from ufvideo_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from ufvideo_tpu.models.qwen2 import Qwen2LM
from ufvideo_tpu.models.ufvideo import UFVideoModel
from ufvideo_tpu.splicing import plan_splice
from ufvideo_tpu.train.lora import (
    LoRAConfig,
    apply_lora,
    init_lora_params,
    make_lora_train_step,
    merge_for_eval,
    save_lora_checkpoint,
)

TINY_LLM = Qwen2Config(
    vocab_size=503, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128,
    eos_token_id=2, pad_token_id=0,
)


def _random_lora(cfg, lcfg, seed=3):
    lora = init_lora_params(cfg, lcfg, jax.random.PRNGKey(seed))
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 2)
    lora["q"]["b"] = 0.05 * jax.random.normal(ks[0], lora["q"]["b"].shape)
    lora["v"]["b"] = 0.05 * jax.random.normal(ks[1], lora["v"]["b"].shape)
    return lora


def test_apply_lora_matches_merge_at_load(tmp_path):
    """jax apply_lora forward == save PEFT adapter → merge_lora_from_dir on
    the HF state dict → convert → forward."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFCfg, Qwen2ForCausalLM

    from ufvideo_tpu.checkpoints import merge_lora_from_dir
    from ufvideo_tpu.weights import convert_qwen2

    hf_cfg = HFCfg(
        vocab_size=TINY_LLM.vocab_size, hidden_size=TINY_LLM.hidden_size,
        num_hidden_layers=TINY_LLM.num_layers,
        num_attention_heads=TINY_LLM.num_heads,
        num_key_value_heads=TINY_LLM.num_kv_heads,
        head_dim=TINY_LLM.head_dim,
        intermediate_size=TINY_LLM.intermediate_size,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    base_params = convert_qwen2(hf.state_dict(), TINY_LLM)

    lcfg = LoRAConfig(r=4, alpha=16.0)
    lora = _random_lora(TINY_LLM, lcfg)

    # path A: parameter-space apply
    merged_a = apply_lora({"llm": base_params}, lora, TINY_LLM, lcfg)["llm"]

    # path B: PEFT checkpoint → torch-side merge → convert
    save_lora_checkpoint(str(tmp_path), lora, TINY_LLM, lcfg)
    sd = {k: v.clone() for k, v in hf.state_dict().items()}
    merged_sd = merge_lora_from_dir(sd, str(tmp_path))
    merged_b = convert_qwen2(merged_sd, TINY_LLM)

    model = Qwen2LM(TINY_LLM, dtype=jnp.float32, param_dtype=jnp.float32)
    ids = np.random.RandomState(1).randint(0, 503, size=(2, 9)).astype(np.int32)
    la = np.asarray(model.apply({"params": merged_a}, jnp.asarray(ids)))
    lb = np.asarray(model.apply({"params": merged_b}, jnp.asarray(ids)))
    np.testing.assert_allclose(la, lb, atol=1e-4, rtol=1e-4)
    # and the delta is real (adapter actually changes the model)
    l0 = np.asarray(model.apply({"params": base_params}, jnp.asarray(ids)))
    assert np.abs(la - l0).max() > 1e-3


def test_lora_train_two_steps_and_eval(cpu_mesh):
    """2 LoRA steps on synthetic data: base frozen, adapters move, merged
    eval params drive the unmodified model."""
    from ufvideo_tpu.train.train_step import Batch, make_optimizer

    cfg = tiny_config()
    model = UFVideoModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    lcfg = LoRAConfig(r=4, alpha=16.0)

    opt = make_optimizer(lr=1e-2, total_steps=4)
    init, step, shard_state = make_lora_train_step(model, opt, cpu_mesh, lcfg)

    b = 8
    ids = [[5, VIDEO_TOKEN_INDEX, 6, 7, 8]] * b
    labels = [[IGNORE_INDEX] * 3 + [7, 8]] * b
    plan = plan_splice(
        ids, num_video_tokens=cfg.num_video_tokens,
        region_token_counts=[[]] * b, region_token_id=-1,
        max_seq_len=cfg.budget.max_seq_len, labels=labels,
    )
    t = cfg.budget.num_frames
    img = cfg.vision.image_size
    batch = Batch(
        pixels=jnp.zeros((b, t, img, img, 3), jnp.float32),
        text_ids=jnp.asarray(plan.text_ids),
        src_kind=jnp.asarray(plan.src_kind),
        src_idx=jnp.asarray(plan.src_idx),
        seq_lens=jnp.asarray(plan.seq_lens),
        labels=jnp.asarray(plan.labels),
    )

    with cpu_mesh:
        state = shard_state(init(jax.random.PRNGKey(1), params))
        base_kernel0 = np.asarray(
            state["base"]["llm"]["layers"]["self_attn_qkv_proj"]["kernel"]
        )
        losses = []
        for _ in range(2):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)

    # base is untouched; the adapters moved
    base_kernel1 = np.asarray(
        state["base"]["llm"]["layers"]["self_attn_qkv_proj"]["kernel"]
    )
    np.testing.assert_array_equal(base_kernel0, base_kernel1)
    assert float(jnp.abs(state["trainable"]["lora"]["q"]["b"]).max()) > 0
    # non-lora adapters (projector etc.) trained too
    p0 = jax.tree.leaves(params["projector"])[0]
    p1 = jax.tree.leaves(state["trainable"]["non_lora"]["projector"])[0]
    assert np.abs(np.asarray(p0) - np.asarray(p1)).max() > 0

    merged = merge_for_eval(state["base"], state["trainable"], cfg, lcfg)
    feats = model.encode_video(
        merged, jnp.zeros((1, t, img, img, 3), jnp.float32)
    )
    assert np.isfinite(np.asarray(feats, np.float32)).all()


def test_lora_checkpoint_artifacts(tmp_path):
    import json
    import os

    torch = pytest.importorskip("torch")
    lcfg = LoRAConfig()
    lora = _random_lora(TINY_LLM, lcfg)
    save_lora_checkpoint(
        str(tmp_path), lora, TINY_LLM, lcfg,
        non_lora_sd={"base_model.model.model.mm_projector.x": torch.zeros(2)},
    )
    acfg = json.load(open(tmp_path / "adapter_config.json"))
    assert acfg["r"] == 8 and acfg["lora_alpha"] == 16.0
    assert acfg["target_modules"] == ["q_proj", "v_proj"]
    sd = torch.load(tmp_path / "adapter_model.bin", weights_only=True)
    # PEFT key format + torch [out, in] layouts
    k = "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"
    assert k in sd and sd[k].shape == (8, TINY_LLM.hidden_size)
    k = "base_model.model.model.layers.1.self_attn.v_proj.lora_B.weight"
    assert sd[k].shape == (TINY_LLM.num_kv_heads * TINY_LLM.head_dim, 8)
    assert os.path.exists(tmp_path / "non_lora_trainables.bin")


def test_forward_term_matches_param_space_merge():
    """Forward-term LoRA (rate 0) == parameter-space merge numerically: the
    same effective function, so the dropout-capable path changes nothing
    when dropout is off."""
    from ufvideo_tpu.configs import Qwen2Config
    from ufvideo_tpu.models.qwen2 import Qwen2LM
    from ufvideo_tpu.train.lora import apply_lora, init_lora_params

    llm_cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, intermediate_size=64,
        eos_token_id=2, pad_token_id=0,
    )
    lcfg = LoRAConfig(r=4, alpha=16.0, dropout=0.0)
    base = Qwen2LM(llm_cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
        "params"
    ]
    lora = init_lora_params(llm_cfg, lcfg, jax.random.PRNGKey(1))
    # make B nonzero so the adapter actually contributes
    lora = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        lora,
    )

    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 6), 3, 100)
    embeds = base.apply({"params": params}, ids, method=Qwen2LM.embed)
    positions = jnp.broadcast_to(jnp.arange(6, dtype=jnp.int32), (2, 6))

    merged = apply_lora({"llm": params}, lora, llm_cfg, lcfg)["llm"]
    want, _ = base.apply(
        {"params": merged}, embeds, positions, method=Qwen2LM.backbone
    )

    ft = Qwen2LM(
        llm_cfg, dtype=jnp.float32, param_dtype=jnp.float32,
        lora_term=(lcfg.scale, 0.0),
    )
    got, _ = ft.apply(
        {"params": params}, embeds, positions, None, None, None, "train",
        lora, method=Qwen2LM.backbone,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_lora_dropout_trains(cpu_mesh):
    """dropout > 0 takes the forward-term path: steps are finite, adapters
    move, and the dropout mask actually varies across steps."""
    from ufvideo_tpu.train.train_step import Batch, make_optimizer

    cfg = tiny_config()
    model = UFVideoModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    lcfg = LoRAConfig(r=4, alpha=16.0, dropout=0.5)

    opt = make_optimizer(lr=1e-2, total_steps=4)
    init, step, shard_state = make_lora_train_step(model, opt, cpu_mesh, lcfg)

    b = 8
    ids = [[5, VIDEO_TOKEN_INDEX, 6, 7, 8]] * b
    labels = [[IGNORE_INDEX] * 3 + [7, 8]] * b
    plan = plan_splice(
        ids, num_video_tokens=cfg.num_video_tokens,
        region_token_counts=[[]] * b, region_token_id=-1,
        max_seq_len=cfg.budget.max_seq_len, labels=labels,
    )
    t = cfg.budget.num_frames
    img = cfg.vision.image_size
    batch = Batch(
        pixels=jnp.zeros((b, t, img, img, 3), jnp.float32),
        text_ids=jnp.asarray(plan.text_ids),
        src_kind=jnp.asarray(plan.src_kind),
        src_idx=jnp.asarray(plan.src_idx),
        seq_lens=jnp.asarray(plan.seq_lens),
        labels=jnp.asarray(plan.labels),
    )
    with cpu_mesh:
        state = shard_state(init(jax.random.PRNGKey(1), params))
        state, m1 = step(state, batch)
        state, m2 = step(state, batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # PEFT init: B zeros → step-1 gradient flows to B (not A)
    assert float(jnp.abs(state["trainable"]["lora"]["q"]["b"]).max()) > 0
