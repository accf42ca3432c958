"""SAM2 components: numerical parity against the reference torch
implementation (used strictly as a test oracle, tiny random-init configs)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/ufvideo/model/sam2.py"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference oracle not mounted"
)

from ufvideo_tpu.configs import SAM2Config, SAM2HieraConfig
from ufvideo_tpu.models.sam2 import convert as C

TINY = SAM2Config(
    hiera=SAM2HieraConfig(
        embed_dim=16, num_heads=1, stages=(1, 2, 1, 1),
        global_att_blocks=(2,), window_spec=(4, 2, 4, 2),
        image_size=128,
    ),
    fpn_dim=32,
    fpn_backbone_channels=(128, 64, 32, 16),
    mem_attn_layers=1,
    mem_attn_dim=32,
    mem_attn_dff=64,
    mem_dim=16,
    sam_embed_dim=32,
    sam_image_embedding_size=8,
    iou_head_hidden_dim=32,
)


@pytest.fixture(scope="module")
def ref():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_sam2", REF)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    import torch

    torch.manual_seed(0)
    return m


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x, np.float32))


def test_hiera_trunk_parity(ref):
    import torch

    trunk = ref.Hiera(
        embed_dim=16, num_heads=1, stages=(1, 2, 1, 1),
        global_att_blocks=(2,), window_spec=(4, 2, 4, 2),
        window_pos_embed_bkg_spatial_size=(7, 7),
    ).eval()
    sd = {f"image_encoder.trunk.{k}": v for k, v in trunk.state_dict().items()}
    params = C.convert_hiera(sd, TINY)

    from ufvideo_tpu.models.sam2.hiera import Hiera

    x = np.random.RandomState(0).randn(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = trunk(_t(x.transpose(0, 3, 1, 2)))
    mine = Hiera(TINY.hiera).apply({"params": params}, jnp.asarray(x))
    assert len(mine) == len(ref_outs)
    for got, want in zip(mine, ref_outs):
        np.testing.assert_allclose(
            np.asarray(got),
            want.numpy().transpose(0, 2, 3, 1),
            atol=3e-4, rtol=3e-4,
        )


def test_image_encoder_parity(ref):
    import torch

    trunk = ref.Hiera(
        embed_dim=16, num_heads=1, stages=(1, 2, 1, 1),
        global_att_blocks=(2,), window_spec=(4, 2, 4, 2),
        window_pos_embed_bkg_spatial_size=(7, 7),
    )
    neck = ref.FpnNeck(
        position_encoding=ref.PositionEmbeddingSine(num_pos_feats=32),
        d_model=32,
        backbone_channel_list=[128, 64, 32, 16],
        fpn_top_down_levels=[2, 3],
        fpn_interp_model="nearest",
    )
    enc = ref.ImageEncoder(scalp=1, trunk=trunk, neck=neck).eval()
    sd = {f"image_encoder.{k}": v for k, v in enc.state_dict().items()}

    from ufvideo_tpu.models.sam2.hiera import FpnNeck, Hiera

    hp = C.convert_hiera(sd, TINY)
    np_ = C.convert_neck(sd, TINY)

    x = np.random.RandomState(1).randn(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        out = enc(_t(x.transpose(0, 3, 1, 2)))

    feats = Hiera(TINY.hiera).apply({"params": hp}, jnp.asarray(x))
    mine_f, mine_p = FpnNeck(TINY).apply({"params": np_}, feats)
    mine_f, mine_p = mine_f[: -TINY.scalp], mine_p[: -TINY.scalp]

    assert len(mine_f) == len(out["backbone_fpn"])
    for got, want in zip(mine_f, out["backbone_fpn"]):
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
            atol=3e-4, rtol=3e-4,
        )
    for got, want in zip(mine_p, out["vision_pos_enc"]):
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
            atol=1e-4, rtol=1e-4,
        )


def test_memory_attention_parity(ref):
    import torch

    def build_ref():
        def rope(**kw):
            return ref.RoPEAttention(
                rope_theta=10000.0, feat_sizes=[8, 8], embedding_dim=32,
                num_heads=1, downsample_rate=1, dropout=0.0, **kw,
            )

        layer = ref.MemoryAttentionLayer(
            activation="relu", dim_feedforward=64, dropout=0.0,
            pos_enc_at_attn=False, d_model=32,
            pos_enc_at_cross_attn_queries=False, pos_enc_at_cross_attn_keys=True,
            self_attention=rope(),
            cross_attention=rope(rope_k_repeat=True, kv_in_dim=16),
        )
        return ref.MemoryAttention(
            d_model=32, pos_enc_at_input=True, num_layers=1, layer=layer
        ).eval()

    mem_attn = build_ref()
    sd = {f"memory_attention.{k}": v for k, v in mem_attn.state_dict().items()}
    params = C.convert_memory_attention(sd, TINY)

    from ufvideo_tpu.models.sam2.memory import MemoryAttention

    rng = np.random.RandomState(2)
    b, nq = 2, 64  # 8x8 grid
    n_mem = 2 * 64  # two memory frames
    n_ptr_tok = 4  # 2 pointers x (32/16) tokens
    curr = rng.randn(b, nq, 32).astype(np.float32)
    curr_pos = rng.randn(b, nq, 32).astype(np.float32)
    mem = rng.randn(b, n_mem + n_ptr_tok, 16).astype(np.float32)
    mem_pos = rng.randn(b, n_mem + n_ptr_tok, 16).astype(np.float32)

    with torch.no_grad():
        # reference expects seq-first [N, B, C]
        want = mem_attn(
            curr=_t(curr).transpose(0, 1),
            memory=_t(mem).transpose(0, 1),
            curr_pos=_t(curr_pos).transpose(0, 1),
            memory_pos=_t(mem_pos).transpose(0, 1),
            num_obj_ptr_tokens=n_ptr_tok,
        )
    # torch path is seq-first: inputs [seq, batch, C]
    with torch.no_grad():
        want = mem_attn(
            curr=_t(curr.transpose(1, 0, 2)),
            memory=_t(mem.transpose(1, 0, 2)),
            curr_pos=_t(curr_pos.transpose(1, 0, 2)),
            memory_pos=_t(mem_pos.transpose(1, 0, 2)),
            num_obj_ptr_tokens=n_ptr_tok,
        ).numpy().transpose(1, 0, 2)

    got = MemoryAttention(TINY).apply(
        {"params": params},
        jnp.asarray(curr), jnp.asarray(curr_pos),
        jnp.asarray(mem), jnp.asarray(mem_pos),
        num_obj_ptr_tokens=n_ptr_tok,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_memory_encoder_parity(ref):
    import torch

    menc = ref.MemoryEncoder(
        out_dim=16,
        position_encoding=ref.PositionEmbeddingSine(num_pos_feats=16),
        mask_downsampler=ref.MaskDownSampler(
            embed_dim=32, kernel_size=3, stride=2, padding=1
        ),
        fuser=ref.Fuser(
            ref.CXBlock(dim=32, kernel_size=7, padding=3,
                        layer_scale_init_value=1e-6, use_dwconv=True),
            num_layers=2,
        ),
        in_dim=32,
    ).eval()
    sd = {f"memory_encoder.{k}": v for k, v in menc.state_dict().items()}
    params = C.convert_memory_encoder(sd)

    from ufvideo_tpu.models.sam2.memory import MemoryEncoder

    rng = np.random.RandomState(3)
    pix = rng.randn(1, 8, 8, 32).astype(np.float32)
    masks = rng.randn(1, 128, 128, 1).astype(np.float32)
    with torch.no_grad():
        want = menc(
            _t(pix.transpose(0, 3, 1, 2)), _t(masks.transpose(0, 3, 1, 2)),
            skip_mask_sigmoid=True,
        )["vision_features"].numpy().transpose(0, 2, 3, 1)
    got = MemoryEncoder(TINY).apply(
        {"params": params}, jnp.asarray(pix), jnp.asarray(masks),
        skip_mask_sigmoid=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_mask_decoder_parity(ref):
    import torch

    dec = ref.MaskDecoder(
        num_multimask_outputs=3,
        transformer=ref.TwoWayTransformer(
            depth=2, embedding_dim=32, mlp_dim=2048, num_heads=8
        ),
        transformer_dim=32,
        iou_head_depth=3,
        iou_head_hidden_dim=32,
        use_high_res_features=True,
        iou_prediction_use_sigmoid=True,
        pred_obj_scores=True,
        pred_obj_scores_mlp=True,
        use_multimask_token_for_obj_ptr=True,
        dynamic_multimask_via_stability=True,
        dynamic_multimask_stability_delta=0.05,
        dynamic_multimask_stability_thresh=0.98,
    ).eval()
    penc = ref.PromptEncoder(
        embed_dim=32, image_embedding_size=(8, 8),
        input_image_size=(128, 128), mask_in_chans=16,
    ).eval()
    sd = {f"sam_mask_decoder.{k}": v for k, v in dec.state_dict().items()}
    sd.update({f"sam_prompt_encoder.{k}": v for k, v in penc.state_dict().items()})
    dp = C.convert_mask_decoder(sd, TINY)
    pp = C.convert_prompt_encoder(sd)

    from ufvideo_tpu.models.sam2.prompt_mask import MaskDecoder, PromptEncoder

    rng = np.random.RandomState(4)
    b = 2
    img_emb = rng.randn(b, 8, 8, 32).astype(np.float32)
    lang = rng.randn(b, 1, 32).astype(np.float32)
    hi0 = rng.randn(b, 32, 32, 4).astype(np.float32)
    hi1 = rng.randn(b, 16, 16, 8).astype(np.float32)

    # reference path: empty point + language embd appended to sparse prompts
    import torch as T

    with torch.no_grad():
        coords = T.zeros(b, 1, 2)
        labels = -T.ones(b, 1, dtype=T.int32)
        sparse, dense = penc(points=(coords, labels), boxes=None, masks=None)
        sparse = T.cat([sparse, _t(lang)], dim=1)
        want_masks, want_iou, want_tokens, want_obj = dec(
            image_embeddings=_t(img_emb.transpose(0, 3, 1, 2)),
            image_pe=penc.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=True,
            repeat_image=False,
            high_res_features=[
                _t(hi0.transpose(0, 3, 1, 2)), _t(hi1.transpose(0, 3, 1, 2))
            ],
        )

    pe_mod = PromptEncoder(TINY)
    pvars = {"params": pp}
    sparse_j, dense_j = pe_mod.apply(
        pvars, jnp.zeros((b, 1, 2)), -jnp.ones((b, 1), jnp.int32), None
    )
    sparse_j = jnp.concatenate([sparse_j, jnp.asarray(lang)], axis=1)
    dense_pe = pe_mod.apply(pvars, method=PromptEncoder.dense_pe)

    got_masks, got_iou, got_tokens, got_obj = MaskDecoder(TINY).apply(
        {"params": dp},
        jnp.asarray(img_emb),
        dense_pe,
        sparse_j,
        dense_j,
        [jnp.asarray(hi0), jnp.asarray(hi1)],
        True,
    )
    np.testing.assert_allclose(
        np.asarray(got_masks), want_masks.numpy(), atol=3e-4, rtol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_iou), want_iou.numpy(), atol=3e-4, rtol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_obj), want_obj.numpy(), atol=3e-4, rtol=3e-4
    )
