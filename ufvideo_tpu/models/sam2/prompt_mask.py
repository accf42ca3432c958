"""SAM prompt encoder + mask decoder with the [SEG] language-embedding
extension, TPU-native.

Re-implements the reference PromptEncoder (reference: sam2.py:1565-1731),
TwoWayTransformer/Block (:1260-1429), and MaskDecoder (:1941-2224) including:
  - language-embedding concat onto sparse prompt tokens (:3368-3379)
  - hypernetwork mask prediction and high-res skip features (:2145-2167)
  - IoU head (sigmoid), object-score head (MLP)
  - dynamic multimask-via-stability fallback (:2176-2224)

Everything is static-shape: point prompts are a fixed-size padded array
(label -1 = padding, exactly the reference's convention).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...configs import SAM2Config
from .common import (
    ChannelLayerNorm,
    PositionEmbeddingRandom,
    ProjAttention,
    SamMLP,
)


class PromptEncoder(nn.Module):
    """Sparse (points/boxes) and dense (mask) prompt embeddings
    (sam2.py:1565-1731)."""

    cfg: SAM2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.pe_layer = PositionEmbeddingRandom(
            cfg.sam_embed_dim // 2, self.param_dtype, name="pe_layer"
        )
        self.point_embeddings = [
            self.param(
                f"point_embeddings_{i}",
                nn.initializers.normal(1.0),
                (cfg.sam_embed_dim,),
                self.param_dtype,
            )
            for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed",
            nn.initializers.normal(1.0),
            (cfg.sam_embed_dim,),
            self.param_dtype,
        )
        self.no_mask_embed = self.param(
            "no_mask_embed",
            nn.initializers.normal(1.0),
            (cfg.sam_embed_dim,),
            self.param_dtype,
        )
        mask_in = 16
        self.mask_conv1 = nn.Conv(
            mask_in // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
            param_dtype=self.param_dtype, name="mask_downscaling_0",
        )
        self.mask_ln1 = ChannelLayerNorm(param_dtype=self.param_dtype, name="mask_downscaling_1")
        self.mask_conv2 = nn.Conv(
            mask_in, (2, 2), strides=(2, 2), dtype=self.dtype,
            param_dtype=self.param_dtype, name="mask_downscaling_3",
        )
        self.mask_ln2 = ChannelLayerNorm(param_dtype=self.param_dtype, name="mask_downscaling_4")
        self.mask_conv3 = nn.Conv(
            cfg.sam_embed_dim, (1, 1), dtype=self.dtype,
            param_dtype=self.param_dtype, name="mask_downscaling_6",
        )

    def dense_pe(self) -> jnp.ndarray:
        """[H, W, C] positional grid for the image embedding."""
        s = self.cfg.sam_image_embedding_size
        return self.pe_layer.grid(s, s)

    def embed_points(
        self, coords: jnp.ndarray, labels: jnp.ndarray, pad: bool = True
    ) -> jnp.ndarray:
        """coords [B, P, 2] absolute pixels, labels [B, P] in {-1,0,1,2,3}."""
        cfg = self.cfg
        if pad:
            b = coords.shape[0]
            coords = jnp.concatenate(
                [coords, jnp.zeros((b, 1, 2), coords.dtype)], axis=1
            )
            labels = jnp.concatenate(
                [labels, -jnp.ones((b, 1), labels.dtype)], axis=1
            )
        pts = (coords.astype(jnp.float32) + 0.5) / cfg.hiera.image_size
        pe = self.pe_layer(pts)
        emb = jnp.where(labels[..., None] == -1, 0.0, pe)
        table = jnp.stack(
            [self.not_a_point_embed] + list(self.point_embeddings)
        ).astype(jnp.float32)  # [5, C]: -1,0,1,2,3
        emb = emb + table[jnp.clip(labels + 1, 0, 4)]
        return emb.astype(self.dtype)

    def embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """[B, 4s, 4s, 1] mask prompt → [B, s, s, C] dense embedding."""
        x = self.mask_conv1(masks.astype(self.dtype))
        x = nn.gelu(self.mask_ln1(x).astype(self.dtype), approximate=False)
        x = self.mask_conv2(x)
        x = nn.gelu(self.mask_ln2(x).astype(self.dtype), approximate=False)
        return self.mask_conv3(x)

    def no_mask_dense(self, batch: int) -> jnp.ndarray:
        s = self.cfg.sam_image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.astype(self.dtype)[None, None, None],
            (batch, s, s, self.cfg.sam_embed_dim),
        )

    def __call__(self, coords, labels, masks: Optional[jnp.ndarray]):
        sparse = self.embed_points(coords, labels, pad=True)
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = self.no_mask_dense(coords.shape[0])
        return sparse, dense


class TwoWayAttentionBlock(nn.Module):
    cfg: SAM2Config
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        attn = lambda ds, name: ProjAttention(
            cfg.sam_embed_dim, 8, ds, None, self.dtype, self.param_dtype,
            name=name,
        )
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5,  # torch nn.LayerNorm default (reference uses it)
            dtype=jnp.float32, param_dtype=self.param_dtype, name=name
        )
        if self.skip_first_layer_pe:
            queries = attn(1, "self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + attn(1, "self_attn")(q, q, queries)
        queries = ln("norm1")(queries).astype(self.dtype)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + attn(2, "cross_attn_token_to_image")(q, k, keys)
        queries = ln("norm2")(queries).astype(self.dtype)

        mlp = SamMLP(
            2048, cfg.sam_embed_dim, 2, activation="relu",
            dtype=self.dtype, param_dtype=self.param_dtype, name="mlp",
        )
        queries = queries + mlp(queries)
        queries = ln("norm3")(queries).astype(self.dtype)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + attn(2, "cross_attn_image_to_token")(k, q, queries)
        keys = ln("norm4")(keys).astype(self.dtype)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Depth-2 two-way transformer (sam2.py:1260-1352)."""

    cfg: SAM2Config
    depth: int = 2
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/pe: [B, H, W, C]; point_embedding: [B, N, C]."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c)
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.cfg, skip_first_layer_pe=(i == 0),
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        attn_out = ProjAttention(
            self.cfg.sam_embed_dim, 8, 2, None, self.dtype, self.param_dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(
            epsilon=1e-5,  # torch nn.LayerNorm default (reference uses it)
            dtype=jnp.float32, param_dtype=self.param_dtype,
            name="norm_final_attn",
        )(queries).astype(self.dtype)
        return queries, keys


class MaskDecoder(nn.Module):
    """SAM mask decoder (sam2.py:1941-2224) with obj-score token and
    stability-based multimask fallback."""

    cfg: SAM2Config
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def num_mask_tokens(self) -> int:
        return self.cfg.num_multimask_outputs + 1

    @nn.compact
    def __call__(
        self,
        image_embeddings: jnp.ndarray,  # [B, H, W, C]
        image_pe: jnp.ndarray,  # [H, W, C]
        sparse_prompts: jnp.ndarray,  # [B, N, C]
        dense_prompts: jnp.ndarray,  # [B, H, W, C]
        high_res_features: Optional[List[jnp.ndarray]],  # [(B,4H,4W,C/8),(B,2H,2W,C/4)]
        multimask_output: bool,
        apply_stability: bool = True,
    ):
        cfg = self.cfg
        c = cfg.sam_embed_dim
        b = sparse_prompts.shape[0]
        nm = self.num_mask_tokens

        obj_token = self.param(
            "obj_score_token", nn.initializers.normal(1.0), (1, c),
            self.param_dtype,
        )
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, c), self.param_dtype
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (nm, c),
            self.param_dtype,
        )
        out_tokens = jnp.concatenate(
            [obj_token, iou_token, mask_tokens], axis=0
        ).astype(self.dtype)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None], (b, nm + 2, c)),
             sparse_prompts.astype(self.dtype)],
            axis=1,
        )

        src = image_embeddings.astype(self.dtype) + dense_prompts.astype(self.dtype)
        pos_src = jnp.broadcast_to(image_pe[None], src.shape).astype(self.dtype)

        hs, keys = TwoWayTransformer(
            cfg, dtype=self.dtype, param_dtype=self.param_dtype,
            name="transformer",
        )(src, pos_src, tokens)
        iou_token_out = hs[:, 1]
        mask_tokens_out = hs[:, 2 : 2 + nm]

        h, w = src.shape[1], src.shape[2]
        src_out = keys.reshape(b, h, w, c)

        # upscaling trunk (ConvTranspose 2x twice) with high-res skips
        # (sam2.py:2145-2155)
        dc1 = nn.ConvTranspose(
            c // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
            param_dtype=self.param_dtype, name="output_upscaling_0",
        )
        ln1 = ChannelLayerNorm(param_dtype=self.param_dtype, name="output_upscaling_1")
        dc2 = nn.ConvTranspose(
            c // 8, (2, 2), strides=(2, 2), dtype=self.dtype,
            param_dtype=self.param_dtype, name="output_upscaling_3",
        )
        feat_s0, feat_s1 = high_res_features
        up = dc1(src_out) + feat_s1.astype(self.dtype)
        up = nn.gelu(ln1(up).astype(self.dtype), approximate=False)
        up = nn.gelu(dc2(up) + feat_s0.astype(self.dtype), approximate=False)

        hyper = []
        for i in range(nm):
            hyper.append(
                SamMLP(
                    c, c // 8, 3, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"output_hypernetworks_mlps_{i}",
                )(mask_tokens_out[:, i])
            )
        hyper_in = jnp.stack(hyper, axis=1)  # [B, nm, c/8]
        uh, uw = up.shape[1], up.shape[2]
        masks = jnp.einsum(
            "bnc,bhwc->bnhw", hyper_in.astype(jnp.float32),
            up.astype(jnp.float32),
        )

        iou_pred = SamMLP(
            cfg.iou_head_hidden_dim, nm, cfg.iou_head_depth,
            sigmoid_output=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name="iou_prediction_head",
        )(iou_token_out).astype(jnp.float32)
        object_score_logits = SamMLP(
            c, 1, 3, dtype=self.dtype, param_dtype=self.param_dtype,
            name="pred_obj_score_head",
        )(hs[:, 0]).astype(jnp.float32)

        if multimask_output:
            out_masks = masks[:, 1:]
            out_iou = iou_pred[:, 1:]
            # multimask token for obj ptr (use_multimask_token_for_obj_ptr)
            sam_tokens_out = mask_tokens_out[:, 1:]
        elif apply_stability:
            # dynamic_multimask_via_stability runs at inference only — the
            # reference gates it with `and not self.training` (sam2.py:2074)
            out_masks, out_iou = self._dynamic_multimask_via_stability(
                masks, iou_pred
            )
            sam_tokens_out = mask_tokens_out[:, 0:1]
        else:
            out_masks = masks[:, 0:1]
            out_iou = iou_pred[:, 0:1]
            sam_tokens_out = mask_tokens_out[:, 0:1]

        return out_masks, out_iou, sam_tokens_out, object_score_logits

    def _dynamic_multimask_via_stability(self, all_masks, all_iou):
        """Single-mask output with stability fallback (sam2.py:2176-2224)."""
        cfg = self.cfg
        delta = 0.05
        thresh = 0.98
        multi = all_masks[:, 1:]
        multi_iou = all_iou[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)
        bidx = jnp.arange(all_masks.shape[0])
        best_masks = multi[bidx, best][:, None]
        best_iou = multi_iou[bidx, best][:, None]

        single = all_masks[:, 0:1]
        single_iou = all_iou[:, 0:1]
        flat = single.reshape(single.shape[0], -1)
        area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
        area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
        stability = jnp.where(area_u > 0, area_i / area_u, 1.0)
        is_stable = (stability >= thresh)[:, None]

        masks_out = jnp.where(is_stable[..., None, None], single, best_masks)
        iou_out = jnp.where(is_stable, single_iou, best_iou)
        return masks_out, iou_out
