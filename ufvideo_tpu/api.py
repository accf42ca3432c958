"""Public inference API: ``model_init`` and ``mm_infer``.

Mirrors the reference's entry points (reference: ufvideo/__init__.py:14
model_init, :34-149 mm_infer): same prompt-assembly choices, multimodal
tokenization, greedy decoding with eos stop, and the two [SEG] paths —
post-hoc extraction from generated tokens (videorefer_qwen2.py:405-459) and
input-[SEG] single-forward extraction (:461-518) — both feeding the SAM2
video propagator.

Device work is organized as a small set of jitted stages with static shapes
(budgets from the config); all dynamic bookkeeping happens host-side.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .configs import UFVideoConfig
from .constants import DEFAULT_IMAGE_TOKEN, DEFAULT_VIDEO_TOKEN
from .mm_utils import (
    TextDeltaStreamer,
    tokenizer_multimodal_token,
    trim_at_stop_strings,
)
from .models.generate import forward_hidden, greedy_generate
from .models.sam2 import SAM2
from .models.sam2.video import (
    encode_video_frames,
    masks_to_video_res,
    propagate_video,
)
from .models.ufvideo import UFVideoModel
from .splicing import plan_splice
from .tokenization import SpecialIds, byte_tokenizer_with_ids


class UFVideoRuntime:
    """Owns the composite model + SAM2 + params and the jitted stages."""

    def __init__(self, cfg: UFVideoConfig, params: Dict[str, Any], ids: SpecialIds):
        self.cfg = cfg
        self.params = params
        self.ids = ids
        self.model = UFVideoModel(cfg)
        self.sam = SAM2(
            cfg.sam, dtype=cfg.compute_dtype, param_dtype=cfg.param_dtype,
            quant=cfg.quant_vision,
        )
        self._encode_video = jax.jit(
            lambda p, x: self.model.encode_video(p, x)
        )
        self._encode_regions = jax.jit(
            lambda p, f, m, fv, seg: self.model.encode_regions(p, f, m, fv, seg)
        )
        self._splice = jax.jit(
            lambda p, ids_, kind, idx, v, r: self.model.splice_embeds(
                p, ids_, kind, idx, v, r
            )
        )
        self._seg_embed = jax.jit(
            lambda p, h: self.model.seg_embeddings(p, h)
        )

    # -------------------- encoders --------------------

    def encode_video(self, pixels: np.ndarray) -> jnp.ndarray:
        """[B, T, H, W, 3] SigLIP-preprocessed frames → video tokens."""
        return self._encode_video(self.params, jnp.asarray(pixels))

    def pack_and_encode_regions(
        self,
        frame_pixels: np.ndarray,  # [F_actual, H, W, 3] annotated frames
        masks: np.ndarray,  # [F_actual, Hm, Wm] binary masks
        ann_indices: Sequence[Sequence[int]],  # frames per region
    ):
        """Reference-style (frame, masks, ann_indices) → static region
        tokens. Returns (region_feats [1, R*rt, D], region_token_counts).

        ``ann_indices=None`` defaults to one region per annotated frame
        (the reference contract requires ann_indices whenever masks are
        given — layer.py:93 indexes it unconditionally — so this is a
        strictly-more-forgiving extension, not a deviation).

        Static shapes: masks are pre-resized HOST-side to the vision patch
        grid (the exact reduction the jit would do first — see
        resize_mask_to_grid_np) and frame/region counts are bucketed to
        powers of two, so the region-encoder jit compiles once per bucket
        instead of once per (F, R, Hm, Wm) — compiles cost minutes on this
        runtime."""
        from .models.region_encoder import resize_mask_to_grid_np

        cfg = self.cfg
        rt = cfg.region.region_token_num
        if ann_indices is None:
            ann_indices = [[i] for i in range(len(masks))]
        grid = cfg.vision.image_size // cfg.vision.patch_size

        def pow2(n):
            return 1 << max(n - 1, 0).bit_length()

        f_budget = pow2(max(len(frame_pixels), 1))
        r_budget = pow2(max(len(ann_indices), 1))

        fp = np.zeros((1, f_budget) + frame_pixels.shape[1:], np.float32)
        fp[0, : len(frame_pixels)] = frame_pixels
        mk = np.zeros((1, f_budget, grid, grid), np.float32)
        mk[0, : len(masks)] = resize_mask_to_grid_np(masks, grid)
        fv = np.zeros((1, f_budget), bool)
        fv[0, : len(frame_pixels)] = True
        seg = np.zeros((1, r_budget, f_budget), bool)
        for r, idxs in enumerate(ann_indices):
            for i in idxs:
                seg[0, r, i] = True

        feats, _ = self._encode_regions(
            self.params, jnp.asarray(fp), jnp.asarray(mk),
            jnp.asarray(fv), jnp.asarray(seg),
        )
        counts = [min(len(idxs), rt) for idxs in ann_indices]
        return feats, counts

    # -------------------- generation --------------------

    def generate(
        self,
        input_ids: List[int],
        video_feats: Optional[jnp.ndarray],
        region_feats: Optional[jnp.ndarray] = None,
        region_token_counts: Optional[List[int]] = None,
        max_new_tokens: int = 128,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 1.0,
        seed: int = 0,
        stop_sequences: tuple = (),
    ):
        """Greedy decode. Returns (generated ids list, hidden states of the
        steps that produced them [N, hidden], spliced plan).
        ``stop_sequences``: tokenized keyword stops (tuple of id tuples),
        the in-loop equivalent of KeywordsStoppingCriteria.

        One-element delegation to generate_batch — a single plan/trim/
        dispatch implementation so fixes can never diverge between the
        single-sample and batched serving paths."""
        out, plan = self.generate_batch(
            [input_ids],
            video_feats,
            region_feats,
            [region_token_counts or []],
            max_new_tokens=max_new_tokens,
            do_sample=do_sample,
            temperature=temperature,
            top_p=top_p,
            seed=seed,
            stop_sequences=stop_sequences,
        )
        tokens, hidden = out[0]
        return tokens, hidden, plan

    def generate_batch(
        self,
        input_ids_list: Sequence[List[int]],
        video_feats: Optional[jnp.ndarray],  # [B, V, D] or None
        region_feats: Optional[jnp.ndarray] = None,  # [B, RT, D]
        region_counts_list: Optional[Sequence[List[int]]] = None,
        max_new_tokens: int = 128,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 1.0,
        seed: int = 0,
        stop_sequences: tuple = (),
    ):
        """Batched greedy decode over B samples (the serving configuration:
        prefill/decode weight traffic amortizes across the batch — see
        bench.py e2e_batch). Returns a list of (ids, hidden [N, hidden])
        per sample, plus the shared splice plan."""
        cfg = self.cfg
        b = len(input_ids_list)
        plan = plan_splice(
            list(input_ids_list),
            num_video_tokens=(
                video_feats.shape[1] if video_feats is not None else 0
            ),
            region_token_counts=[
                (region_counts_list[i] if region_counts_list else []) or []
                for i in range(b)
            ],
            region_token_id=self.ids.region,
            max_seq_len=cfg.budget.max_seq_len,
            region_stride=cfg.region.region_token_num,
        )
        embeds = self._splice(
            self.params,
            jnp.asarray(plan.text_ids),
            jnp.asarray(plan.src_kind),
            jnp.asarray(plan.src_idx),
            video_feats,
            region_feats,
        )
        # length bucketing: the plan pads to the static max_seq_len budget;
        # trim prefill + kv cache to the 256-rounded true length (a 2.7k
        # PixRQA prompt in a 4096 budget otherwise wastes ~33% of prefill
        # and decode-read time). Bucketing keeps recompiles bounded.
        real_len = int(max(plan.seq_lens))
        trim = min((real_len + 255) // 256 * 256, cfg.budget.max_seq_len)
        spec_k = int(cfg.spec_decode or 0)
        if spec_k and not do_sample and not stop_sequences:
            # prompt-lookup speculative decoding (greedy-exact; sampling and
            # in-loop multi-token stops stay on the plain loop)
            from .models.speculative import spec_generate
            from .splicing import plan_lookup_ids

            res = spec_generate(
                self.model.llm,
                self.params["llm"],
                embeds[:, :trim],
                jnp.asarray(plan.seq_lens),
                jnp.asarray(plan_lookup_ids(plan)[:, :trim]),
                max_new_tokens=max_new_tokens,
                stop_ids=(self.ids.eos,),
                cache_max_len=trim + max_new_tokens + spec_k,
                draft_k=spec_k,
                vocab_size=cfg.llm.vocab_size,
                kv_quant=bool(cfg.quant_kv),
                prefill_chunk=cfg.prefill_chunk,
            ).as_generate_result()
        else:
            res = greedy_generate(
                self.model.llm,
                self.params["llm"],
                embeds[:, :trim],
                jnp.asarray(plan.seq_lens),
                max_new_tokens=max_new_tokens,
                stop_ids=(self.ids.eos,),
                cache_max_len=trim + max_new_tokens,
                vocab_size=cfg.llm.vocab_size,
                do_sample=do_sample,
                temperature=temperature,
                top_p=top_p,
                rng=jax.random.PRNGKey(seed),
                stop_sequences=tuple(tuple(s) for s in stop_sequences),
                kv_quant=bool(cfg.quant_kv),
                # greedy_generate gates validity itself (any 0<chunk<b works,
                # non-dividing batches included)
                prefill_chunk=cfg.prefill_chunk,
            )
        out = []
        for i in range(b):
            n = int(res.gen_lens[i])
            out.append((np.asarray(res.tokens[i, :n]).tolist(), res.hidden[i, :n]))
        return out, plan

    def generate_stream(
        self,
        input_ids: List[int],
        video_feats: Optional[jnp.ndarray],
        region_feats: Optional[jnp.ndarray] = None,
        region_token_counts: Optional[List[int]] = None,
        max_new_tokens: int = 128,
        chunk: int = 16,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 1.0,
        seed: int = 0,
    ):
        """Streaming decode for ONE sample: yields ``(ids_chunk, hiddens
        [n, hidden])`` per dispatch (first yield after prefill). Token-
        identical to ``generate`` under the same sampling state; the decode
        runs in ``chunk``-step dispatches instead of one fused loop (see
        models/generate.stream_generate)."""
        cfg = self.cfg
        from .models.generate import stream_generate

        plan = plan_splice(
            [list(input_ids)],
            num_video_tokens=(
                video_feats.shape[1] if video_feats is not None else 0
            ),
            region_token_counts=[region_token_counts or []],
            region_token_id=self.ids.region,
            max_seq_len=cfg.budget.max_seq_len,
            region_stride=cfg.region.region_token_num,
        )
        embeds = self._splice(
            self.params,
            jnp.asarray(plan.text_ids),
            jnp.asarray(plan.src_kind),
            jnp.asarray(plan.src_idx),
            video_feats,
            region_feats,
        )
        real_len = int(max(plan.seq_lens))
        trim = min((real_len + 255) // 256 * 256, cfg.budget.max_seq_len)
        spec_k = int(cfg.spec_decode or 0)
        if spec_k and not do_sample:
            # speculation and streaming compose: each dispatch is one
            # draft→verify iteration surfacing 1..K+1 tokens
            from .models.speculative import spec_stream_generate
            from .splicing import plan_lookup_ids

            prev = 0
            for tokens, gen_lens, hiddens, done in spec_stream_generate(
                self.model.llm,
                self.params["llm"],
                embeds[:, :trim],
                jnp.asarray(plan.seq_lens),
                jnp.asarray(plan_lookup_ids(plan)[:, :trim]),
                max_new_tokens=max_new_tokens,
                stop_ids=(self.ids.eos,),
                cache_max_len=trim + max_new_tokens + spec_k,
                draft_k=spec_k,
                vocab_size=cfg.llm.vocab_size,
                kv_quant=bool(cfg.quant_kv),
                prefill_chunk=cfg.prefill_chunk,
            ):
                n = int(gen_lens[0])
                if n > prev:
                    yield (
                        np.asarray(tokens[0, prev:n]).tolist(),
                        hiddens[0, prev:n],
                    )
                    prev = n
                if bool(done[0]):
                    return
            return
        for tokens, n, hiddens, done in stream_generate(
            self.model.llm,
            self.params["llm"],
            embeds[:, :trim],
            jnp.asarray(plan.seq_lens),
            max_new_tokens=max_new_tokens,
            stop_ids=(self.ids.eos,),
            cache_max_len=trim + max_new_tokens,
            chunk=chunk,
            vocab_size=cfg.llm.vocab_size,
            do_sample=do_sample,
            temperature=temperature,
            top_p=top_p,
            rng=jax.random.PRNGKey(seed),
            kv_quant=bool(cfg.quant_kv),
            prefill_chunk=cfg.prefill_chunk,
        ):
            k = int(n[0])
            if k:
                yield np.asarray(tokens[0, :k]).tolist(), hiddens[0, :k]
            if bool(done[0]):
                return

    def forward_hidden_states(self, plan, video_feats, region_feats=None):
        embeds = self._splice(
            self.params,
            jnp.asarray(plan.text_ids),
            jnp.asarray(plan.src_kind),
            jnp.asarray(plan.src_idx),
            video_feats,
            region_feats,
        )
        return forward_hidden(
            self.model.llm, self.params["llm"], embeds,
            jnp.asarray(plan.seq_lens),
        )

    # -------------------- SAM2 --------------------

    def segment_video(
        self,
        images_sam: np.ndarray,  # [T, 1024, 1024, 3] SAM-preprocessed (or uint8 raw)
        seg_embeddings: jnp.ndarray,  # [n_obj, 256]
        out_height: int,
        out_width: int,
    ) -> np.ndarray:
        """[SEG] embeddings → per-frame boolean masks [n_obj, T, H, W]
        (reference language_embd_inference + upsample + sigmoid>0.5,
        sam2.py:378-404, videorefer_qwen2.py:447-452)."""
        images_sam = np.asarray(images_sam)
        if images_sam.dtype == np.uint8:
            from .ops.image_pipeline import sam_preprocess_device

            images = sam_preprocess_device(
                jnp.asarray(images_sam), out_dtype=self.cfg.compute_dtype
            )
        else:
            images = jnp.asarray(images_sam)
        feats = encode_video_frames(self.sam, self.params["sam"], images)
        low = propagate_video(
            self.sam, self.params["sam"], feats, seg_embeddings[:, None, :]
        )
        masks = masks_to_video_res(low, out_height, out_width)
        return np.asarray(masks).transpose(1, 0, 2, 3)

    def segment_videos_batched(
        self,
        images_sam: np.ndarray,  # [V, T, 1024, 1024, 3] (or uint8 raw)
        seg_embeddings: jnp.ndarray,  # [V, 256] — one [SEG] object per video
        out_height: int,
        out_width: int,
    ) -> np.ndarray:
        """V independent videos' [SEG] propagation in one scan (the videos
        ride the object-batch dim — models/sam2/video.py
        propagate_videos_batched). Returns [V, T, H, W] boolean masks."""
        from .models.sam2.video import propagate_videos_batched

        images_sam = np.asarray(images_sam)
        v, t = images_sam.shape[:2]
        flat = images_sam.reshape((v * t,) + images_sam.shape[2:])
        if flat.dtype == np.uint8:
            from .ops.image_pipeline import sam_preprocess_device

            images = sam_preprocess_device(
                jnp.asarray(flat), out_dtype=self.cfg.compute_dtype
            )
        else:
            images = jnp.asarray(flat)
        feats = encode_video_frames(self.sam, self.params["sam"], images)
        vfeats = feats.map_frames(lambda a: a.reshape((v, t) + a.shape[1:]))
        low = propagate_videos_batched(
            self.sam, self.params["sam"], vfeats, seg_embeddings[:, None, :]
        )  # [T, V, 1, h4, w4]
        masks = masks_to_video_res(low, out_height, out_width)  # [T, V, H, W]
        return np.asarray(masks).transpose(1, 0, 2, 3)


def model_init(
    model_path: Optional[str] = None,
    *,
    cfg: Optional[UFVideoConfig] = None,
    sam_path: Optional[str] = None,
    tokenizer_path: Optional[str] = None,
    **kwargs,
):
    """Build (runtime, processor, tokenizer) — the reference's model_init
    contract (ufvideo/__init__.py:14-31).

    With ``model_path`` None, returns a randomly-initialized runtime with the
    byte tokenizer (offline smoke mode)."""
    cfg = cfg or UFVideoConfig()

    if tokenizer_path:
        from .tokenization import load_tokenizer

        tokenizer, ids = load_tokenizer(tokenizer_path)
    else:
        tokenizer, ids = byte_tokenizer_with_ids()

    cfg = cfg.replace(
        region_token_id=ids.region,
        seg_token_id=ids.seg,
        temporal_token_start_id=ids.temporal_start,
    )

    if model_path:
        from .checkpoints import (
            convert_full_checkpoint,
            infer_vocab_size,
            load_sam2_checkpoint,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(model_path)
        cfg = cfg.replace(
            llm=dataclasses.replace(cfg.llm, vocab_size=infer_vocab_size(sd))
        )
        sam_sd = load_sam2_checkpoint(sam_path) if sam_path else None
        params = convert_full_checkpoint(sd, cfg, sam_sd)
        params = jax.tree.map(
            lambda x: jnp.asarray(x, cfg.param_dtype)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else jnp.asarray(x),
            params,
        )
        if cfg.quant_llm:
            from .quant import quantize_qwen2_params

            params["llm"] = quantize_qwen2_params(
                params["llm"],
                bits=4 if cfg.quant_llm in (4, "int4", "4bit") else 8,
            )
        if cfg.quant_vision:
            from .quant import quantize_sam2_params, quantize_vision_params

            params["vision"] = quantize_vision_params(params["vision"])
            if "sam" in params:
                params["sam"] = quantize_sam2_params(params["sam"])
    else:
        model = UFVideoModel(cfg)
        sam = SAM2(
            cfg.sam, dtype=cfg.compute_dtype, param_dtype=cfg.param_dtype,
            quant=cfg.quant_vision,
        )

        def _init_sam(key):
            return sam.init(
                key,
                jnp.zeros(
                    (1, cfg.sam.hiera.image_size, cfg.sam.hiera.image_size,
                     3),
                    jnp.float32,
                ),
            )["params"]

        # jit the random init: eagerly, flax init issues one remote
        # dispatch per initializer (~minutes of pure RTT at 7B scale on
        # this runtime); fused it is one persistent-cacheable executable
        # and the host never touches the weights. int4 quant stays eager
        # (the axon PJRT client cannot relay S4 jit outputs).
        fuse = cfg.quant_llm not in (4, "int4", "4bit")
        init_params = (
            jax.jit(model.init_params) if fuse else model.init_params
        )
        init_sam = jax.jit(_init_sam) if fuse else _init_sam
        params = dict(init_params(jax.random.PRNGKey(0)))
        params["sam"] = init_sam(jax.random.PRNGKey(1))

    runtime = UFVideoRuntime(cfg, params, ids)
    return runtime, None, tokenizer


def _assemble_input_ids(instruct, choice, modal_token, tokenizer):
    """Prompt assembly with the reference's choice semantics
    (ufvideo/__init__.py:70-104) → multimodal-tokenized ids."""
    if choice in (1, 2):
        if isinstance(instruct, str):
            content = (
                f"{modal_token}\n{instruct}" if choice == 1 else instruct
            )
            message = [{"role": "user", "content": content}]
        else:
            # list-form instructs get the modal token for BOTH choices —
            # deliberate reference asymmetry (only the string form skips it
            # under choice 2; ufvideo/__init__.py:79-84)
            message = [dict(m) for m in instruct]
            message[0]["content"] = f"{modal_token}\n" + message[0]["content"]
    elif choice == 3:
        roles = {"human": "user", "gpt": "assistant"}
        message = [
            {"role": roles.get(s["from"], s["from"]), "content": s["value"]}
            for s in instruct
        ]
    else:
        raise ValueError(f"unknown choice {choice}")

    prompt = tokenizer.apply_chat_template(
        message, tokenize=False, add_generation_prompt=True
    )
    return tokenizer_multimodal_token(prompt, tokenizer, modal_token)


def _encode_video_input(model: UFVideoRuntime, image_or_video, modal: str):
    """Vision encode for one sample (uint8 input → fused on-device
    resize+normalize, 4x less host→device traffic); image modal broadcasts
    the single frame across the frame budget."""
    if modal == "text":
        return None
    cfg = model.cfg
    pixels = np.asarray(image_or_video)
    if pixels.dtype == np.uint8:
        from .ops.image_pipeline import siglip_preprocess_device

        pixels = siglip_preprocess_device(
            jnp.asarray(pixels), out_dtype=cfg.compute_dtype
        )
    elif pixels.dtype == np.float32 and cfg.compute_dtype == jnp.bfloat16:
        # encode-bit-identical (the tower computes in bf16), half the
        # host→device bytes — the transfer dominates remote admission
        import ml_dtypes

        pixels = pixels.astype(ml_dtypes.bfloat16)
    if modal == "image":
        pixels = jnp.broadcast_to(
            jnp.asarray(pixels)[:1],
            (cfg.budget.num_frames,) + pixels.shape[1:],
        )
    return model.encode_video(jnp.asarray(pixels)[None])


def mm_infer(
    image_or_video,
    instruct,
    model: UFVideoRuntime,
    tokenizer,
    modal: str = "video",
    masks=None,
    ann_indices=None,
    frame=None,
    choice: int = 1,
    images_sam=None,
    label_size=None,
    seg: bool = False,
    **kwargs,
):
    """Reference-compatible inference entry (ufvideo/__init__.py:34-149).

    image_or_video: [T, H, W, 3] preprocessed frames (numpy, NHWC).
    """
    cfg = model.cfg
    modal_token = {
        "image": DEFAULT_IMAGE_TOKEN, "video": DEFAULT_VIDEO_TOKEN, "text": ""
    }[modal]
    input_ids = _assemble_input_ids(
        instruct, choice, modal_token, tokenizer
    )

    video_feats = _encode_video_input(model, image_or_video, modal)

    # 3. region tokens
    region_feats, region_counts = None, None
    if frame is not None and masks is not None:
        region_feats, region_counts = model.pack_and_encode_regions(
            np.asarray(frame), np.asarray(masks), ann_indices
        )

    max_new_tokens = int(kwargs.get("max_new_tokens", 1024))
    # sampling kwargs (reference defaults: do_sample False, temp 0.2 when
    # sampling, top_p 0.9; ufvideo/__init__.py:114-117)
    do_sample = bool(kwargs.get("do_sample", False))
    # greedy ignores temperature — normalize it to 1.0 there so every greedy
    # call shares one compile key; when sampling, honor an explicit 0.0
    # (near-greedy via the max(t, 1e-6) guard in _sample_token)
    temperature = kwargs.get("temperature")
    temperature = (
        float(0.2 if temperature is None else temperature)
        if do_sample else 1.0
    )
    top_p = float(kwargs.get("top_p", 0.9))
    seed = int(kwargs.get("seed", 0))
    # keyword stopping (reference KeywordsStoppingCriteria, mm_utils.py:
    # 418-449): tokenize keyword strings once; matching runs in-loop on ids
    stop_sequences = tuple(
        tuple(tokenizer(s, add_special_tokens=False).input_ids)
        for s in (kwargs.get("stop_strings") or [])
    )
    seg_in_input = model.ids.seg in input_ids

    if not seg_in_input:
        # PATH A (videorefer_qwen2.py:405-459): generate, then post-hoc
        # [SEG] extraction from generated steps
        tokens, hidden, _ = model.generate(
            input_ids, video_feats, region_feats, region_counts,
            max_new_tokens=max_new_tokens,
            do_sample=do_sample, temperature=temperature, top_p=top_p,
            stop_sequences=stop_sequences, seed=seed,
        )
        output_text = tokenizer.decode(tokens, skip_special_tokens=True).strip()
        # string-level trim backstops the in-loop token-id stop: BPE can
        # merge a keyword with preceding text into different ids (e.g.
        # '\n###' → ('\n##','#')), which the id-window compare can't see
        if kwargs.get("stop_strings"):
            output_text = trim_at_stop_strings(
                output_text, kwargs["stop_strings"]
            ).strip()

        pred_masks = []
        # Deliberate deviation from the reference generate path: we take the
        # hidden state of the decode step that PRODUCED each [SEG] token (the
        # training convention, videorefer_qwen2.py:218-220). The reference
        # indexes output.hidden_states[j-1] — one step earlier, degenerately
        # the whole prompt's hiddens when [SEG] is the 2nd generated token
        # (videorefer_qwen2.py:429-435) — so masks here will not bit-match
        # reference inference, by choice.
        seg_steps = [i for i, t in enumerate(tokens) if t == model.ids.seg]
        if seg_steps and images_sam is not None:
            seg_hidden = hidden[jnp.asarray(seg_steps)]
            embeds = model._seg_embed(model.params, seg_hidden)
            h, w = label_size if label_size is not None else (
                cfg.sam.hiera.image_size, cfg.sam.hiera.image_size
            )
            m = model.segment_video(np.asarray(images_sam), embeds, h, w)
            pred_masks = [m[i] for i in range(m.shape[0])]

        out = {"output": tokens, "pred_masks": pred_masks}
        if seg:
            return out
        return output_text, out

    # PATH B (videorefer_qwen2.py:461-518): [SEG] already in the input —
    # single forward, offset-corrected [SEG] hidden states
    plan = plan_splice(
        [input_ids],
        num_video_tokens=video_feats.shape[1] if video_feats is not None else 0,
        region_token_counts=[region_counts or []],
        region_token_id=model.ids.region,
        max_seq_len=cfg.budget.max_seq_len,
        region_stride=cfg.region.region_token_num,
    )
    hidden = model.forward_hidden_states(plan, video_feats, region_feats)
    # hidden state at the position *before* each input [SEG] token
    # (seg_token_mask shifted left, videorefer_qwen2.py:384-385,470-476)
    seg_positions = [
        int(plan.text_pos_map[0][ti]) - 1
        for ti, t in enumerate(input_ids)
        if t == model.ids.seg
    ]
    seg_positions = [p for p in seg_positions if p >= 0]
    pred_masks = []
    if seg_positions and images_sam is not None:
        seg_hidden = hidden[0, jnp.asarray(seg_positions)]
        embeds = model._seg_embed(model.params, seg_hidden)
        h, w = label_size if label_size is not None else (
            cfg.sam.hiera.image_size, cfg.sam.hiera.image_size
        )
        m = model.segment_video(np.asarray(images_sam), embeds, h, w)
        pred_masks = [m[i] for i in range(m.shape[0])]
    return {"output": None, "pred_masks": pred_masks, "gt_masks": masks}


def mm_infer_stream(
    image_or_video,
    instruct,
    model: UFVideoRuntime,
    tokenizer,
    modal: str = "video",
    masks=None,
    ann_indices=None,
    frame=None,
    choice: int = 1,
    chunk: int = 16,
    **kwargs,
):
    """Streaming QA inference: yields TEXT DELTAS as decode chunks complete
    (``"".join(deltas).strip()`` equals ``mm_infer``'s text under the same
    sampling state). Beyond-reference serving surface — the reference's
    mm_infer only returns complete outputs.

    Path A only: an input ``[SEG]`` (seg-style eval) needs the complete
    hidden-state pass — use ``mm_infer``. ``stop_strings`` are honored
    host-side between chunks (generation stops at most one chunk after the
    keyword appears; the emitted text is trimmed exactly)."""
    cfg = model.cfg
    modal_token = {
        "image": DEFAULT_IMAGE_TOKEN, "video": DEFAULT_VIDEO_TOKEN, "text": ""
    }[modal]
    input_ids = _assemble_input_ids(instruct, choice, modal_token, tokenizer)
    if model.ids.seg in input_ids:
        raise ValueError(
            "streaming covers QA generation only; [SEG] inputs need the "
            "full-pass mm_infer"
        )
    video_feats = _encode_video_input(model, image_or_video, modal)
    region_feats, region_counts = None, None
    if frame is not None and masks is not None:
        region_feats, region_counts = model.pack_and_encode_regions(
            np.asarray(frame), np.asarray(masks), ann_indices
        )

    do_sample = bool(kwargs.get("do_sample", False))
    temperature = kwargs.get("temperature")
    temperature = (
        float(0.2 if temperature is None else temperature)
        if do_sample else 1.0
    )

    # TextDeltaStreamer handles the two chunk-boundary hazards (a transient
    # trailing U+FFFD from a split multi-byte char; a stop string spanning
    # chunks) by holding back an unemitted tail — the joined deltas equal
    # the one-shot decode exactly
    streamer = TextDeltaStreamer(
        tokenizer, kwargs.get("stop_strings") or []
    )
    for ids_chunk, _hid in model.generate_stream(
        input_ids, video_feats, region_feats, region_counts,
        max_new_tokens=int(kwargs.get("max_new_tokens", 1024)),
        chunk=chunk,
        do_sample=do_sample,
        temperature=temperature,
        top_p=float(kwargs.get("top_p", 0.9)),
        seed=int(kwargs.get("seed", 0)),
    ):
        delta, stopped = streamer.push(ids_chunk)
        if delta:
            yield delta
        if stopped:
            return
    delta = streamer.finish()
    if delta:
        yield delta


def mm_infer_batch(
    samples: Sequence[Dict[str, Any]],
    model: UFVideoRuntime,
    tokenizer,
    modal: str = "video",
    choice: int = 1,
    **kwargs,
):
    """Batched serving entry: run B independent samples through one
    encode → splice → prefill+decode dispatch (and, for [SEG] outputs, one
    batched SAM2 propagation). Single-chip throughput roughly doubles vs a
    ``mm_infer`` loop at batch 8 (PERF.md e2e table) because the decode
    loop's weight traffic — the dominant batch-1 cost — amortizes across
    the batch.

    Each sample is a dict: ``video`` ([T, H, W, 3] frames, same T for all
    samples), ``instruct``, and optionally ``masks``/``ann_indices``/
    ``frame`` (region prompts), ``images_sam`` ([Ts, 1024, 1024, 3], same Ts
    across seg samples), ``label_size``. Beyond-reference addition: the
    reference has no batched inference (eval drivers run bs=1,
    inference_PixRQA.py:221); contract per sample matches ``mm_infer``.
    Samples WITHOUT an input [SEG] take path A (batched generate +
    post-hoc extraction); samples WITH an input [SEG] (MeViS-style seg
    evals, choice=3) take path B — one batched forward over that subset
    with offset-corrected [SEG] hidden states and batched propagation.

    Returns a list aligned with ``samples``: (output_text, out_dict) for
    path A, (None, out_dict with gt_masks) for path B.
    """
    cfg = model.cfg
    modal_token = {
        "image": DEFAULT_IMAGE_TOKEN, "video": DEFAULT_VIDEO_TOKEN, "text": ""
    }[modal]
    b = len(samples)

    ids_list = [
        _assemble_input_ids(s["instruct"], choice, modal_token, tokenizer)
        for s in samples
    ]
    # partition: path A (no [SEG] in the input — generate) vs path B
    # ([SEG] in the input — single batched forward, offset-corrected
    # extraction; the MeViS-style seg evals, videorefer_qwen2.py:461-518)
    idx_a = [i for i, ids in enumerate(ids_list) if model.ids.seg not in ids]
    idx_b = [i for i in range(b) if i not in idx_a]

    # batched vision encode
    video_feats = None
    if modal != "text":
        pixel_list = []
        for s in samples:
            pixels = np.asarray(s["video"])
            if pixels.dtype == np.uint8:
                from .ops.image_pipeline import siglip_preprocess_device

                pixels = np.asarray(
                    siglip_preprocess_device(
                        jnp.asarray(pixels), out_dtype=cfg.compute_dtype
                    )
                )
            if modal == "image":
                pixels = np.broadcast_to(
                    pixels[:1], (cfg.budget.num_frames,) + pixels.shape[1:]
                )
            pixel_list.append(pixels)
        video_feats = model.encode_video(jnp.asarray(np.stack(pixel_list)))

    # per-sample region tokens, padded to a common stream length
    region_feats, region_counts_list = None, None
    if any(s.get("frame") is not None for s in samples):
        feats_list, counts_list = [], []
        for s in samples:
            if s.get("frame") is not None and s.get("masks") is not None:
                f, c = model.pack_and_encode_regions(
                    np.asarray(s["frame"]), np.asarray(s["masks"]),
                    s.get("ann_indices"),
                )
                feats_list.append(np.asarray(f)[0])
                counts_list.append(c)
            else:
                feats_list.append(None)
                counts_list.append([])
        # a sample may carry a frame but no masks — if none produced
        # features, there are no region tokens to splice at all
        if any(f is not None for f in feats_list):
            rt_max = max(f.shape[0] for f in feats_list if f is not None)
            d = next(f for f in feats_list if f is not None).shape[-1]
            packed = np.zeros((b, rt_max, d), np.float32)
            for i, f in enumerate(feats_list):
                if f is not None:
                    packed[i, : f.shape[0]] = f
            region_feats = jnp.asarray(packed, cfg.compute_dtype)
            region_counts_list = counts_list

    stop_sequences = tuple(
        tuple(tokenizer(s, add_special_tokens=False).input_ids)
        for s in (kwargs.get("stop_strings") or [])
    )
    do_sample = bool(kwargs.get("do_sample", False))
    # same normalization as mm_infer: greedy → 1.0 (one compile key);
    # sampling honors an explicit temperature of 0.0 (near-greedy)
    temperature = kwargs.get("temperature")
    temperature = (
        float(0.2 if temperature is None else temperature)
        if do_sample else 1.0
    )
    seed = int(kwargs.get("seed", 0))

    def rows(x, idx):
        return None if x is None else x[jnp.asarray(idx)]

    def default_hw(i):
        return tuple(
            samples[i].get("label_size")
            or (cfg.sam.hiera.image_size, cfg.sam.hiera.image_size)
        )

    def propagate_group(rows_idx, embeds_list, images_list):
        """One-object-per-sample propagation: batched scan when shapes are
        homogeneous, per-sample otherwise. Returns {global row: [mask]}."""
        got: Dict[int, List[np.ndarray]] = {}
        if not rows_idx:
            return got
        hw = [default_hw(i) for i in rows_idx]
        if len(set(hw)) == 1 and len({im.shape for im in images_list}) == 1:
            m = model.segment_videos_batched(
                np.stack(images_list), jnp.stack(embeds_list), *hw[0]
            )
            for r, i in enumerate(rows_idx):
                got[i] = [m[r]]
        else:
            for r, i in enumerate(rows_idx):
                m = model.segment_video(
                    images_list[r], embeds_list[r][None], *hw[r]
                )
                got[i] = [m[0]]
        return got

    out: List[Any] = [None] * b

    # ---- PATH A subset: batched generate + post-hoc [SEG] ----
    if idx_a:
        results = model.generate_batch(
            [ids_list[i] for i in idx_a],
            rows(video_feats, idx_a),
            rows(region_feats, idx_a),
            (
                [region_counts_list[i] for i in idx_a]
                if region_counts_list is not None else None
            ),
            max_new_tokens=int(kwargs.get("max_new_tokens", 1024)),
            do_sample=do_sample,
            temperature=temperature,
            top_p=float(kwargs.get("top_p", 0.9)),
            stop_sequences=stop_sequences,
            seed=seed,
        )[0]

        # single-[SEG] samples propagate together in one scan
        seg_rows, seg_embeds, seg_images = [], [], []
        for k, (tokens, hidden) in enumerate(results):
            i = idx_a[k]
            steps = [j for j, t in enumerate(tokens) if t == model.ids.seg]
            if steps and samples[i].get("images_sam") is not None:
                if len(steps) > 1:
                    continue  # multi-object samples fall back below
                seg_rows.append(i)
                seg_embeds.append(
                    model._seg_embed(
                        model.params, hidden[jnp.asarray(steps)]
                    )[0]
                )
                seg_images.append(np.asarray(samples[i]["images_sam"]))
        masks_by_row = propagate_group(seg_rows, seg_embeds, seg_images)

        for k, (tokens, hidden) in enumerate(results):
            i = idx_a[k]
            pred_masks = masks_by_row.get(i, [])
            if not pred_masks:
                # multi-[SEG] fallback: per-sample propagation (objects batch)
                steps = [
                    j for j, t in enumerate(tokens) if t == model.ids.seg
                ]
                if (
                    len(steps) > 1
                    and samples[i].get("images_sam") is not None
                ):
                    embeds = model._seg_embed(
                        model.params, hidden[jnp.asarray(steps)]
                    )
                    h, w = default_hw(i)
                    m = model.segment_video(
                        np.asarray(samples[i]["images_sam"]), embeds, h, w
                    )
                    pred_masks = [m[j] for j in range(m.shape[0])]
            text = tokenizer.decode(tokens, skip_special_tokens=True).strip()
            if kwargs.get("stop_strings"):
                # string-level backstop for BPE-merged keywords (see mm_infer)
                text = trim_at_stop_strings(
                    text, kwargs["stop_strings"]
                ).strip()
            out[i] = (text, {"output": tokens, "pred_masks": pred_masks})

    # ---- PATH B subset ([SEG] in the input, videorefer_qwen2.py:461-518):
    # ONE batched forward over the subset, offset-corrected [SEG] hidden
    # states, batched propagation ----
    if idx_b:
        plan = plan_splice(
            [ids_list[i] for i in idx_b],
            num_video_tokens=(
                video_feats.shape[1] if video_feats is not None else 0
            ),
            region_token_counts=[
                (region_counts_list[i] if region_counts_list else []) or []
                for i in idx_b
            ],
            region_token_id=model.ids.region,
            max_seq_len=cfg.budget.max_seq_len,
            region_stride=cfg.region.region_token_num,
        )
        hidden = model.forward_hidden_states(
            plan, rows(video_feats, idx_b), rows(region_feats, idx_b)
        )
        seg_rows, seg_embeds, seg_images = [], [], []
        multi: Dict[int, Any] = {}
        for k, i in enumerate(idx_b):
            # hidden state at the position BEFORE each input [SEG] token
            # (left-shifted seg mask, videorefer_qwen2.py:470-476)
            positions = [
                int(plan.text_pos_map[k][ti]) - 1
                for ti, t in enumerate(ids_list[i])
                if t == model.ids.seg
            ]
            positions = [p for p in positions if p >= 0]
            if not positions or samples[i].get("images_sam") is None:
                continue
            embeds = model._seg_embed(
                model.params, hidden[k, jnp.asarray(positions)]
            )
            if len(positions) == 1:
                seg_rows.append(i)
                seg_embeds.append(embeds[0])
                seg_images.append(np.asarray(samples[i]["images_sam"]))
            else:
                multi[i] = embeds
        masks_by_row = propagate_group(seg_rows, seg_embeds, seg_images)
        for i, embeds in multi.items():
            h, w = default_hw(i)
            m = model.segment_video(
                np.asarray(samples[i]["images_sam"]), embeds, h, w
            )
            masks_by_row[i] = [m[j] for j in range(m.shape[0])]
        for i in idx_b:
            out[i] = (None, {
                "output": None,
                "pred_masks": masks_by_row.get(i, []),
                "gt_masks": samples[i].get("masks"),
            })
    return out
