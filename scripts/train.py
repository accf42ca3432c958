"""Training launcher.

TPU-native counterpart of the reference's torchrun shell launcher + train()
entry (reference: scripts/train/train_1121v1.sh, ufvideo/train.py:749-969):
same knobs (data path mix, lr / projector lr, warmup ratio, frames, save
cadence), but distribution is a jax mesh instead of torchrun+DeepSpeed.

    python scripts/train.py --data-paths a.json b.json --video-root ... \
        --model-path <hf ckpt> --sam-path sam2_hiera_large.pt \
        --output-dir checkpoints/run1 --fsdp -1 --tp 1
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-paths", nargs="+", required=True)
    p.add_argument("--video-root", default="")
    p.add_argument("--model-path", default="")
    p.add_argument("--sam-path", default="")
    p.add_argument("--tokenizer-path", default="")
    p.add_argument("--output-dir", default="checkpoints/run")
    p.add_argument("--learning-rate", type=float, default=2e-5)
    p.add_argument("--mm-projector-lr", type=float, default=None)
    p.add_argument("--warmup-ratio", type=float, default=0.03)
    p.add_argument("--global-batch-size", type=int, default=8)
    p.add_argument("--total-steps", type=int, default=10_000)
    p.add_argument("--save-steps", type=int, default=100)
    p.add_argument("--save-total-limit", type=int, default=4)
    p.add_argument("--num-frames", type=int, default=32)
    p.add_argument("--num-frames-sam", type=int, default=4)
    p.add_argument("--tune-adapters-only", action="store_true")
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=-1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline stages: the LLM layer stack shards over a "
                        "'pipe' mesh axis and the train backbone runs the "
                        "GPipe schedule (parallel/pipeline.py); num_layers "
                        "must be divisible by this")
    p.add_argument("--microbatches", type=int, default=0,
                   help="pipeline microbatches (default: 2x pipeline stages; "
                        "per-step batch must be divisible by it)")
    p.add_argument("--num-workers", type=int, default=2)
    p.add_argument("--no-gradient-checkpointing", action="store_true",
                   help="disable per-layer remat (the reference trains WITH "
                        "--gradient_checkpointing, train_1121v1.sh)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from ufvideo_tpu.parallel.mesh import create_mesh, maybe_initialize_distributed

    # multi-host rendezvous FIRST (before anything touches jax.devices()):
    # the torchrun --nnodes counterpart (train_1121v1.sh:106-111); see
    # maybe_initialize_distributed for the env contract
    maybe_initialize_distributed()
    from ufvideo_tpu.utils import maybe_enable_compile_cache

    maybe_enable_compile_cache()

    from ufvideo_tpu.api import model_init
    from ufvideo_tpu.models.sam2 import SAM2
    from ufvideo_tpu.train.data import Collator, SupervisedVideoDataset
    from ufvideo_tpu.train.prefetch import PrefetchLoader, device_prefetch
    from ufvideo_tpu.train.seg_step import SegBatch, make_seg_loss_fn
    from ufvideo_tpu.train.trainer import (
        TrainConfig,
        Trainer,
        build_sample_order,
        shard_order_for_process,
    )

    runtime, _, tokenizer = model_init(
        args.model_path or None,
        sam_path=args.sam_path or None,
        tokenizer_path=args.tokenizer_path or None,
    )
    cfg = runtime.cfg.replace(
        budget=dataclasses.replace(
            runtime.cfg.budget,
            num_frames=args.num_frames,
            num_frames_sam=args.num_frames_sam,
        ),
        llm=dataclasses.replace(
            runtime.cfg.llm, remat=not args.no_gradient_checkpointing
        ),
    )

    tc = TrainConfig(
        output_dir=args.output_dir,
        learning_rate=args.learning_rate,
        mm_projector_lr=args.mm_projector_lr,
        warmup_ratio=args.warmup_ratio,
        total_steps=args.total_steps,
        global_batch_size=args.global_batch_size,
        save_steps=args.save_steps,
        save_total_limit=args.save_total_limit,
        tune_adapters_only=args.tune_adapters_only,
        seed=args.seed,
    )

    mesh = create_mesh(dp=args.dp, fsdp=args.fsdp, tp=args.tp, pp=args.pp)
    sam = SAM2(cfg.sam, dtype=cfg.compute_dtype, param_dtype=cfg.param_dtype)
    model = runtime.model
    rules = None
    if args.pp > 1:
        # pipeline-parallel training: rebuild the orchestrator with the
        # GPipe backbone (same param tree — pp is a re-schedule) and shard
        # the stacked layer params over the pipe axis
        from ufvideo_tpu.models.ufvideo import UFVideoModel
        from ufvideo_tpu.parallel.partition import pipeline_rules

        n_mb = args.microbatches or 2 * args.pp
        if tc.global_batch_size % n_mb != 0:
            raise SystemExit(
                f"--global-batch-size {tc.global_batch_size} must be "
                f"divisible by --microbatches {n_mb}"
            )
        dp_total = mesh.shape["data"] * mesh.shape["fsdp"]
        if (tc.global_batch_size // n_mb) % dp_total != 0:
            raise SystemExit(
                f"per-microbatch rows {tc.global_batch_size // n_mb} must "
                f"divide the data axes (data*fsdp = {dp_total})"
            )
        model = UFVideoModel(cfg, pp=(mesh, "pipe", n_mb, ("data", "fsdp")))
        rules = pipeline_rules()
    trainer = Trainer(
        model, cfg, tc, mesh=mesh, loss_fn=make_seg_loss_fn(sam), rules=rules
    )

    dataset = SupervisedVideoDataset(
        args.data_paths, tokenizer, cfg, video_root=args.video_root,
        seed=args.seed,
    )
    collator = Collator(cfg, runtime.ids.region, runtime.ids.seg)
    order = build_sample_order(dataset, tc)
    # each process decodes/collates only its slice of every global batch;
    # the train step assembles the global device array across processes
    order = shard_order_for_process(order, tc.global_batch_size)
    loader = PrefetchLoader(
        order,
        dataset.__getitem__,
        lambda samples: SegBatch(
            **{k: jnp.asarray(v) for k, v in collator(samples).items()}
        ),
        batch_size=tc.global_batch_size // jax.process_count(),
        num_workers=args.num_workers,
    )

    state = trainer.init_state(runtime.params)
    state = trainer.maybe_resume(state)
    state = trainer.train(state, device_prefetch(loader, lambda b: b))
    trainer.save(state)
    print(f"done at step {int(state.step)}")


if __name__ == "__main__":
    main()
