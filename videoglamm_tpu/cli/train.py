"""Grounded finetuning entry point.

Reference entry point: /root/reference/VideoGLaMM/train_ds_with_videogptplus.py
(:27-504): load pretrained composite -> add [SEG] -> freeze towers -> LoRA the
LLM -> train text_hidden_fcs + mask decoder + embeddings on the hybrid
dataset mixture under the reference recipe (lr 3e-4, WarmupDecayLR, bs 2 x
accum 10, 10 epochs x 500 steps).

TPU-native: one GSPMD train step over a Mesh(data x model) replaces the
DeepSpeed engine; ZeRO-2 memory behavior comes from data-axis opt-state
sharding; checkpoints are Orbax trees.

Usage:
  python -m videoglamm_tpu.cli.train --checkpoint CKPT --tokenizer TOK \
      --gcg_json .../train.json --gcg_frames .../frames \
      [--refer_vos_root ROOT] [--reason_seg_root ROOT] \
      --ckpt_dir ./ckpts --log_dir ./runs
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def make_val_fn(model, builder, max_text_len: int, *, mevis_ds=None,
                reason_ds=None, n_samples: int = 32):
    """Per-epoch validator: teacher-forced forward on val samples, compare
    pred_masks to GT (reference validate_on_mevis / validate_on_reasonseg
    run the train-style forward, utils/trainer.py:301-476)."""
    import jax
    import jax.numpy as jnp

    from ..constants import MASK_IGNORE_INDEX
    from ..data.collate import build_batch
    from ..training.trainer import validate_mevis, validate_reasonseg

    fwd = jax.jit(lambda p, b: model.apply({"params": p}, **b).pred_masks)

    def tube_predict(params, record):
        sample = builder(record)
        batch = build_batch([sample], max_text_len=max_text_len,
                            mask_hw=builder.mask_hw)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        pred = np.asarray(fwd(params, jb))[0, 0]         # [T, h, w] logits
        gt = np.asarray(batch["gt_masks"])[0, 0]         # [T, h, w]
        gt = np.where(gt == MASK_IGNORE_INDEX, 255, gt).astype(np.int64)
        return pred > 0, gt

    def val_fn(state, epoch, logger):
        params = state.params
        if mevis_ds is not None:
            n = min(n_samples, len(mevis_ds))
            validate_mevis(lambda i: tube_predict(params, mevis_ds[i]),
                           range(n), logger, epoch)
        if reason_ds is not None:
            def reason_predict(i):
                pred, gt = tube_predict(params, reason_ds[i])
                return pred[:1], gt[:1]      # image dataset: frame 0
            n = min(n_samples, len(reason_ds))
            validate_reasonseg(reason_predict, range(n), logger, epoch)
    return val_fn


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    from .common import add_model_args
    add_model_args(p)
    p.add_argument("--gcg_json", default=None)
    p.add_argument("--gcg_frames", default=None)
    p.add_argument("--refer_vos_root", default=None)
    p.add_argument("--a2d_root", default=None,
                   help="A2D-Sentences root (train source, reference "
                        "refer_vos registry utils/refer_vos_dataset.py:25)")
    p.add_argument("--a2d_ann", default=None,
                   help="A2D single-frame train annotation JSON "
                        "(defaults to <a2d_root>/a2d_sentences_single_frame"
                        "_train_annotations.json)")
    p.add_argument("--jhmdb_root", default=None,
                   help="JHMDB-Sentences root (train source)")
    p.add_argument("--jhmdb_ann", default=None,
                   help="defaults to <jhmdb_root>/jhmdb_sentences_samples"
                        "_metadata.json")
    p.add_argument("--reason_seg_root", default=None)
    p.add_argument("--vqa_json", default=None)
    p.add_argument("--vqa_media_root", default=None)
    p.add_argument("--sample_rates", default=None,
                   help="comma weights matching registered datasets")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--grad_accum", type=int, default=10)
    p.add_argument("--steps_per_epoch", type=int, default=500)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--max_text_len", type=int, default=512)
    p.add_argument("--num_frames_for_sam", type=int, default=4)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--ckpt_dir", default="./ckpts")
    p.add_argument("--log_dir", default="./runs")
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--val_mevis_root", default=None,
                   help="MeViS-layout valid_u root: per-epoch gIoU/cIoU "
                        "(reference validate_on_mevis)")
    p.add_argument("--val_reason_seg_root", default=None)
    p.add_argument("--val_samples", type=int, default=32,
                   help="videos/images per mid-training validation pass")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import TrainConfig, VideoGLaMMConfig
    from ..data.datasets import (DatasetSpec, GCGVideoDataset, HybridDataset,
                                 ReasonSegDataset, ReferVOSDataset,
                                 SampleBuilder, VQADataset)
    from ..models import VideoGLaMM
    from ..parallel import create_mesh
    from ..training import (create_train_state, make_optimizer,
                            make_sharded_train_step)
    from ..training.trainer import Trainer
    from .common import load_model, load_tokenizer

    cfg = VideoGLaMMConfig.flagship()
    tokenizer = load_tokenizer(args.tokenizer or args.checkpoint)

    specs = []
    if args.gcg_json:
        specs.append(DatasetSpec("video_gcg", GCGVideoDataset(
            args.gcg_json, args.gcg_frames,
            max_num_frames=args.num_frames_for_sam), 1.0))
    if args.refer_vos_root:
        specs.append(DatasetSpec(
            "refer_vos", ReferVOSDataset(args.refer_vos_root), 1.0))
    if args.a2d_root:
        from ..data.datasets import (A2DSentencesDataset,
                                     ReferSentencesTrainDataset)
        ann = args.a2d_ann or os.path.join(
            args.a2d_root, "a2d_sentences_single_frame_train_annotations.json")
        specs.append(DatasetSpec("a2d", ReferSentencesTrainDataset(
            A2DSentencesDataset(args.a2d_root, ann),
            num_frames_for_sam=args.num_frames_for_sam), 1.0))
    if args.jhmdb_root:
        from ..data.datasets import (JHMDBSentencesDataset,
                                     ReferSentencesTrainDataset)
        ann = args.jhmdb_ann or os.path.join(
            args.jhmdb_root, "jhmdb_sentences_samples_metadata.json")
        specs.append(DatasetSpec("jhmdb", ReferSentencesTrainDataset(
            JHMDBSentencesDataset(args.jhmdb_root, ann),
            num_frames_for_sam=args.num_frames_for_sam), 1.0))
    if args.reason_seg_root:
        specs.append(DatasetSpec(
            "reason_seg", ReasonSegDataset(args.reason_seg_root), 1.0))
    if args.vqa_json:
        specs.append(DatasetSpec("vqa", VQADataset(
            args.vqa_json, args.vqa_media_root), 1.0))
    assert specs, "register at least one dataset"
    if args.sample_rates:
        for s, w in zip(specs, args.sample_rates.split(",")):
            s.weight = float(w)

    builder = SampleBuilder(cfg, tokenizer, max_text_len=args.max_text_len,
                            num_frames_for_sam=args.num_frames_for_sam)
    hybrid = HybridDataset(specs, builder,
                           samples_per_epoch=args.steps_per_epoch
                           * args.batch_size * args.grad_accum)

    # model + pretrained weights + LoRA
    model_loaded, params = load_model(args, cfg)
    model = VideoGLaMM(cfg, dtype=model_loaded.dtype, remat_llm=True,
                       lora_rank=args.lora_r)
    # LoRA params are new: init them and graft the loaded weights in
    ex = next(hybrid.batches(args.batch_size, args.max_text_len))
    jb = {k: jnp.asarray(v) for k, v in ex.items()}
    full = model.init(jax.random.PRNGKey(0), **jb)["params"]

    def graft(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and k in dst and isinstance(dst[k], dict):
                graft(dst[k], v)
            else:
                dst[k] = v
    graft(full, params["params"])

    tcfg = TrainConfig(lr=args.lr, epochs=args.epochs,
                       steps_per_epoch=args.steps_per_epoch,
                       grad_accum_steps=args.grad_accum,
                       total_steps=args.epochs * args.steps_per_epoch)
    tx = make_optimizer(tcfg, full)
    state = create_train_state(full, tx)
    mesh = create_mesh(model=args.model_parallel)

    def accum_batches():
        gen = hybrid.batches(args.batch_size, args.max_text_len)
        while True:
            micro = [next(gen) for _ in range(args.grad_accum)]
            yield {k: np.stack([m[k] for m in micro]) for k in micro[0]}

    gen = accum_batches()
    example = next(gen)
    step, state, batch_sh = make_sharded_train_step(
        model, tx, mesh, state, example, grad_accum=args.grad_accum)

    def to_device(b):
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(jnp.asarray(x), s), b, batch_sh)

    val_fn = None
    if args.val_mevis_root or args.val_reason_seg_root:
        val_fn = make_val_fn(
            model, builder, args.max_text_len,
            mevis_ds=(ReferVOSDataset(args.val_mevis_root)
                      if args.val_mevis_root else None),
            reason_ds=(ReasonSegDataset(args.val_reason_seg_root,
                                        split="val")
                       if args.val_reason_seg_root else None),
            n_samples=args.val_samples)

    from ..data import prefetch_to_device
    prefetched = prefetch_to_device(gen, to_device, prefetch=2)
    trainer = Trainer(step, state, prefetched,
                      steps_per_epoch=args.steps_per_epoch,
                      epochs=args.epochs, log_dir=args.log_dir,
                      ckpt_dir=args.ckpt_dir, val_fn=val_fn)
    if args.auto_resume:
        trainer.resume()
    trainer.train()


if __name__ == "__main__":
    main()
