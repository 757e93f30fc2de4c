"""Real-weight parity harness: one command from reference checkpoints to a
pass/fail parity report.

The golden tests validate every module against the reference torch code at
tiny random-init scale; this harness re-runs the same methodology WITH the
actual checkpoint weights, so the moment real weights are available the
whole parity story (import fidelity -> per-module activation deltas ->
quantized-serving gates -> optional eval-set metric deltas) is one command
(VERDICT r2 weak #1).

Stages (each skippable, each contributes to the JSON report):
1. import     — compose the flax tree from the three reference artifacts
                (HF export + InternVideo2 ckpt + CLIP ckpt; reference load
                path train_ds_with_videogptplus.py:146-210, chat.py:280-325)
                and structure-check it against the model's init tree.
2. modules    — per-module activation parity against torch oracles built
                from the SAME state dicts: Phi-3 logits vs HF Phi3, CLIP
                features vs HF CLIPVisionModel, text_hidden_fcs vs the
                exported Sequential, SAM-2 heads vs the reference module
                (when the reference repo + tests shims are present). When
                the serving dtype is bf16 (flagship default), every check
                runs twice: an f32 control gated at the tight
                import-fidelity thresholds, and the serving-dtype run
                gated at the calibrated bf16 drift bounds (see THRESHOLDS).
3. quant      — the int8 (and optionally int4) serving gates re-run at this
                checkpoint's scale: greedy generation token agreement and
                mask IoU float-vs-quantized on a fixed clip.
4. eval       — optional ReasonSeg-val gIoU/cIoU computed at bf16 and f32
                (and int8) to quantify end-to-end metric drift.

CI runs this end-to-end via --synthetic tiny (structured random reference-
layout checkpoints written to disk first — tests/test_cli_e2e.py); with
real weights swap in the real paths:

  python -m videoglamm_tpu.cli.verify_parity \
      --checkpoint <hf_export_dir> --internvideo_ckpt <iv2.pt> \
      --clip_ckpt <clip.bin> --out report.json

Flagship-scale rehearsal (proves checkpoint import + 16 GB HBM serving
feasibility + the int8 gates at REAL shapes — Phi-3 3.8B / IV2-1B / Hiera-L
— without real weight values): run it twice, splitting the f32 oracle
comparisons (host CPU) from the serving-dtype quant gates (the chip):

  python -m videoglamm_tpu.cli.verify_parity --synthetic --scale flagship \
      --stages import,modules --platform cpu \
      --out_dir parity --report_name parity_modules_cpu.json
  python -m videoglamm_tpu.cli.verify_parity --scale flagship \
      --checkpoint parity/synthetic_ckpt \
      --internvideo_ckpt parity/synthetic_ckpt/internvideo2.pt \
      --clip_ckpt parity/synthetic_ckpt/clip_vision.bin \
      --stages import,quant --platform '' \
      --out_dir parity --report_name parity_quant_tpu.json

Composition always happens on the host CPU backend; the quant stage places
one serving tree in device memory at a time (float run, free, then each
quantized run), so the flagship bf16 (~11 GB) and int8 trees never coexist
in HBM.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

THRESHOLDS = {
    "module_max_abs": 2e-2,      # f32 import-fidelity bound at any scale
    "module_mean_abs": 2e-3,
    # Serving-dtype (bf16) drift bounds, calibrated by the flagship f32
    # control run (parity/parity_modules_cpu.json, seed 0): with identical
    # params the f32 path lands at max|d| = 4.3e-5 on phi3 logits / 3.8e-6
    # on CLIP features (proving import fidelity) while the bf16 path shows
    # max|d| 0.225 on phi3 logits (|logits| ~ 30 over a 32-layer 3.8B
    # stack: ~0.4% bf16 mantissa steps compound to ~1e-2 relative) and
    # 0.142 on CLIP penultimate features. The bf16 numbers gate REGRESSION
    # (a real import bug shows up as O(1) deltas in BOTH paths), not
    # exactness — exactness is the f32 control's job.
    "module_bf16_max_abs": 0.5,
    "module_bf16_mean_abs": 0.06,
    "int8_token_agreement": 0.9,
    "int8_mask_iou": 0.95,
    "int4_token_agreement": 0.75,
}


def _tests_dir():
    d = os.path.join(os.path.dirname(__file__), "..", "..", "tests")
    return os.path.abspath(d)


def build_synthetic_checkpoint(out_dir: str, cfg, seed: int = 0):
    """Write structured-random reference-layout artifacts (HF export dir +
    InternVideo2 ckpt + CLIP ckpt) for a dry run of the harness. Uses real
    torch modules (HF Phi3, reference SAM-2 via the tests shims when
    available) so key layouts are authentic, not hand-rolled."""
    import torch
    from transformers import Phi3Config as HFPhi3Config
    from transformers import Phi3ForCausalLM as HFPhi3

    torch.manual_seed(seed)
    lcfg = cfg.llm
    hf = HFPhi3(HFPhi3Config(
        vocab_size=lcfg.vocab_size + 1, hidden_size=lcfg.hidden_size,
        intermediate_size=lcfg.intermediate_size,
        num_hidden_layers=lcfg.num_layers,
        num_attention_heads=lcfg.num_heads,
        num_key_value_heads=lcfg.num_kv_heads,
        max_position_embeddings=lcfg.max_position_embeddings,
        rms_norm_eps=lcfg.rms_norm_eps, rope_theta=lcfg.rope_theta,
        pad_token_id=0))
    sd = dict(hf.state_dict())

    H = lcfg.hidden_size
    mm = torch.nn.Sequential(torch.nn.Linear(cfg.internvideo.embed_dim, H),
                             torch.nn.GELU(), torch.nn.Linear(H, H))
    imm = torch.nn.Sequential(torch.nn.Linear(cfg.clip.hidden_size, H),
                              torch.nn.GELU(), torch.nn.Linear(H, H))
    fcs = torch.nn.Sequential(torch.nn.Linear(H, H), torch.nn.ReLU(),
                              torch.nn.Linear(H, cfg.out_dim),
                              torch.nn.Dropout(0.0))
    for name, mod in (("model.mm_projector", mm),
                      ("model.image_mm_projector", imm),
                      ("model.text_hidden_fcs.0", fcs)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v

    sys.path.insert(0, _tests_dir())
    try:
        from ref_sam2 import build_reference_sam2
        sam = build_reference_sam2(cfg.sam2)
        for k, v in sam.state_dict().items():
            sd[f"model.visual_model.{k}"] = v
    except Exception as e:  # reference repo absent: random-init flax SAM
        print(f"[synthetic] reference SAM-2 unavailable ({e}); "
              "SAM params will stay random-init")

    os.makedirs(out_dir, exist_ok=True)
    torch.save(sd, os.path.join(out_dir, "pytorch_model.bin"))

    # InternVideo2 + CLIP: export random-init torch trees in their native
    # key layouts when the oracles are importable; else skip those stages
    iv_path = clip_path = None
    try:
        from ref_internvideo2 import build_reference_internvideo2
        iv = build_reference_internvideo2(cfg.internvideo)
        iv_path = os.path.join(out_dir, "internvideo2.pt")
        torch.save({"module": iv.state_dict()}, iv_path)
    except Exception as e:
        print(f"[synthetic] InternVideo2 oracle unavailable ({e})")
    try:
        from transformers import CLIPVisionConfig as HFCLIPVisionConfig
        from transformers import CLIPVisionModel as HFCLIPVision
        ccfg = cfg.clip
        clip = HFCLIPVision(HFCLIPVisionConfig(
            hidden_size=ccfg.hidden_size,
            intermediate_size=ccfg.intermediate_size,
            num_hidden_layers=ccfg.num_layers,
            num_attention_heads=ccfg.num_heads,
            image_size=ccfg.image_size, patch_size=ccfg.patch_size))
        clip_path = os.path.join(out_dir, "clip_vision.bin")
        torch.save({f"vision_model.{k}" if not k.startswith("vision_model")
                    else k: v for k, v in clip.state_dict().items()},
                   clip_path)
    except Exception as e:
        print(f"[synthetic] CLIP oracle unavailable ({e})")
    return out_dir, iv_path, clip_path


def _delta(got, want):
    d = np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64))
    return {"max_abs": float(d.max()), "mean_abs": float(d.mean())}


def run(args) -> dict:
    import jax
    if getattr(args, "platform", None):
        # the ambient sitecustomize may force-register a TPU plugin; this
        # config update (before backend init) wins over JAX_PLATFORMS
        try:
            jax.config.update("jax_platforms", args.platform)
        except Exception:
            pass
    import jax.numpy as jnp
    import torch

    from ..config import VideoGLaMMConfig
    from ..constants import IMAGE_TOKEN_INDEX
    from ..inference.generate import generate_with_prefix
    from ..inference.pipeline import extract_seg_from_generation
    from ..io import compose_videoglamm_params
    from ..io.import_torch import quantize_videoglamm_llm
    from ..models import VideoGLaMM

    # Golden activation comparisons need true-f32 matmuls (the default
    # matmul precision costs ~1e-2 max deltas on CPU/TPU, measured; the
    # test conftest sets the same flag) — but ONLY the oracle-delta stage:
    # the quant stage measures SERVING behavior and must run at serving
    # precision (a global "highest" also forces fp32 contract precision
    # into the Pallas kernels' bf16 dots, which Mosaic rejects on TPU —
    # the r5 parity_quant failure mode).
    highest = jax.default_matmul_precision("highest")

    report = {"stages": {}, "ok": True}
    stages = set(s for s in args.stages.split(",") if s)
    cpu0 = jax.devices("cpu")[0]

    cfg = (VideoGLaMMConfig.tiny(num_frames=4) if args.scale == "tiny"
           else VideoGLaMMConfig.flagship())
    if args.synthetic:
        if args.scale == "tiny":
            # match the SAM config the reference tiny builder supports
            sys.path.insert(0, _tests_dir())
            try:
                from test_sam2_full_golden import CFG as SAM_TINY
                cfg = cfg.__class__(**{**cfg.__dict__, "sam2": SAM_TINY})
            except Exception:
                pass
        ck, ivp, clp = build_synthetic_checkpoint(
            os.path.join(args.out_dir, "synthetic_ckpt"), cfg,
            seed=args.seed)
        args.checkpoint, args.internvideo_ckpt, args.clip_ckpt = ck, ivp, clp

    # ---------------------------------------------------- 1. import ----
    sd = {}
    for f in sorted(os.listdir(args.checkpoint)):
        if f.startswith("pytorch_model") and f.endswith(".bin"):
            sd.update(torch.load(os.path.join(args.checkpoint, f),
                                 map_location="cpu"))
    iv_sd = clip_sd = None
    if args.internvideo_ckpt:
        raw = torch.load(args.internvideo_ckpt, map_location="cpu")
        iv_sd = raw.get("model", raw.get("module", raw))
    if args.clip_ckpt:
        clip_sd = torch.load(args.clip_ckpt, map_location="cpu")
    with jax.default_device(cpu0):  # composition never lands in HBM
        params = compose_videoglamm_params(sd, cfg, iv_sd, clip_sd)

    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}.get(
        args.dtype, jnp.float32 if args.scale == "tiny" else jnp.bfloat16)
    model = VideoGLaMM(cfg, dtype=dtype)
    report["serving_dtype"] = jnp.dtype(dtype).name
    rng = np.random.RandomState(args.seed)
    T, T_sam, S = cfg.num_frames, 2, 24
    ims, cls_, sam_s = (cfg.internvideo.image_size, cfg.clip.image_size,
                        cfg.sam2.image_size)
    ids = rng.randint(1, min(400, cfg.llm.vocab_size), size=(1, S)).astype(
        np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    batch = dict(
        frames=jnp.asarray(rng.randn(1, T, ims, ims, 3), dtype),
        context_images=jnp.asarray(rng.randn(1, T, cls_, cls_, 3), dtype),
        frames_sam=jnp.asarray(rng.randn(1, T_sam, sam_s, sam_s, 3), dtype),
        input_ids=jnp.asarray(ids),
        text_lens=jnp.full((1,), S, jnp.int32))
    # structure check against the init tree WITHOUT running a real init
    # forward (abstract trace only — a flagship init forward would take tens
    # of minutes on a 1-core host and 30+ GB f32 in HBM on the chip)
    init_shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), **batch,
        labels=jnp.full_like(batch["input_ids"], -100),
        video_idx=jnp.zeros((1,), jnp.int32),
        gt_masks=jnp.zeros((1, cfg.max_seg_tokens, T_sam, 32, 32),
                           jnp.float32)))["params"]
    missing = [k for k in params if k not in init_shapes]
    fill_rng = np.random.RandomState(args.seed + 1)

    def _fill(sub):
        """Deterministic stand-in values for unimported modules, with
        shape/name-appropriate defaults: norm scales -> ones (N(0, 0.02)
        scales would kill the signal through any random-init module and
        silently distort the quant gate), biases -> zeros, matrices ->
        small normal."""
        def leaf(path, s):
            if not jnp.issubdtype(s.dtype, jnp.floating):
                return jnp.asarray(np.zeros(s.shape, s.dtype))
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name in ("scale", "weight") and len(s.shape) <= 1:
                return jnp.ones(s.shape, jnp.float32)
            if name == "bias":
                return jnp.zeros(s.shape, jnp.float32)
            return jnp.asarray(
                (fill_rng.standard_normal(s.shape) * 0.02).astype(np.float32))
        return jax.tree_util.tree_map_with_path(leaf, sub)

    with jax.default_device(cpu0):
        init = {k: (jax.tree_util.tree_map(
                        lambda a: jnp.asarray(a, jnp.float32), params[k])
                    if k in params else _fill(v))
                for k, v in init_shapes.items()}
    imported = sorted(params)
    random_init = sorted(set(init) - set(params))
    report["stages"]["import"] = {
        "imported_modules": imported, "unmatched": missing,
        "random_init_modules": random_init, "ok": not missing}
    report["ok"] &= not missing
    params = {"params": init}
    print(f"[import] modules: {imported}; random-init: {random_init}")

    # ---------------------------------------------------- 2. modules ----
    if "modules" in stages:
        import contextlib
        _prec = contextlib.ExitStack()
        _prec.enter_context(highest)  # f32-highest for oracle deltas only
        mod_reports = {}
        # serving dtype != f32: every check runs TWICE — an f32 control
        # (same params, f32 model) gated at the tight import-fidelity
        # thresholds, plus the serving-dtype run gated at the documented
        # bf16 drift bounds. A real import/numeric bug shows O(1) deltas in
        # BOTH paths; bf16 accumulation drift only in the serving path.
        model_ctrl = (model if dtype == jnp.float32
                      else VideoGLaMM(cfg, dtype=jnp.float32))

        def check(name, want, run_fn, tol_scale=1.0):
            d = _delta(run_fn(model_ctrl), want)
            d["ok"] = (d["max_abs"] <= THRESHOLDS["module_max_abs"] * tol_scale
                       and d["mean_abs"] <= THRESHOLDS["module_mean_abs"]
                       * tol_scale)
            if dtype == jnp.float32:
                mod_reports[name] = d
                report["ok"] &= d["ok"]
                print(f"[modules] {name}: max|d|={d['max_abs']:.2e} "
                      f"mean|d|={d['mean_abs']:.2e} "
                      f"{'OK' if d['ok'] else 'FAIL'}")
                return
            s = _delta(run_fn(model), want)
            s["ok"] = (s["max_abs"] <= THRESHOLDS["module_bf16_max_abs"]
                       and s["mean_abs"] <= THRESHOLDS["module_bf16_mean_abs"])
            ok = d["ok"] and s["ok"]
            mod_reports[name] = {"f32_control": d,
                                 jnp.dtype(dtype).name: s, "ok": ok}
            report["ok"] &= ok
            print(f"[modules] {name}: f32 max|d|={d['max_abs']:.2e} "
                  f"mean={d['mean_abs']:.2e} {'OK' if d['ok'] else 'FAIL'}; "
                  f"{jnp.dtype(dtype).name} max|d|={s['max_abs']:.2e} "
                  f"mean={s['mean_abs']:.2e} {'OK' if s['ok'] else 'FAIL'}")

        # Phi-3 logits vs HF (always available)
        from transformers import Phi3Config as HFPhi3Config
        from transformers import Phi3ForCausalLM as HFPhi3
        lcfg = cfg.llm
        hf = HFPhi3(HFPhi3Config(
            vocab_size=lcfg.vocab_size + 1, hidden_size=lcfg.hidden_size,
            intermediate_size=lcfg.intermediate_size,
            num_hidden_layers=lcfg.num_layers,
            num_attention_heads=lcfg.num_heads,
            num_key_value_heads=lcfg.num_kv_heads,
            max_position_embeddings=lcfg.max_position_embeddings,
            rms_norm_eps=lcfg.rms_norm_eps, rope_theta=lcfg.rope_theta,
            pad_token_id=0, attn_implementation="eager"))
        hf.load_state_dict({k[:]: v for k, v in sd.items()
                            if k.split(".")[0] in ("model", "lm_head")
                            and ".visual_model." not in k
                            and ".mm_projector." not in k
                            and ".image_mm_projector." not in k
                            and ".text_hidden_fcs." not in k}, strict=False)
        hf = hf.eval().float()
        tok_ids = rng.randint(1, lcfg.vocab_size, size=(1, 16))
        with torch.no_grad():
            want = hf(torch.from_numpy(tok_ids)).logits.numpy()
        check("phi3_logits", want,
              lambda m: m.apply(
                  params, jnp.asarray(tok_ids, jnp.int32),
                  jnp.arange(16)[None], jnp.full((1,), 16, jnp.int32),
                  method=lambda mdl, i, p, l: mdl.llm.forward_ids(i, p, l))[0],
              tol_scale=5.0 if args.scale != "tiny" else 1.0)

        # text_hidden_fcs vs the exported Sequential
        fcs_w = {k.split("model.text_hidden_fcs.0.")[-1]: v
                 for k, v in sd.items() if "text_hidden_fcs" in k}
        if fcs_w:
            seq = torch.nn.Sequential(
                torch.nn.Linear(lcfg.hidden_size, lcfg.hidden_size),
                torch.nn.ReLU(),
                torch.nn.Linear(lcfg.hidden_size, cfg.out_dim),
                torch.nn.Dropout(0.0))
            seq.load_state_dict(fcs_w)
            x = rng.randn(3, lcfg.hidden_size).astype(np.float32)
            with torch.no_grad():
                want = seq(torch.from_numpy(x)).numpy()
            check("text_hidden_fcs", want,
                  lambda m: m.apply(params, jnp.asarray(x),
                                    method=lambda mdl, a:
                                    mdl.text_hidden_fcs(a)))

        # CLIP features vs HF CLIPVisionModel
        if clip_sd is not None:
            try:
                from transformers import CLIPVisionConfig as HFCLIPVisionConfig
                from transformers import CLIPVisionModel as HFCLIPVision
                ccfg = cfg.clip
                clip = HFCLIPVision(HFCLIPVisionConfig(
                    hidden_size=ccfg.hidden_size,
                    intermediate_size=ccfg.intermediate_size,
                    num_hidden_layers=ccfg.num_layers,
                    num_attention_heads=ccfg.num_heads,
                    image_size=ccfg.image_size, patch_size=ccfg.patch_size,
                    attn_implementation="eager"))
                clip.load_state_dict(
                    {k.replace("vision_model.", "", 1) if False else k: v
                     for k, v in clip_sd.items()}, strict=False)
                clip = clip.eval().float()
                img = rng.randn(1, ccfg.image_size, ccfg.image_size, 3).astype(
                    np.float32)
                with torch.no_grad():
                    want = clip(torch.from_numpy(
                        img.transpose(0, 3, 1, 2)),
                        output_hidden_states=True
                    ).hidden_states[-2][:, 1:].numpy()
                check("clip_features", want,
                      lambda m: m.apply(params, jnp.asarray(img),
                                        method=lambda mdl, a:
                                        mdl.image_vision_tower(a)),
                      tol_scale=5.0 if args.scale != "tiny" else 1.0)
            except Exception as e:
                mod_reports["clip_features"] = {"skipped": str(e)}
                print(f"[modules] clip_features skipped: {e}")

        # SAM-2 mask decoder vs the reference module (same weights)
        try:
            sys.path.insert(0, _tests_dir())
            from ref_sam2 import build_reference_sam2
            sam = build_reference_sam2(cfg.sam2)
            sam_sd = {k.split("model.visual_model.")[-1]: v
                      for k, v in sd.items() if "model.visual_model." in k}
            if sam_sd:
                sam.load_state_dict(sam_sd, strict=False)
                sam = sam.eval().float()
                E = cfg.sam2.image_size // 16
                C = cfg.sam2.d_model
                pe = sam.sam_prompt_encoder
                feat = rng.randn(1, C, E, E).astype(np.float32)
                s0 = rng.randn(1, C // 8, 4 * E, 4 * E).astype(np.float32)
                s1 = rng.randn(1, C // 4, 2 * E, 2 * E).astype(np.float32)
                text = rng.randn(1, 1, C).astype(np.float32)
                with torch.no_grad():
                    sp, dn = pe(points=None, boxes=None, masks=None,
                                text_embeds=torch.from_numpy(text))
                    want, want_iou, _, _ = sam.sam_mask_decoder(
                        image_embeddings=torch.from_numpy(feat),
                        image_pe=pe.get_dense_pe(),
                        sparse_prompt_embeddings=sp,
                        dense_prompt_embeddings=dn,
                        multimask_output=False, repeat_image=False,
                        high_res_features=[torch.from_numpy(s0),
                                           torch.from_numpy(s1)])
                    want = want.numpy()
                hrf = (jnp.asarray(s0.transpose(0, 2, 3, 1)),
                       jnp.asarray(s1.transpose(0, 2, 3, 1)))

                def run_decoder(m):
                    sp_j, dn_j = m.apply(
                        params, jnp.asarray(text),
                        method=lambda mdl, t: mdl.sam.sam_prompt_encoder(
                            points=None, text_embeds=t))
                    dec = m.apply(
                        params, jnp.asarray(feat.transpose(0, 2, 3, 1)),
                        sp_j, dn_j,
                        method=lambda mdl, f, s, d: mdl.sam.sam_mask_decoder(
                            f, mdl.sam.sam_prompt_encoder.get_dense_pe(), s,
                            d, multimask_output=False, high_res_features=hrf,
                            training=False))
                    return np.asarray(dec.masks)

                check("sam2_mask_decoder", want, run_decoder)
        except Exception as e:
            import traceback
            traceback.print_exc()
            mod_reports["sam2_mask_decoder"] = {"skipped": str(e)}
            print(f"[modules] sam2_mask_decoder skipped: {e}")

        report["stages"]["modules"] = mod_reports
        _prec.close()  # back to serving precision for the quant stage

    # ---------------------------------------------------- 3. quant ----
    def clip_run(m, p):
        visual = m.apply(p, batch["frames"], batch["context_images"],
                         method=lambda mdl, a, b:
                         mdl.encode_visual_prefix(a, b))
        gen = generate_with_prefix(m, p, visual, batch["input_ids"],
                                   batch["text_lens"], max_new_tokens=12,
                                   eos_id=-1)
        seg = extract_seg_from_generation(m, p, gen)
        sam_feats, _ = m.apply(p, batch["frames_sam"],
                               method=lambda mdl, a:
                               mdl.encode_sam_features(a))
        masks = m.apply(p, sam_feats, seg, jnp.zeros((1,), jnp.int32),
                        method=lambda mdl, f, s, v: mdl.decode_masks(
                            f, s, v, training=False))
        return np.asarray(gen.tokens), np.asarray(masks)

    run_dev = jax.devices()[0]

    def _place(tree):
        """Host f32 tree -> serving tree on the run device: float leaves in
        the model dtype, quantized integer leaves as-is."""
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
                else a, run_dev), tree)

    def _free(tree):
        # device_put onto the host device aliases the source buffers (and
        # quantized trees alias params' non-LLM subtrees) — only release
        # when the run device is a separate accelerator
        if run_dev == cpu0:
            return
        for leaf in jax.tree_util.tree_leaves(tree):
            leaf.delete()

    if "quant" not in stages:
        print("[quant] skipped (--stages)")
        quant_modes = []
    else:
        quant_modes = ["int8", "int4"] if args.int4 else ["int8"]
        p_f = {"params": _place(params["params"])}
        tok_f, mask_f = clip_run(model, p_f)
        _free(p_f)
    quant_report = {}
    for mode in quant_modes:
        with jax.default_device(cpu0):  # quantize 3.8B on the host
            q_host = quantize_videoglamm_llm(params["params"], mode=mode)
        qp = {"params": _place(q_host)}
        del q_host
        qm = VideoGLaMM(cfg, dtype=dtype,
                        quant_llm_int8=mode == "int8",
                        quant_llm_int4=mode == "int4",
                        quant_kv_int8=mode == "int8")
        tok_q, mask_q = clip_run(qm, qp)
        _free(qp)
        agree = float((tok_f == tok_q).mean())
        bf, bq = mask_f > 0, mask_q > 0
        union = (bf | bq).sum()
        iou = float((bf & bq).sum() / union) if union else 1.0
        tok_ok = agree >= THRESHOLDS[f"{mode}_token_agreement"] or \
            args.tokens_advisory
        ok = tok_ok and (mode != "int8"
                         or iou >= THRESHOLDS["int8_mask_iou"])
        quant_report[mode] = {"token_agreement": agree, "mask_iou": iou,
                              "ok": ok}
        if args.tokens_advisory:
            quant_report[mode]["token_agreement_advisory"] = (
                "not gated: random-weight rehearsal — near-flat logits "
                "over the 32k vocab make greedy argmax flip under "
                "quantization rounding and one flip cascades (measured "
                "flagship-synthetic: mask IoU 1.0, agreement seed-noise); "
                "with real weights drop --tokens_advisory")
        if mode == "int8":
            # int8 is the serving default and gates the verdict; int4 is an
            # experimental memory mode — advisory only (on random-init
            # checkpoints 4-bit token agreement is seed-noise; with real
            # weights read the reported numbers directly)
            report["ok"] &= ok
        else:
            quant_report[mode]["advisory"] = True
        print(f"[quant] {mode}: agree={agree:.3f} iou={iou:.3f} "
              f"{'OK' if ok else 'FAIL (advisory)' if mode != 'int8' else 'FAIL'}")
    if "quant" in stages:
        report["stages"]["quant"] = quant_report

    # ---------------------------------------------------- 4. eval ----
    if "eval" in stages and args.reason_seg_root and args.tokenizer:
        from ..data.conversation import ConvGenerator
        from ..data.datasets import ReasonSegDataset
        from ..evals.metrics import intersection_and_union
        from ..inference import GroundedInference
        from ..inference.generate import terminators_for
        from .common import (load_tokenizer, masks_to_original_size,
                             prepare_vision_inputs, tokenize_prompt)
        tok = load_tokenizer(args.tokenizer)
        conv_gen = ConvGenerator(cfg.llm_type)
        ds = ReasonSegDataset(args.reason_seg_root)
        n = min(args.eval_samples, len(ds))
        eval_report = {}
        for prec, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            m = VideoGLaMM(cfg, dtype=dt)
            pipe = GroundedInference(
                m, params, max_new_tokens=64,
                eos_id=terminators_for(cfg.llm_type, tok))
            inter_sum = union_sum = acc_sum = 0.0
            for i in range(n):
                rec = ds[i]
                prompt = conv_gen.apply_for_chat(
                    rec["sources"][0][0]["value"], media="image")
                input_ids, lens = tokenize_prompt(prompt, tok, 256)
                f, c, s, orig_hw = prepare_vision_inputs(
                    rec["frames"] * cfg.num_frames, m.cfg,
                    sam_frames=rec["frames"])
                res = pipe(f, c, s, input_ids, lens)
                gt = np.asarray(rec["masks"][0][0, 0])
                masks = masks_to_original_size(
                    np.asarray(res.pred_masks[0]), gt.shape)
                valid = np.asarray(res.seg_valid[0])
                pred = masks[valid][0][0] if valid.any() else \
                    np.zeros_like(gt, bool)
                gt_lab = np.where(gt < 0, 255, gt).astype(np.int64)
                i_, u_, _ = intersection_and_union(
                    pred.astype(np.int64), gt_lab, K=2, ignore_index=255)
                inter_sum += i_[1]
                union_sum += u_[1]
                acc_sum += (i_[1] / (u_[1] + 1e-5)) if u_[1] else 1.0
            eval_report[prec] = {
                "ciou": float(inter_sum / (union_sum + 1e-10)),
                "giou": float(acc_sum / max(n, 1)), "n": n}
        eval_report["bf16_vs_f32_giou_delta"] = abs(
            eval_report["bf16"]["giou"] - eval_report["f32"]["giou"])
        report["stages"]["eval"] = eval_report
        print(f"[eval] {json.dumps(eval_report)}")
    elif args.reason_seg_root:
        print("[eval] skipped: --tokenizer required for the eval stage")

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, args.report_name)
    with open(out, "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(f"[done] ok={report['ok']} -> {out}")
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="reference HF-export dir (pytorch_model*.bin)")
    p.add_argument("--internvideo_ckpt", default=None)
    p.add_argument("--clip_ckpt", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="build structured-random reference-layout "
                        "checkpoints first (CI dry run)")
    p.add_argument("--scale", default="tiny", choices=["tiny", "flagship"])
    p.add_argument("--int4", action="store_true",
                   help="also gate the experimental int4 mode")
    p.add_argument("--tokens_advisory", action="store_true",
                   help="report quantized token agreement WITHOUT gating "
                        "ok on it (random-weight rehearsals only: greedy "
                        "argmax over near-flat random logits is "
                        "seed-noise; the mask-IoU gate still applies)")
    p.add_argument("--reason_seg_root", default=None,
                   help="optional ReasonSeg val root for end-to-end metric "
                        "drift")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer dir (required for the eval stage)")
    p.add_argument("--eval_samples", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="", choices=["", "f32", "bf16"],
                   help="serving dtype override (default: f32 at tiny "
                        "scale, bf16 at flagship). When the serving dtype "
                        "is not f32 the modules stage also runs an f32 "
                        "control with the same params to separate bf16 "
                        "accumulation drift from import bugs.")
    p.add_argument("--platform", default="cpu",
                   help="jax platform for the harness ('' = ambient "
                        "default; golden deltas use f32-highest matmuls "
                        "either way)")
    p.add_argument("--out_dir", default="./parity")
    p.add_argument("--report_name", default="parity_report.json")
    p.add_argument("--stages", default="import,modules,quant,eval",
                   help="comma-separated subset of import,modules,quant,"
                        "eval (import always runs)")
    args = p.parse_args(argv)
    assert args.synthetic or args.checkpoint, \
        "pass --checkpoint or --synthetic"
    report = run(args)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
