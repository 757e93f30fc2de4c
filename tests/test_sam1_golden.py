"""SAM-1 golden parity vs the reference segment_anything fork (torch CPU
oracle): ViT rel-pos encoder, text-prompted decoder with ITM track tokens,
and the track-token recurrence across frames."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoglamm_tpu.config import SAM1Config
from videoglamm_tpu.io.import_torch import import_sam1
from videoglamm_tpu.models.sam1 import SAM1

pytestmark = pytest.mark.golden

REF = "/root/reference/VideoGLaMM"

CFG = SAM1Config(image_size=64, encoder_embed_dim=32, encoder_depth=3,
                 encoder_num_heads=2, encoder_global_attn_indexes=(1,),
                 window_size=2, prompt_embed_dim=32, with_itm=True)


def _load_ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name, attrs in [
            ("torchvision", {}), ("torchvision.ops", {}),
            ("torchvision.ops.boxes", {"batched_nms": None,
                                       "box_area": None}),
            ("torchvision.transforms", {}),
            ("torchvision.transforms.functional", {"resize": None,
                                                   "to_pil_image": None})]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            # real __spec__: transformers' find_spec probe raises on
            # registered modules whose __spec__ is None
            import importlib.machinery
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m


@pytest.fixture(scope="module")
def ref_sam():
    _load_ref()
    import torch
    from functools import partial
    from model.segment_anything.modeling.image_encoder import ImageEncoderViT
    from model.segment_anything.modeling.mask_decoder import CustomMaskDecoder
    from model.segment_anything.modeling.prompt_encoder import PromptEncoder
    from model.segment_anything.modeling.transformer import TwoWayTransformer

    torch.manual_seed(0)
    cfg = CFG
    enc = ImageEncoderViT(
        depth=cfg.encoder_depth, embed_dim=cfg.encoder_embed_dim,
        img_size=cfg.image_size, mlp_ratio=4,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        num_heads=cfg.encoder_num_heads, patch_size=16, qkv_bias=True,
        use_rel_pos=True,
        global_attn_indexes=cfg.encoder_global_attn_indexes,
        window_size=cfg.window_size, out_chans=cfg.prompt_embed_dim)
    e = cfg.image_size // 16
    pe = PromptEncoder(embed_dim=cfg.prompt_embed_dim,
                       image_embedding_size=(e, e),
                       input_image_size=(cfg.image_size, cfg.image_size),
                       mask_in_chans=16)
    dec = CustomMaskDecoder(
        num_multimask_outputs=3,
        transformer=TwoWayTransformer(depth=2,
                                      embedding_dim=cfg.prompt_embed_dim,
                                      mlp_dim=2048, num_heads=8),
        transformer_dim=cfg.prompt_embed_dim, iou_head_depth=3,
        iou_head_hidden_dim=256)
    with torch.no_grad():
        enc.pos_embed.normal_(std=0.5)
        for b in enc.blocks:
            b.attn.rel_pos_h.normal_(std=0.5)
            b.attn.rel_pos_w.normal_(std=0.5)
    for m in (enc, pe, dec):
        m.eval()
    return enc, pe, dec


@pytest.fixture(scope="module")
def flax_sam(ref_sam):
    enc, pe, dec = ref_sam
    sd = {}
    for name, mod in (("image_encoder", enc), ("prompt_encoder", pe),
                      ("mask_decoder", dec)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    model = SAM1(CFG, dtype=jnp.float32)
    params = {"params": import_sam1(sd, CFG)}
    return model, params


def test_encoder_golden(ref_sam, flax_sam):
    import torch
    enc, _, _ = ref_sam
    model, params = flax_sam
    x = np.random.RandomState(0).randn(
        2, CFG.image_size, CFG.image_size, 3).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(x).permute(0, 3, 1, 2)
                   ).permute(0, 2, 3, 1).numpy()
    got = model.apply(params, jnp.asarray(x),
                      method=lambda mdl, a: mdl.forward_image(a))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def _ref_decode(ref_sam, emb_np, text_np, track_np=None):
    import torch
    _, pe, dec = ref_sam
    with torch.no_grad():
        sparse, dense = pe(points=None, boxes=None, masks=None,
                           text_embeds=torch.from_numpy(text_np)[:, None])
        masks, iou, track = dec(
            image_embeddings=torch.from_numpy(emb_np).permute(0, 3, 1, 2),
            image_pe=pe.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=False,
            track_token_in=(torch.from_numpy(track_np)
                            if track_np is not None else None))
    return masks.numpy(), iou.numpy(), track.numpy()


def test_decoder_and_track_recurrence_golden(ref_sam, flax_sam):
    import torch
    enc, _, _ = ref_sam
    model, params = flax_sam
    rng = np.random.RandomState(1)
    T, B = 3, 2
    frames = rng.randn(T, CFG.image_size, CFG.image_size, 3).astype(
        np.float32)
    text = rng.randn(B, CFG.prompt_embed_dim).astype(np.float32)

    # reference recurrence (model/VideoGLaMM.py:444-472)
    with torch.no_grad():
        embs = enc(torch.from_numpy(frames).permute(0, 3, 1, 2)
                   ).permute(0, 2, 3, 1).numpy()
    track = None
    want = []
    for t in range(T):
        # the reference decoder repeat-interleaves a single image embedding
        # across the prompt batch (mask_decoder.py:139-143)
        m, _, track = _ref_decode(ref_sam, embs[t][None], text, track)
        want.append(m[:, 0])
    want = np.stack(want, axis=1)

    got = model.apply(params, jnp.asarray(frames),
                      jnp.asarray(text)[:, None],
                      method=lambda mdl, f, te: mdl.track_frames(f, te))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3, rtol=5e-3)
